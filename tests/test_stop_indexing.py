"""C2 stopIndexing: cancel a running build, observe FAILED status with the
user-stop message and an aborted stage manifest, then resume from the
checkpoint and verify the index serves (reference
IndexingServiceImpl.getStopResponse :53-78)."""

import shutil
import time

import pytest

from searchengine_spark.plans.api import (ERR_ALREADY_RUNNING,
                                          ERR_NOT_RUNNING, STOP_MESSAGE,
                                          SearchEngine)
from searchengine_spark.sources.corpus import gen_pages_spark

N_DOCS = 12_000  # big enough that the build outlives the stop call


@pytest.fixture()
def work(tmp_path):
    w = str(tmp_path / "stopwork")
    yield w
    shutil.rmtree(w, ignore_errors=True)


def test_stop_not_running(spark, work):
    eng = SearchEngine(spark, work)
    assert eng.stop_indexing() == {"result": False, "error": ERR_NOT_RUNNING}


def test_stop_then_resume(spark, work):
    eng = SearchEngine(spark, work)
    pages = gen_pages_spark(spark, N_DOCS, partitions=8)

    assert eng.start_indexing(pages) == {"result": True}
    # second start while running must refuse (C1 guard)
    deadline = time.monotonic() + 60
    second = eng.start_indexing(pages)
    if eng.is_indexing():
        assert second == {"result": False, "error": ERR_ALREADY_RUNNING}

    # wait until the build is actually inside a stage, then stop
    while time.monotonic() < deadline:
        try:
            if eng.io.read_meta("build_status")["status"] == "INDEXING":
                break
        except FileNotFoundError:
            pass
        time.sleep(0.05)
    r = eng.stop_indexing()
    if r == {"result": False, "error": ERR_NOT_RUNNING}:
        pytest.skip("build finished before stop landed (host too fast)")
    assert r == {"result": True}

    status = eng.io.read_meta("build_status")
    assert status["status"] == "FAILED"
    assert status["error"] == STOP_MESSAGE
    aborted_stage = status["stage"]
    m = eng.io.read_manifest(aborted_stage)
    assert m is not None and m["status"] == "aborted"

    # resume completes from the checkpoint: earlier completed stages skipped
    report = eng.build_index(pages, resume=True)
    assert eng.io.read_meta("build_status")["status"] == "INDEXED"
    done_before = [s for s in report if isinstance(report[s], dict)
                   and report[s].get("skipped")]
    for s in ("docs", "postings", "terms", "stats", "blocks"):
        assert eng.io.stage_complete(s)
    # stages completed before the stop were not rebuilt
    stage_order = ["docs", "postings", "terms", "stats", "blocks"]
    for s in stage_order[:stage_order.index(aborted_stage)]:
        assert s in done_before, (s, done_before)

    stats = eng.statistics()
    assert stats["result"] is True
    d0 = stats["statistics"]["detailed"][0]
    assert d0["status"] == "INDEXED" and d0["error"] is None
    assert isinstance(d0["status_time"], int)
    assert stats["statistics"]["total"]["indexing"] is False


def test_statistics_status_surface(built_engine):
    stats = built_engine.statistics()
    assert stats["result"] is True
    total = stats["statistics"]["total"]
    assert set(total) == {"sites", "pages", "lemmas", "indexing"}
    for row in stats["statistics"]["detailed"]:
        assert set(row) == {"site", "name", "pages", "lemmas", "status",
                            "error", "status_time"}
        assert row["status"] == "INDEXED"
        assert row["name"] == row["site"]
