"""THE correctness gate: Spark engine vs pure-Python oracle, rank-identical
top-k (doc ids, BM25 scores to 1e-6, snippets byte-identical) over the full
reference query set (north_rule)."""

import pytest

from searchengine_spark import oracle as O
from searchengine_spark.sources.queryset import reference_queries


@pytest.mark.parametrize("q", reference_queries(), ids=lambda q: f"q{q['query_id']}")
def test_rank_identity(q, built_engine, oracle_index):
    want = O.search(oracle_index, q["query"], limit=q["k"], offset=q["offset"],
                    site=q["site"])
    got = built_engine.search(q["query"], limit=q["k"], offset=q["offset"],
                              site=q["site"])
    assert got["result"] == want["result"], (got, want)
    if not want["result"]:
        assert got["error"] == want["error"]
        return
    assert got["count"] == want["count"]
    assert len(got["data"]) == len(want["data"])
    for g, w in zip(got["data"], want["data"]):
        assert g["doc_id"] == w["doc_id"]
        assert g["score"] == pytest.approx(w["score"], abs=1e-6)
        assert g["uri"] == w["uri"]
        assert g["title"] == w["title"]
        assert g["snippet"] == w["snippet"]
        assert g["rank"] == w["rank"]


def test_reference_relevance_mode_parity(built_engine, oracle_index):
    from searchengine_spark.functions.lexicon import synthetic_lemmas

    sl = synthetic_lemmas()
    q = f"{sl[8]} {sl[21]}"
    want = O.search(oracle_index, q, limit=10, relevance_mode="reference")
    got = built_engine.search(q, limit=10, relevance_mode="reference")
    assert got["count"] == want["count"]
    for g, w in zip(got["data"], want["data"]):
        assert g["doc_id"] == w["doc_id"]
        assert g["score"] == pytest.approx(w["score"], abs=1e-6)


def test_statistics(built_engine, oracle_index):
    stats = built_engine.statistics()
    assert stats["result"]
    total = stats["statistics"]["total"]
    assert total["pages"] == oracle_index.n_docs
    by_site = {}
    for d in oracle_index.docs.values():
        by_site[d["site"]] = by_site.get(d["site"], 0) + 1
    got_sites = {d["site"]: d["pages"] for d in stats["statistics"]["detailed"]}
    assert got_sites == by_site
    # per-site lemma counts must equal the oracle's distinct-lemma sets
    by_site_lemmas = {}
    for t, pl in oracle_index.postings.items():
        for d in pl:
            by_site_lemmas.setdefault(
                oracle_index.docs[d]["site"], set()).add(t)
    got_lemmas = {d["site"]: d["lemmas"] for d in stats["statistics"]["detailed"]}
    assert got_lemmas == {s: len(v) for s, v in by_site_lemmas.items()}


def test_statistics_reads_precomputed_table_only(built_engine):
    """The dashboard path must not scan docs or postings: with both
    directories moved aside, statistics() still answers from the
    precomputed site_stats table (plans/build.py::_stage_site_stats)."""
    import os
    import shutil

    io = built_engine.io
    assert io.stage_complete("site_stats")
    want = built_engine.statistics()
    moved = []
    try:
        for t in ("docs", "postings"):
            src, dst = io.path(t), io.path(t) + ".hidden"
            shutil.move(src, dst)
            moved.append((src, dst))
        got = built_engine.statistics()
    finally:
        for src, dst in moved:
            if os.path.isdir(dst):
                shutil.move(dst, src)
    assert got == want
