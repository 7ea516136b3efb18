"""Multimodal plumbing: binary payload columns, mapInPandas batch shapes,
frame sampling (UDTF-shaped), resize stub, gated real-decode path."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, ("x" * (i * 100 + 7)).encode()) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return df.withColumn("media_type", F.lit("image"))


def test_image_metadata(spark, media):
    got = {r["doc_id"]: r for r in mm.image_metadata(media).collect()}
    assert len(got) == 5
    for i in range(1, 6):
        n = i * 100 + 7
        r = got[i]
        assert r["n_bytes"] == n
        assert r["width"] == n % 640 + 1
        assert r["height"] == (n // 640) % 480 + 1
        assert r["mode"] == "L"
        assert len(r["fp"]) == 32


def test_sample_frames_every_n(spark, media):
    rows = mm.sample_frames(media, every_n=2, frame_bytes=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(1, 6):
        n = i * 100 + 7
        n_frames = (n + 63) // 64
        want_idx = list(range(0, n_frames, 2))
        got = sorted(by_doc[i], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == want_idx
        # frame bytes are the right slices of the payload
        payload = ("x" * n).encode()
        for r in got:
            fi = r["frame_idx"]
            assert bytes(r["frame"]) == payload[fi * 64:(fi + 1) * 64]


def test_frame_counts_matches_sample(spark, media):
    counts = {r["doc_id"]: r for r in
              mm.frame_counts(media, every_n=4).collect()}
    sampled = mm.sample_frames(media, every_n=4).collect()
    by_doc = {}
    for r in sampled:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + 1
    for doc_id, r in counts.items():
        assert r["n_sampled"] == by_doc[doc_id]


def test_resize_stub(spark, media):
    out = {r["doc_id"]: r for r in
           mm.resize_images(media, 32, 32).collect()}
    for i in range(1, 6):
        r = out[i]
        assert (r["width"], r["height"]) == (32, 32)
        assert 1 <= len(bytes(r["payload"])) <= i * 100 + 7


def test_real_decode_gated():
    with pytest.raises(NotImplementedError):
        mm.real_decode_image(b"\x89PNG...")


def test_media_from_documents_roundtrip(spark):
    docs = spark.createDataFrame([(1, "привет мир")], "doc_id long, text string")
    r = mm.media_from_documents(docs).collect()[0]
    assert bytes(r["payload"]) == "привет мир".encode("utf-8")
    assert r["media_type"] == "image"


def test_payload_never_shuffled(spark, media):
    """All multimodal ops are narrow maps — no Exchange in the plan."""
    for df in (mm.image_metadata(media),
               mm.sample_frames(media, 4),
               mm.frame_counts(media, 4),
               mm.audio_durations(media)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
