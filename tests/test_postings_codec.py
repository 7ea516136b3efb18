"""Posting-block codec: round-trip + block-max invariants (property-based).

SURVEY.md §5 test plan: `decode(encode(xs)) == xs` for arbitrary sorted
doc_id lists; `max(tf in block) == block_max_tf`; the block layout replaces
the reference's row-per-posting table (model/SearchIndex.java:11-27)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.operators.postings import (bm25_tfpart, delta_decode,
                                                   delta_encode,
                                                   decode_posting_block,
                                                   encode_posting_block,
                                                   varint_decode,
                                                   varint_encode)

ints = st.integers(min_value=0, max_value=2**62)


@given(st.lists(ints, max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(xs):
    assert varint_decode(varint_encode(xs)) == xs


@given(st.sets(st.integers(min_value=0, max_value=10**13), max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(s):
    xs = sorted(s)
    assert delta_decode(delta_encode(xs)) == xs


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode([5, 3])
    with pytest.raises(ValueError):
        delta_encode([5, 5])


def test_varint_rejects_negative():
    with pytest.raises(ValueError):
        varint_encode([-1])


@given(st.lists(
    st.tuples(st.integers(0, 10**10),      # doc_id
              st.integers(1, 1000),        # tf
              st.integers(1, 100000)),     # dl
    min_size=1, max_size=128,
    unique_by=lambda t: t[0]))
@settings(max_examples=200, deadline=None)
def test_block_roundtrip(postings):
    postings.sort()
    ds = [p[0] for p in postings]
    ts = [p[1] for p in postings]
    ls = [p[2] for p in postings]
    d2, t2, l2 = decode_posting_block(*encode_posting_block(ds, ts, ls))
    assert (d2, t2, l2) == (ds, ts, ls)


@given(st.lists(ints, max_size=300))
@settings(max_examples=200, deadline=None)
def test_np_varint_matches_scalar(xs):
    from searchengine_spark.operators.postings import np_varint_decode

    buf = varint_encode(xs)
    assert np_varint_decode(buf).tolist() == varint_decode(buf) == xs


@given(st.lists(
    st.tuples(st.integers(0, 10**10), st.integers(1, 1000),
              st.integers(1, 100000)),
    min_size=1, max_size=128, unique_by=lambda t: t[0]))
@settings(max_examples=200, deadline=None)
def test_np_block_decode_matches_scalar(postings):
    from searchengine_spark.operators.postings import np_decode_posting_block

    postings.sort()
    ds = [p[0] for p in postings]
    ts = [p[1] for p in postings]
    ls = [p[2] for p in postings]
    enc = encode_posting_block(ds, ts, ls)
    d2, t2, l2 = np_decode_posting_block(*enc)
    assert (d2.tolist(), t2.tolist(), l2.tolist()) == (ds, ts, ls)


def test_np_varint_rejects_truncated():
    import pytest

    from searchengine_spark.operators.postings import np_varint_decode

    with pytest.raises(ValueError):
        np_varint_decode(varint_encode([300])[:-1])


def test_np_tfpart_bit_identical_to_scalar():
    import numpy as np

    from searchengine_spark.operators.postings import np_bm25_tfpart

    tfs = np.array([1, 2, 5, 20, 997], dtype=np.int64)
    dls = np.array([1, 50, 100, 5000, 100000], dtype=np.int64)
    got = np_bm25_tfpart(tfs, dls, 123.456)
    for i in range(len(tfs)):
        assert got[i] == bm25_tfpart(int(tfs[i]), int(dls[i]), 123.456)


def test_compression_beats_fixed_width():
    """Dense ascending ids (the common case after our dense doc-id
    assignment) must compress far below 8 bytes/doc."""
    ds = list(range(10**6, 10**6 + 128))
    docs_bin, _, _ = encode_posting_block(ds, [1] * 128, [100] * 128)
    assert len(docs_bin) < 128 * 2 + 4  # ~1 byte per gap + first id


def test_bm25_tfpart_monotone_in_tf():
    vals = [bm25_tfpart(tf, 100, 120.0) for tf in (1, 2, 5, 20)]
    assert vals == sorted(vals)
    # bounded above by k1+1
    assert all(v < 2.2 for v in vals)


def test_blocks_stage_invariants(built_engine, oracle_index):
    """Every posting appears in exactly one block; metadata matches content;
    decoded postings equal the oracle's."""
    blocks = built_engine.io.read("blocks").collect()
    stats = built_engine.io.read_meta("stats")
    cfg = built_engine.cfg
    got: dict[tuple[str, int], int] = {}
    for r in blocks:
        ds, ts, ls = decode_posting_block(
            bytes(r["docs_bin"]), bytes(r["tfs_bin"]), bytes(r["dls_bin"]))
        assert r["n"] == len(ds) <= cfg.block_size
        assert r["doc_min"] == ds[0] and r["doc_max"] == ds[-1]
        assert r["max_tf"] == max(ts)
        want_max = max(bm25_tfpart(tf, dl, stats["avgdl"],
                                   cfg.bm25_k1, cfg.bm25_b)
                       for tf, dl in zip(ts, ls))
        assert r["max_tfpart"] == pytest.approx(want_max, rel=1e-12)
        for d, tf, dl in zip(ds, ts, ls):
            assert oracle_index.dl[d] == dl
            key = (r["term"], d)
            assert key not in got, "posting duplicated across blocks"
            got[key] = tf
    want = {(t, d): tf for t, pl in oracle_index.postings.items()
            for d, tf in pl.items()}
    assert got == want
