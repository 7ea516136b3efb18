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


@given(st.lists(ints, max_size=300))
@settings(max_examples=200, deadline=None)
def test_np_varint_encode_concat_byte_identical_to_scalar(xs):
    """The vectorized encoder must emit the same minimal LEB128 bytes as
    the scalar one, value for value, with correct end offsets."""
    from searchengine_spark.operators.postings import np_varint_encode_concat

    buf, ends = np_varint_encode_concat(xs)
    assert buf == b"".join(varint_encode([x]) for x in xs)
    want_ends, acc = [], 0
    for x in xs:
        acc += len(varint_encode([x]))
        want_ends.append(acc)
    assert ends.tolist() == want_ends


def test_np_varint_encode_rejects_negative():
    from searchengine_spark.operators.postings import np_varint_encode_concat

    with pytest.raises(ValueError):
        np_varint_encode_concat([3, -1])


def _scalar_reference_blocks(batches_rows, block_size, avgdl, k1, b):
    """Independent reference of the streaming encoder: the original per-row
    loop built from the scalar codec (runs cut at batch boundaries, block_id
    carried across them)."""
    out = []
    carry_term, carry_shard, carry_bi = None, None, 0
    for rows in batches_rows:
        i = 0
        while i < len(rows):
            term, sh = rows[i][0], rows[i][1]
            j = i
            while j < len(rows) and rows[j][0] == term and rows[j][1] == sh:
                j += 1
            bi = carry_bi if (term == carry_term and sh == carry_shard) else 0
            for s in range(i, j, block_size):
                e = min(s + block_size, j)
                d = [r[2] for r in rows[s:e]]
                t = [r[3] for r in rows[s:e]]
                l = [r[4] for r in rows[s:e]]
                docs_bin, tfs_bin, dls_bin = encode_posting_block(d, t, l)
                out.append((term, sh, bi, e - s, d[0], d[-1], max(t),
                            max(bm25_tfpart(ti, li, avgdl, k1, b)
                                for ti, li in zip(t, l)),
                            docs_bin, tfs_bin, dls_bin))
                bi += 1
            carry_term, carry_shard, carry_bi = term, sh, bi
            i = j
    return out


@given(
    st.lists(  # (term, shard) runs with per-run posting counts
        st.tuples(st.sampled_from(["t1", "t2", "t3"]),
                  st.integers(0, 2),
                  st.integers(1, 40)),
        min_size=1, max_size=6, unique_by=lambda r: (r[0], r[1])),
    st.integers(2, 9),    # block_size
    st.integers(1, 17),   # arrow batch size (forces runs to span batches)
)
@settings(max_examples=80, deadline=None)
def test_encode_block_batches_matches_scalar_reference(runs, block_size,
                                                       batch_rows):
    """Full-pipeline A/B: the vectorized mapInArrow encoder body must equal
    the scalar per-row reference byte for byte — including block_id carry
    when an Arrow batch boundary splits a (term, shard) run."""
    import pyarrow as pa

    from searchengine_spark.operators.postings import encode_block_batches

    runs.sort(key=lambda r: (r[0], r[1]))
    rows, doc = [], 0
    for term, sh, cnt in runs:
        for k in range(cnt):
            doc += 1 + (k % 3)  # uneven ascending gaps
            rows.append((term, sh, doc, 1 + (doc % 7), 10 + (doc % 90)))

    def to_batch(chunk):
        return pa.RecordBatch.from_arrays(
            [pa.array([r[0] for r in chunk], pa.string()),
             pa.array([r[1] for r in chunk], pa.int32()),
             pa.array([r[2] for r in chunk], pa.int64()),
             pa.array([r[3] for r in chunk], pa.int64()),
             pa.array([r[4] for r in chunk], pa.int64())],
            ["term", "shard", "doc_id", "tf", "dl"])

    chunks = [rows[i:i + batch_rows] for i in range(0, len(rows), batch_rows)]
    got = []
    for rb in encode_block_batches((to_batch(c) for c in chunks),
                                   block_size, 123.4, 1.2, 0.75):
        for r in rb.to_pylist():
            got.append((r["term"], r["shard"], r["block_id"], r["n"],
                        r["doc_min"], r["doc_max"], r["max_tf"],
                        r["max_tfpart"], r["docs_bin"], r["tfs_bin"],
                        r["dls_bin"]))
    want = _scalar_reference_blocks(chunks, block_size, 123.4, 1.2, 0.75)
    assert got == want


def test_encode_block_batches_rejects_unsorted_docs():
    import pyarrow as pa

    from searchengine_spark.operators.postings import encode_block_batches

    rb = pa.RecordBatch.from_arrays(
        [pa.array(["t", "t"], pa.string()), pa.array([0, 0], pa.int32()),
         pa.array([5, 5], pa.int64()), pa.array([1, 1], pa.int64()),
         pa.array([10, 10], pa.int64())],
        ["term", "shard", "doc_id", "tf", "dl"])
    with pytest.raises(ValueError):
        list(encode_block_batches(iter([rb]), 4, 100.0, 1.2, 0.75))


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
