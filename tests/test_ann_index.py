"""Materialized LSH-ANN index: partitioned-by-bucket layout, multi-probe
reads, and partition pruning in the physical plan."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


@pytest.fixture(scope="module")
def query_vec(emb):
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(x) for x in row["embedding"]]


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    from searchengine_spark.operators.similarity import LshAnnIndex

    path = str(tmp_path_factory.mktemp("ann") / "lsh_index")
    return LshAnnIndex(spark, path, dim=64, n_planes=8).build(emb)


def test_indexed_matches_adhoc_multiprobe(index, emb, query_vec):
    from searchengine_spark.operators.similarity import lsh_ann_topk

    got = index.ann_topk(query_vec, k=5, probe_radius=1,
                         exclude_id=0).collect()
    want = lsh_ann_topk(emb, query_vec, k=5, n_planes=8, exclude_id=0,
                        probe_radius=1).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == \
           [(r["vec_id"], r["cos"]) for r in want]


def test_indexed_scan_is_partition_pruned(index, query_vec):
    from searchengine_spark.operators.similarity import (lsh_bucket_of,
                                                         probe_buckets)

    df = index.ann_topk(query_vec, k=5, probe_radius=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    probes = probe_buckets(lsh_bucket_of(query_vec, 8), 8, 1)
    assert len(probes) == 9  # query bucket + 8 single-bit flips


def test_multiprobe_recall_superset(emb, query_vec):
    """radius-1 probing must return cosine scores >= single-probe at every
    rank (it scans a superset of vectors)."""
    from searchengine_spark.operators.similarity import lsh_ann_topk

    single = lsh_ann_topk(emb, query_vec, k=5, n_planes=8,
                          exclude_id=0).collect()
    multi = lsh_ann_topk(emb, query_vec, k=5, n_planes=8, exclude_id=0,
                         probe_radius=1).collect()
    assert len(multi) >= len(single)
    for m, s in zip(multi, single):
        assert m["cos"] >= s["cos"] - 1e-9


@pytest.fixture(scope="module")
def ivf_index(spark, emb, tmp_path_factory):
    from searchengine_spark.operators.similarity import IvfAnnIndex

    path = str(tmp_path_factory.mktemp("ann") / "ivf_index")
    return IvfAnnIndex(spark, path, dim=64).build(emb)


def test_ivf_indexed_matches_adhoc(ivf_index, emb, query_vec):
    from searchengine_spark.operators.similarity import ivf_ann_topk

    for n_probe in (1, 2):
        got = ivf_index.ann_topk(query_vec, k=5, n_probe=n_probe,
                                 exclude_id=0).collect()
        want = ivf_ann_topk(emb, query_vec, k=5, exclude_id=0,
                            n_probe=n_probe).collect()
        assert [(r["vec_id"], r["cos"]) for r in got] == \
               [(r["vec_id"], r["cos"]) for r in want]


def test_ivf_indexed_scan_is_partition_pruned(ivf_index, query_vec):
    df = ivf_index.ann_topk(query_vec, k=5, n_probe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid" in plan


def test_ivf_multiprobe_superset(emb, query_vec):
    from searchengine_spark.operators.similarity import ivf_ann_topk

    single = ivf_ann_topk(emb, query_vec, k=5, exclude_id=0).collect()
    multi = ivf_ann_topk(emb, query_vec, k=5, exclude_id=0,
                         n_probe=2).collect()
    for m, s in zip(multi, single):
        assert m["cos"] >= s["cos"] - 1e-9


# --- planted-near-dup fixture: recall floors vs brute force ------------------

DIM = 16
N_BASE = 150
N_PLANTED = 12
NOISE = 0.02


@pytest.fixture(scope="module")
def planted(spark):
    """(frame, truth_pairs): random vectors + planted near-duplicates
    (base + tiny noise, pairwise cosine > 0.99). Deterministic seed."""
    import random

    rng = random.Random(20260817)
    rows = []
    for i in range(N_BASE):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(DIM)]))
    truth = []
    for j in range(N_PLANTED):
        src_id, v = rows[j * 7 % N_BASE]
        dup = [x + rng.uniform(-NOISE, NOISE) for x in v]
        rows.append((1000 + j, dup))
        truth.append((src_id, 1000 + j))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")
    return df, truth


def test_cosine_neardup_recall_floor_on_planted(planted):
    """The LSH-blocked near-dup pair operator must recover >= 75% of the
    planted >0.99-cosine pairs (a radius-0 single-bucket block loses a
    pair only when the noise crosses a hyperplane; measured recall on this
    fixture is stable at 10-12 of 12)."""
    from searchengine_spark.operators.similarity import cosine_neardup_pairs

    df, truth = planted
    got = {(r["id_a"], r["id_b"])
           for r in cosine_neardup_pairs(df, dim=DIM, n_planes=8,
                                         threshold=0.98).collect()}
    hits = sum(1 for p in truth if p in got)
    recall = hits / len(truth)
    assert recall >= 0.75, f"recall {recall:.2f} below floor"
    # precision is exact by construction: every emitted pair really has
    # cosine >= threshold (verified filter) — planted are the only such
    assert got <= set(truth)


def test_lsh_index_recall_floor_on_planted(planted, spark, tmp_path_factory):
    """Multi-probe (radius-1) LshAnnIndex top-k vs brute force for planted
    near-dup queries: the true near-duplicate must be found for >= 90% of
    queries (radius-1 probing recovers single-bit bucket splits)."""
    from searchengine_spark.operators.similarity import (LshAnnIndex,
                                                         cosine_topk)

    df, truth = planted
    path = str(tmp_path_factory.mktemp("ann") / "planted_lsh")
    idx = LshAnnIndex(spark, path, dim=DIM, n_planes=8).build(df)
    vecs = {r["vec_id"]: list(r["embedding"]) for r in df.collect()}
    found = 0
    for src, dup in truth:
        got = [r["vec_id"] for r in
               idx.ann_topk(vecs[dup], k=3, probe_radius=1,
                            exclude_id=dup).collect()]
        want = [r["vec_id"] for r in
                cosine_topk(df, vecs[dup], k=1, exclude_id=dup).collect()]
        assert want == [src]  # brute force always finds the planted source
        if src in got:
            found += 1
    recall = found / len(truth)
    assert recall >= 0.9, f"ANN recall {recall:.2f} below floor"
