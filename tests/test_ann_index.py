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
