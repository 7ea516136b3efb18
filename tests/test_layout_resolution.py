"""Regression tests for layout-parameter resolution and response-shape
parity across query strategies.

An index carries its own layout (term bucket count, head-term shard width,
block size) in the stage manifests; query paths must read THAT, not live
config — an index built with term_buckets=8 queried under a cfg that says
64 would prune to the wrong partitions and silently return nothing.
"""

import shutil

import pytest

from searchengine_spark.config import EngineConfig
from searchengine_spark.plans.api import SearchEngine
from searchengine_spark.plans.query import QueryEngine
from searchengine_spark.sources.corpus import gen_pages_spark
from searchengine_spark.sources.tableio import TableIO, resolve_layout

N_DOCS = 120


@pytest.fixture(scope="module")
def small_bucket_engine(spark, tmp_path_factory):
    """Index built with a deliberately non-default layout."""
    work = str(tmp_path_factory.mktemp("layout_work"))
    cfg = EngineConfig(term_buckets=8, block_size=32)
    eng = SearchEngine(spark, work, cfg)
    eng.build_index(gen_pages_spark(spark, N_DOCS, partitions=4))
    yield eng, work
    shutil.rmtree(work, ignore_errors=True)


def _a_query(eng) -> str:
    # pick a term guaranteed indexed: highest-df non-stopword
    from pyspark.sql import functions as F

    terms = eng.io.read("terms")
    n = eng.query_engine.stats["n_docs"]
    row = (terms.filter(F.col("df") / F.lit(float(n)) <= 0.95)
                .orderBy(F.col("df").desc(), F.col("term"))
                .select("term").first())
    return row["term"]


def test_resolve_layout_prefers_manifest(spark, small_bucket_engine):
    eng, work = small_bucket_engine
    io = TableIO(spark, work)
    resolved = resolve_layout(io, EngineConfig())  # default cfg says 64
    assert resolved.term_buckets == 8
    assert resolved.block_size == 32


def test_resolve_layout_falls_back_to_cfg(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "empty"))
    cfg = EngineConfig(term_buckets=16)
    assert resolve_layout(io, cfg).term_buckets == 16


def test_query_engine_reads_foreign_layout_index(spark, small_bucket_engine):
    """QueryEngine built under DEFAULT cfg must still answer over the
    8-bucket index (exact, wand, and driver strategies)."""
    eng, work = small_bucket_engine
    io = TableIO(spark, work)
    qe = QueryEngine(spark, io)  # no cfg: defaults say term_buckets=64
    assert qe.cfg.term_buckets == 8
    q = _a_query(eng)
    for strategy in ("exact", "wand", "driver"):
        r = qe.search(q, limit=5, strategy=strategy)
        assert r["result"] is True, (strategy, r)
        assert r["count"] > 0 and len(r["data"]) > 0


def test_offset_past_end_shape_parity(small_bucket_engine):
    """All strategies must agree on the offset-past-last-hit response:
    result=True, full count, empty data (not ERR_NOT_FOUND)."""
    eng, _ = small_bucket_engine
    q = _a_query(eng)
    base = eng.search(q, limit=5, strategy="exact")
    assert base["result"] is True and base["count"] > 0
    far = base["count"] + 100
    responses = {s: eng.search(q, limit=5, offset=far, strategy=s)
                 for s in ("exact", "wand", "driver")}
    for s, r in responses.items():
        assert r["result"] is True, (s, r)
        assert r["count"] == base["count"], (s, r)
        assert r["data"] == [], (s, r)


def test_warm_returns_pinned_tables(spark, small_bucket_engine):
    eng, work = small_bucket_engine
    qe = QueryEngine(spark, TableIO(spark, work))
    pinned = qe.warm()
    assert set(pinned) == {"postings", "terms", "blocks", "docs"}


def test_block_id_sequential_across_batches(spark, small_bucket_engine):
    """(term, shard, block_id) must be unique with block_id dense from 0
    even when a posting run spans Arrow batch boundaries."""
    from pyspark.sql import functions as F

    eng, work = small_bucket_engine
    io = TableIO(spark, work)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        # tiny batches force every long run to span many batches
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
        from searchengine_spark.operators.postings import build_blocks

        cfg = eng.cfg
        postings = io.read("postings")
        blocks = build_blocks(postings, [], 10.0, cfg).select(
            "term", "shard", "block_id").collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    seen: dict[tuple, list[int]] = {}
    for r in blocks:
        seen.setdefault((r["term"], r["shard"]), []).append(r["block_id"])
    assert len(blocks) == sum(len(v) for v in seen.values())
    for key, ids in seen.items():
        assert sorted(ids) == list(range(len(ids))), (key, sorted(ids)[:5])


def test_postings_files_are_term_doc_sorted(small_bucket_engine):
    """Every postings FILE must be internally (term, doc_id)-ordered: the
    exchange-free blocks encoder consumes file order directly, and parquet
    row-group min/max pruning needs it. Regression: the partitionBy writer
    inserts its own partition-column sort when the task ordering doesn't
    lead with it, and Catalyst's EliminateSorts then removes ours — files
    silently land in raw generation order (caught live before the fix)."""
    import glob

    import pyarrow.parquet as pq

    eng, work = small_bucket_engine
    assert eng.io.read_manifest("postings")["extra"]["file_sorted"] is True
    files = glob.glob(f"{work}/postings/term_bucket=*/*.parquet")
    assert files
    for f in files:
        t = pq.read_table(f, columns=["term", "doc_id"])
        rows = list(zip(t["term"].to_pylist(), t["doc_id"].to_pylist()))
        assert all(a < b for a, b in zip(rows, rows[1:])), \
            f"file {f} not (term, doc_id)-ordered"


def test_presorted_blocks_match_repartition_path(small_bucket_engine):
    """The exchange-free blocks path (file-ordered scan straight into the
    encoder) must produce the exact block set — including block_id — that
    the repartition+sort path produces."""
    from searchengine_spark.operators.postings import build_blocks

    eng, _ = small_bucket_engine
    stats = eng.io.read_meta("stats")
    head = eng.io.read_manifest("blocks")["extra"]["head_terms"]

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    alt = build_blocks(eng.io.read("postings"), head, stats["avgdl"],
                       eng.cfg, presorted=False)
    table = eng.io.read("blocks").drop("term_bucket")
    assert snap(table) == snap(alt.select(*table.columns))


def test_presorted_blocks_plan_has_no_exchange(small_bucket_engine):
    """The full-build blocks stage must not shuffle posting rows: scan ->
    encode, no Exchange operator anywhere in the plan."""
    from searchengine_spark.operators.postings import build_blocks

    eng, _ = small_bucket_engine
    stats = eng.io.read_meta("stats")
    head = eng.io.read_manifest("blocks")["extra"]["head_terms"]
    plan = (build_blocks(eng.io.read("postings"), head, stats["avgdl"],
                         eng.cfg, presorted=True)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_incremental_rewrite_keeps_file_sorted_contract(spark, tmp_path):
    """An upsert rewrites touched postings/docs buckets via partition
    overwrite; the rewritten files must keep the layout contracts the
    exchange-free encoder and the serving point-reads rely on:
    postings files stay (term, doc_id)-ordered (file_sorted flag intact),
    docs files stay doc_id-ascending. Regression: the partitionBy writer
    inserts its own partition-column sort when the task ordering doesn't
    lead with it, and EliminateSorts then deletes ours."""
    import glob

    import pyarrow.parquet as pq
    from searchengine_spark.sources.corpus import gen_pages_local

    work = str(tmp_path / "inc_sorted")
    eng = SearchEngine(spark, work, EngineConfig(term_buckets=8))
    eng.build_index(gen_pages_spark(spark, N_DOCS, partitions=4))

    base = gen_pages_local(N_DOCS)
    extra = gen_pages_local(N_DOCS + 2)[-2:]
    changed = [dict(base[5], html=base[50]["html"], text=base[50]["text"]),
               *extra]
    pdf = spark.createDataFrame(
        [(c["url"], c["warc_ts"], c["html"], c["text"], c["lang"])
         for c in changed],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    eng.upsert_docs(pdf)

    m = eng.io.read_manifest("postings")
    assert m["extra"]["file_sorted"] is True
    live = {f["path"] for f in m["files"]}
    gen_files = [p for p in glob.glob(f"{work}/postings/term_bucket=*/*.parquet")
                 if p.replace(f"{work}/", "", 1) in live
                 and "gen-" in p.rsplit("/", 1)[1]]
    assert gen_files, "upsert should have rewritten at least one bucket"
    for f in gen_files:
        t = pq.read_table(f, columns=["term", "doc_id"])
        rows = list(zip(t["term"].to_pylist(), t["doc_id"].to_pylist()))
        assert all(a < b for a, b in zip(rows, rows[1:])), \
            f"rewritten postings file {f} not (term, doc_id)-ordered"

    doc_gen = [p for p in glob.glob(f"{work}/docs/url_bucket=*/*.parquet")
               if "gen-" in p.rsplit("/", 1)[1]]
    assert doc_gen, "upsert should have rewritten at least one docs bucket"
    for f in doc_gen:
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids), \
            f"rewritten docs file {f} not doc_id-ascending"


def test_overwrite_partitions_crash_safety(spark, tmp_path):
    """An interrupted partition overwrite (new-generation files present,
    manifest NOT yet swapped) must leave Spark reads on the OLD snapshot;
    vacuum removes the debris."""
    import os

    from pyspark.sql import functions as F

    io = TableIO(spark, str(tmp_path / "crash"))
    df = spark.range(0, 100).select(
        F.col("id").alias("v"), (F.col("id") % 4).cast("int").alias("pk"))
    io.write_stage(df.repartition(4, "pk"), "t", partition_by=["pk"])
    assert io.read("t").count() == 100

    # simulate the crash: drop a rogue new-generation file into a
    # partition dir WITHOUT committing a manifest swap
    part_dir = os.path.join(io.path("t"), "pk=1")
    victim = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
    import shutil
    rogue = os.path.join(part_dir, "gen-deadbeef-rogue.parquet")
    shutil.copy(os.path.join(part_dir, victim), rogue)

    # manifest-pinned read: still exactly the old snapshot (a plain
    # directory read would double-count pk=1)
    assert io.read("t").count() == 100
    assert spark.read.parquet(io.path("t")).count() > 100  # the hazard

    assert io.vacuum("t") == 1
    assert not os.path.exists(rogue)
    assert io.read("t").count() == 100

    # a real commit through the protocol: replace pk=1 rows with 5 rows
    repl = spark.range(0, 5).select(
        F.col("id").alias("v"), F.lit(1).cast("int").alias("pk"))
    io.overwrite_partitions(repl, "t", "pk", [1])
    got = io.read("t")
    assert got.count() == 75 + 5
    assert got.filter(F.col("pk") == 1).count() == 5
    # directory agrees after the commit's trailing vacuum
    assert spark.read.parquet(io.path("t")).count() == 80
