"""Incremental index maintenance — partition-scoped snapshot-to-snapshot
batch MERGE.

The reference mutates counters in place: single-page reindex deletes the
page's postings, re-lemmatizes, decrements each lemma's df and deletes
zero-df lemmas (services/IndexingServiceImpl.removePageDataFromBD :185-198);
site removal cascades deletes (:154-163). Read-modify-write counters do not
scale; here maintenance is declarative AND partition-scoped:

  1. doc_ids are STABLE: an updated url keeps its doc_id; new urls append
     after max(doc_id) in deterministic (bucket, url) order; removals leave
     gaps (delta-gap codec only needs ascending ids). Unchanged docs'
     postings are therefore byte-identical and never rewritten.
  2. affected terms = lemmas of the OLD text of touched docs (the
     reference's re-lemmatize step, :187) ∪ lemmas of the NEW text;
     affected term_buckets = their hash buckets — a bounded set.
  3. postings/terms/blocks are rewritten ONLY for affected buckets via
     TableIO.overwrite_partitions (the Iceberg dynamic-partition-overwrite
     / MERGE seam): new bucket content = old rows minus touched doc_ids
     plus the delta tokens. One changed page costs O(its buckets), not
     O(corpus).
  4. stats are recomputed from the small terms table; the blocks
     manifest's avgdl is marked stale so WAND switches to avgdl-free
     max_tf bounds (results stay exact; bounds re-tighten on the next full
     build — see plans/wand.py).

The docs table itself is the one remaining full rewrite (narrow columns;
at production scale it would be url-bucket partitioned and merged the same
way). No Structured Streaming: the reference has no streaming operators,
and checkpointed batch MERGE implements the north_rule's resumability.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.udfs import extract_docs, tokens_from_docs_sql
from ..operators.doc_ids import assign_doc_ids
from ..plans.build import IndexBuilder, term_bucket_col
from ..sources.tableio import TableIO

DOC_COLS = ["doc_id", "url", "site", "title", "text"]


def upsert_docs(spark, io: TableIO, cfg: EngineConfig,
                changed_pages: DataFrame) -> dict:
    """C3 indexPage generalized to a batch of pages: replace-by-url with
    stable ids and bucket-scoped index maintenance."""
    from ..sources.tableio import resolve_layout

    cfg = resolve_layout(io, cfg)  # write with the index's OWN layout
    old_docs = io.read("docs")
    incoming = extract_docs(changed_pages)

    # stage the (small) incoming batch once; everything below reuses it
    inc_path = os.path.join(io.work_dir, "_staged_incoming")
    incoming.write.mode("overwrite").parquet(inc_path)
    incoming = spark.read.parquet(inc_path)

    old_ids = old_docs.select("doc_id", "url")
    updated = incoming.join(old_ids, "url")  # keeps old doc_id
    fresh = incoming.join(old_ids.select("url"), "url", "left_anti")
    max_id = old_docs.agg(F.max("doc_id")).collect()[0][0]
    base = int(max_id) + 1 if max_id is not None else 0
    fresh_ids = (assign_doc_ids(fresh, cfg.doc_id_buckets)
                 .withColumn("doc_id", (F.col("doc_id") + F.lit(base))
                             .cast("long")))
    changed = (updated.select(*DOC_COLS)
               .unionByName(fresh_ids.select(*DOC_COLS)))

    kept = old_docs.join(incoming.select("url"), "url", "left_anti")
    new_docs = kept.select(*DOC_COLS).unionByName(changed)

    # old text of updated urls: its lemmas locate the buckets to purge
    old_touched = old_docs.join(incoming.select("url"), "url", "left_semi")

    report = _apply_delta(spark, io, cfg, new_docs,
                          delta_docs=changed, old_touched=old_touched)
    shutil.rmtree(inc_path, ignore_errors=True)
    return report


def remove_docs(spark, io: TableIO, cfg: EngineConfig,
                site: str | None = None, url: str | None = None) -> dict:
    """S7 (site cascade delete) / S8 (page delete + df recompute): purge
    the victims' postings from their terms' buckets only."""
    from ..sources.tableio import resolve_layout

    if site is None and url is None:
        raise ValueError("remove_docs requires site= or url=")
    cfg = resolve_layout(io, cfg)  # write with the index's OWN layout
    docs = io.read("docs")
    cond = F.lit(True)
    if site is not None:
        cond = cond & (F.col("site") == F.lit(site))
    if url is not None:
        cond = cond & (F.col("url") == F.lit(url))
    removed = docs.filter(cond)
    new_docs = docs.filter(~cond).select(*DOC_COLS)
    return _apply_delta(spark, io, cfg, new_docs,
                        delta_docs=None, old_touched=removed)


def _apply_delta(spark, io: TableIO, cfg: EngineConfig, new_docs: DataFrame,
                 delta_docs: DataFrame | None,
                 old_touched: DataFrame) -> dict:
    """Commit docs' and rewrite only the affected term_buckets of
    postings/terms/blocks; recompute scalar stats. delta_docs: docs whose
    NEW text must be indexed (None for pure removals); old_touched: docs
    whose OLD postings must be purged (their doc_ids + old lemmas)."""
    report: dict[str, dict] = {}

    # every input frame reads the CURRENT docs table, which is about to be
    # overwritten — stage the (small) touched frames and the new docs table
    # to side dirs first, then swap
    def _stage(df: DataFrame, name: str) -> DataFrame:
        p = os.path.join(io.work_dir, name)
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    old_touched = _stage(old_touched.select(*DOC_COLS), "_staged_touched")
    if delta_docs is not None:
        delta_docs = _stage(delta_docs.select(*DOC_COLS), "_staged_delta")
    side = os.path.join(io.work_dir, "_staged_docs")
    new_docs.write.mode("overwrite").parquet(side)
    staged = spark.read.parquet(side)
    old_extra = (io.read_manifest("docs") or {}).get("extra", {})
    report["docs"] = io.write_stage(staged, "docs", extra=old_extra).to_json()

    # --- affected buckets (old lemmas ∪ new lemmas of touched docs)
    delta_tokens = None
    term_frames = [tokens_from_docs_sql(old_touched).select("term")]
    if delta_docs is not None:
        delta_tokens = tokens_from_docs_sql(delta_docs).withColumn(
            "term_bucket", term_bucket_col(F.col("term"), cfg.term_buckets))
        term_frames.append(delta_tokens.select("term"))
    affected = term_frames[0]
    for f in term_frames[1:]:
        affected = affected.unionByName(f)
    buckets = sorted(
        r["b"] for r in affected
        .select(term_bucket_col(F.col("term"), cfg.term_buckets).alias("b"))
        .distinct().collect())
    report["affected_buckets"] = buckets

    touched_ids = old_touched.select("doc_id")
    if delta_docs is not None:
        touched_ids = touched_ids.unionByName(delta_docs.select("doc_id"))

    if buckets:
        # --- postings: old bucket rows minus touched docs, plus the delta
        old_postings = io.read("postings")
        newp = (old_postings
                .filter(F.col("term_bucket").isin(buckets))
                .join(touched_ids, "doc_id", "left_anti"))
        if delta_tokens is not None:
            newp = newp.unionByName(
                delta_tokens.filter(F.col("term_bucket").isin(buckets)))
        newp = (newp.repartition(len(buckets), "term_bucket")
                    .sortWithinPartitions("term", "doc_id"))
        report["postings"] = io.overwrite_partitions(
            newp, "postings", "term_bucket", buckets).to_json()

        # --- terms: recompute df/cf for the rewritten buckets only
        newt = (io.read("postings")
                .filter(F.col("term_bucket").isin(buckets))
                .groupBy("term")
                .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
                .withColumn("term_bucket",
                            term_bucket_col(F.col("term"), cfg.term_buckets))
                .repartition(len(buckets), "term_bucket"))
        report["terms"] = io.overwrite_partitions(
            newt, "terms", "term_bucket", buckets).to_json()

    builder = IndexBuilder(spark, io, cfg)
    report["stats"] = builder._stage_stats().to_json()

    if buckets:
        # --- blocks: re-encode the rewritten buckets; mark block-max
        # bounds stale (max_tfpart of untouched buckets bakes the OLD
        # avgdl — WAND switches to the avgdl-free max_tf bound)
        from ..operators.postings import build_blocks

        terms_tbl = io.read("terms")
        head = [r["term"] for r in
                terms_tbl.filter(F.col("df") > cfg.salt_df_threshold)
                         .select("term").collect()]
        stats = io.read_meta("stats")
        newb = (build_blocks(
                    io.read("postings").filter(F.col("term_bucket").isin(buckets)),
                    head, float(stats["avgdl"]) or 1.0, cfg,
                    n_partitions=len(buckets))
                .withColumn("term_bucket",
                            term_bucket_col(F.col("term"), cfg.term_buckets))
                .repartition(len(buckets), "term_bucket")
                .sortWithinPartitions("term", "shard", "doc_min"))
        report["blocks"] = io.overwrite_partitions(
            newb, "blocks", "term_bucket", buckets,
            extra_update={"head_terms": head, "avgdl": None}).to_json()

    builder.write_status("INDEXED")
    shutil.rmtree(side, ignore_errors=True)
    shutil.rmtree(os.path.join(io.work_dir, "_staged_touched"),
                  ignore_errors=True)
    shutil.rmtree(os.path.join(io.work_dir, "_staged_delta"),
                  ignore_errors=True)
    return report
