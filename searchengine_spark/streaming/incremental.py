"""Incremental index maintenance — snapshot-to-snapshot batch MERGE.

The reference mutates counters in place: single-page reindex deletes the
page's postings, re-lemmatizes, decrements each lemma's df and deletes
zero-df lemmas (services/IndexingServiceImpl.removePageDataFromBD :185-198);
site removal cascades deletes (:154-163). Read-modify-write counters do not
scale; here maintenance = rebuild the affected slices declaratively:

  upsert_docs(changed):  docs' = docs ⟂ changed (anti-join on url) ∪ extract(changed)
  remove_docs(site/url): docs' = docs filtered

then postings/terms/stats are recomputed FROM docs' — the same stage code as
the full build, committed as a new snapshot (manifests rewritten). Doc ids
are reassigned (they are a function of the url set — deterministic), which
keeps ids dense for delta-gap compression; at production scale this step
switches to Iceberg MERGE on unchanged partitions.

No Structured Streaming is used: the reference has no streaming operators
(SURVEY.md §2 Streaming), and checkpointed batch MERGE implements the
north_rule's resumability directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.udfs import extract_docs
from ..operators.doc_ids import assign_doc_ids
from ..sources.tableio import TableIO
from .. import __name__ as _pkg  # noqa: F401


def _recommit_docs(spark, io: TableIO, cfg: EngineConfig, new_docs: DataFrame) -> dict:
    """Write docs' and rebuild the derived stages (postings/terms/stats)."""
    from ..plans.build import IndexBuilder, STAGES

    docs = assign_doc_ids(new_docs.select("url", "site", "title", "text"),
                          cfg.doc_id_buckets)
    # stage a temp table then swap: read+overwrite of the same parquet dir
    # in one plan is unsafe
    staged = docs.select("doc_id", "url", "site", "title", "text")
    staged_pd = staged.toPandas() if staged.count() < 200_000 else None
    io.invalidate_from(STAGES, "docs")
    if staged_pd is not None:
        out = spark.createDataFrame(staged_pd, schema="doc_id long, url string, site string, title string, text string")
    else:  # large path: checkpoint through a side directory
        side = io.path("_docs_staged")
        staged.write.mode("overwrite").parquet(side)
        out = spark.read.parquet(side)
    res_docs = io.write_stage(out, "docs", extra={"doc_id_buckets": cfg.doc_id_buckets})

    builder = IndexBuilder(spark, io, cfg)
    report = {"docs": res_docs.to_json()}
    report["postings"] = builder._stage_postings().to_json()
    report["terms"] = builder._stage_terms().to_json()
    report["stats"] = builder._stage_stats().to_json()
    report["blocks"] = builder._stage_blocks().to_json()
    return report


def upsert_docs(spark, io: TableIO, cfg: EngineConfig,
                changed_pages: DataFrame) -> dict:
    """C3 indexPage generalized to a batch of pages: replace-by-url."""
    existing = io.read("docs").select("url", "site", "title", "text")
    incoming = extract_docs(changed_pages)
    kept = existing.join(incoming.select("url"), "url", "left_anti")
    return _recommit_docs(spark, io, cfg, kept.unionByName(incoming))


def remove_docs(spark, io: TableIO, cfg: EngineConfig,
                site: str | None = None, url: str | None = None) -> dict:
    """S7 (site cascade delete) / S8 (single page delete + df recompute)."""
    docs = io.read("docs").select("url", "site", "title", "text")
    if site is not None:
        docs = docs.filter(F.col("site") != F.lit(site))
    if url is not None:
        docs = docs.filter(F.col("url") != F.lit(url))
    return _recommit_docs(spark, io, cfg, docs)
