"""Incremental index maintenance — partition-scoped snapshot-to-snapshot
batch MERGE with a durable, resumable commit protocol.

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
  3. postings/terms/blocks are rewritten ONLY for affected term_buckets,
     and docs ONLY for affected url_buckets, via
     TableIO.overwrite_partitions (the Iceberg dynamic-partition-overwrite
     / MERGE seam): new bucket content = old rows minus touched doc_ids
     plus the delta. One changed page costs O(its buckets), not O(corpus).
  4. stats are recomputed from the small terms table; the blocks
     manifest's avgdl is marked stale so WAND switches to avgdl-free
     max_tf bounds (results stay exact; bounds re-tighten on the next full
     build — see plans/wand.py).

Crash-safety (the C1 build's INDEXING/FAILED lifecycle extended to C3/S7/
S8, per plans/build.py:87-110): the computed delta — the old rows of
touched docs (whose lemmas locate the buckets to purge) and the new doc
rows (with ids already assigned) — is staged DURABLY under <work>/_delta/
plus an atomically-written pending.json marker BEFORE any table is
touched. Each table commit is an atomic manifest swap (old snapshot
readable until the swap), applied in an order where every step is
idempotent given the staged delta, so:

  - a crash before pending.json exists: nothing changed; re-run the upsert;
  - a crash mid-apply: build_status is INDEXING/FAILED (never INDEXED),
    each table is at either its old or new snapshot, and
    resume_delta() replays the apply from the staged frames — replays are
    idempotent because every bucket rewrite is expressed as
    "current rows minus touched keys plus staged delta";
  - only after every commit lands is status INDEXED written and _delta/
    removed.

No Structured Streaming: the reference has no streaming operators, and
checkpointed batch MERGE implements the north_rule's resumability.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.udfs import extract_docs, tokens_from_docs_sql, url_bucket_col
from ..operators.doc_ids import assign_doc_ids
from ..plans.build import IndexBuilder, term_bucket_col
from ..sources.tableio import TableIO

DOC_COLS = ["doc_id", "url", "site", "title", "text"]
DELTA_DIR = "_delta"


def _delta_path(io: TableIO, *parts: str) -> str:
    return os.path.join(io.work_dir, DELTA_DIR, *parts)


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

    # old text of updated urls: its lemmas locate the buckets to purge
    old_touched = old_docs.join(incoming.select("url"), "url", "left_semi")

    _stage_delta(spark, io, changed=changed, touched=old_touched)
    report = apply_staged_delta(spark, io, cfg)
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
    _stage_delta(spark, io, changed=None, touched=removed)
    return apply_staged_delta(spark, io, cfg)


def _stage_delta(spark, io: TableIO, changed: DataFrame | None,
                 touched: DataFrame) -> None:
    """Durably stage the delta: old rows of touched docs + new doc rows
    (with assigned ids). pending.json is written atomically LAST — it is
    the delta's commit point: no marker, no delta (a crash mid-staging
    leaves the index untouched and the caller simply re-runs)."""
    root = _delta_path(io)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    touched.select(*DOC_COLS).write.mode("overwrite").parquet(
        _delta_path(io, "touched"))
    if changed is not None:
        changed.select(*DOC_COLS).write.mode("overwrite").parquet(
            _delta_path(io, "changed"))
    marker = {"has_changed": changed is not None}
    tmp = _delta_path(io, "pending.json.tmp")
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, _delta_path(io, "pending.json"))


def has_pending_delta(io: TableIO) -> bool:
    return os.path.exists(_delta_path(io, "pending.json"))


def resume_delta(spark, io: TableIO, cfg: EngineConfig) -> dict | None:
    """Replay an interrupted upsert/remove from the staged delta (the C3
    analog of build_index(resume=True)). No-op when nothing is pending."""
    if not has_pending_delta(io):
        return None
    from ..sources.tableio import resolve_layout

    return apply_staged_delta(spark, io, resolve_layout(io, cfg))


def apply_staged_delta(spark, io: TableIO, cfg: EngineConfig) -> dict:
    """Apply the staged delta under the build lifecycle protocol:
    INDEXING(stage=delta) on entry, FAILED + kept staging on error (so
    resume_delta can replay), INDEXED + staging removed on success."""
    if not has_pending_delta(io):
        raise RuntimeError("no staged delta to apply")
    with open(_delta_path(io, "pending.json")) as f:
        marker = json.load(f)
    touched = spark.read.parquet(_delta_path(io, "touched"))
    changed = (spark.read.parquet(_delta_path(io, "changed"))
               if marker["has_changed"] else None)

    builder = IndexBuilder(spark, io, cfg)
    builder.write_status("INDEXING", stage="delta")
    try:
        from ..config import committer_v2

        # same engine-owned write-phase scoping as IndexBuilder.build
        with committer_v2(spark):
            report = _apply_delta(spark, io, cfg, builder,
                                  delta_docs=changed, old_touched=touched)
    except BaseException as exc:
        msg = f"{type(exc).__name__}: {exc}".splitlines()[0][:300]
        builder.write_status("FAILED", stage="delta", error=msg)
        raise
    builder.write_status("INDEXED")
    shutil.rmtree(_delta_path(io), ignore_errors=True)
    return report


def _apply_delta(spark, io: TableIO, cfg: EngineConfig,
                 builder: IndexBuilder, delta_docs: DataFrame | None,
                 old_touched: DataFrame) -> dict:
    """Rewrite only the affected term_buckets of postings/terms/blocks and
    the affected url_buckets of docs; recompute scalar stats. Every step is
    an atomic partition-overwrite commit expressed as "current rows minus
    touched keys plus staged delta", so replaying after a crash converges
    to the same state regardless of which commits already landed.

    delta_docs: docs whose NEW text must be indexed (None for pure
    removals); old_touched: docs whose OLD postings must be purged (their
    doc_ids + old lemmas). Both read from the durable _delta/ staging."""
    report: dict[str, dict] = {}

    # --- affected term buckets (old lemmas ∪ new lemmas of touched docs)
    delta_tokens = None
    term_frames = [tokens_from_docs_sql(old_touched).select("term")]
    if delta_docs is not None:
        delta_tokens = tokens_from_docs_sql(delta_docs).withColumn(
            "term_bucket", term_bucket_col(F.col("term"), cfg.term_buckets))
        term_frames.append(delta_tokens.select("term"))
    affected = term_frames[0]
    for fr in term_frames[1:]:
        affected = affected.unionByName(fr)
    buckets = sorted(
        r["b"] for r in affected
        .select(term_bucket_col(F.col("term"), cfg.term_buckets).alias("b"))
        .distinct().collect())
    report["affected_buckets"] = buckets

    touched_ids = old_touched.select("doc_id")
    touched_urls = old_touched.select("url")
    if delta_docs is not None:
        touched_ids = touched_ids.unionByName(delta_docs.select("doc_id"))
        touched_urls = touched_urls.unionByName(delta_docs.select("url"))

    if buckets:
        # --- postings: old bucket rows minus touched docs, plus the delta
        old_postings = io.read("postings")
        newp = (old_postings
                .filter(F.col("term_bucket").isin(buckets))
                .join(touched_ids, "doc_id", "left_anti"))
        if delta_tokens is not None:
            add = delta_tokens.filter(F.col("term_bucket").isin(buckets))
            if "site_id" not in old_postings.columns:
                # legacy table built before postings carried site_id —
                # keep the bucket schema uniform (site_stats falls back
                # to its join path for this index)
                add = add.drop("site_id")
            newp = newp.unionByName(add)
        # sort_by keeps rewritten bucket files (term, doc_id)-ordered —
        # the table's file_sorted contract for the exchange-free blocks
        # encoder (TableIO prepends the partition-column prefix the
        # writer requires; the EliminateSorts discipline lives there)
        newp = newp.repartition(len(buckets), "term_bucket")
        report["postings"] = io.overwrite_partitions(
            newp, "postings", "term_bucket", buckets,
            sort_by=["term", "doc_id"]).to_json()

        # --- terms: recompute df/cf for the rewritten buckets only
        newt = (io.read("postings")
                .filter(F.col("term_bucket").isin(buckets))
                .groupBy("term")
                .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
                .withColumn("term_bucket",
                            term_bucket_col(F.col("term"), cfg.term_buckets))
                .repartition(len(buckets), "term_bucket"))
        report["terms"] = io.overwrite_partitions(
            newt, "terms", "term_bucket", buckets,
            # the full build's observed corpus totals (Σcf/Σdf on the terms
            # write job) and head-term list are stale once any bucket is
            # rewritten — null them so _stage_stats/_stage_blocks
            # re-aggregate instead of trusting them
            extra_update={"total_tokens": None,
                          "n_postings": None,
                          "head_terms": None,
                          "head_df_threshold": None}).to_json()

    # --- docs: rewrite only the touched url_buckets (atomic partition
    # commit — the old docs snapshot stays readable until the manifest
    # swap, and the old-lemma delta needed to purge stale postings lives
    # in _delta/, never only in the table being overwritten)
    report["docs"] = _commit_docs(spark, io, cfg, delta_docs, touched_urls)

    # stats AFTER the docs commit: n_docs comes from the docs manifest
    report["stats"] = builder._stage_stats().to_json()

    # site_stats: lemma rows of the affected term buckets + the -1 pages
    # rows (docs changed) — same partition-overwrite discipline; a legacy
    # index without the stage gets a full rebuild of the tiny table
    if io.stage_complete("site_stats"):
        ss = builder._site_stats_frame(io.read("docs"), io.read("postings"),
                                       buckets)
        ss_buckets = [*buckets, -1]
        ss = ss.repartition(len(ss_buckets), "term_bucket")
        report["site_stats"] = io.overwrite_partitions(
            ss, "site_stats", "term_bucket", ss_buckets).to_json()
    else:
        report["site_stats"] = builder._stage_site_stats().to_json()

    if buckets:
        # --- blocks: re-encode the rewritten buckets; mark block-max
        # bounds stale (max_tfpart of untouched buckets bakes the OLD
        # avgdl — WAND switches to the avgdl-free max_tf bound).
        # The rewritten bucket files keep the (term, doc_id) file-sorted
        # contract (the newp sort above leads with term_bucket), so the
        # exchange-free encoder applies here exactly as in the full
        # build's _stage_blocks — the rewritten buckets' postings are
        # scanned straight into the encoder, never shuffled.
        from ..operators.postings import build_blocks, one_task_per_file

        terms_tbl = io.read("terms")
        head = [r["term"] for r in
                terms_tbl.filter(F.col("df") > cfg.salt_df_threshold)
                         .select("term").collect()]
        stats = io.read_meta("stats")
        pex = (io.read_manifest("postings") or {}).get("extra", {})
        presorted = bool(pex.get("file_sorted"))
        newb = build_blocks(
            io.read("postings").filter(F.col("term_bucket").isin(buckets)),
            head, float(stats["avgdl"]) or 1.0, cfg,
            n_partitions=len(buckets), presorted=presorted)
        newb = newb.withColumn(
            "term_bucket", term_bucket_col(F.col("term"), cfg.term_buckets))
        if not presorted:
            newb = newb.repartition(len(buckets), "term_bucket")
        with one_task_per_file(spark, presorted):
            report["blocks"] = io.overwrite_partitions(
                newb, "blocks", "term_bucket", buckets,
                sort_by=["term", "shard", "doc_min"],
                extra_update={"head_terms": head, "avgdl": None}).to_json()

    return report


def _commit_docs(spark, io: TableIO, cfg: EngineConfig,
                 delta_docs: DataFrame | None,
                 touched_urls: DataFrame) -> dict:
    """Partition-scoped docs commit: replacement rows for each affected
    url_bucket = current bucket rows minus touched urls plus the staged
    changed rows — idempotent under replay. Falls back to a staged full
    rewrite for indexes built before the url_bucket layout."""
    docs_extra = (io.read_manifest("docs") or {}).get("extra", {})
    n_b = int(docs_extra.get("doc_id_buckets", cfg.doc_id_buckets))

    if not docs_extra.get("url_bucket_partitioned"):
        # legacy unpartitioned docs table: full rewrite via the atomic
        # replace protocol (side-dir write + generation move + manifest
        # swap) — the old snapshot stays readable through any crash, so
        # resume_delta can always replay
        kept = io.read("docs").join(touched_urls, "url", "left_anti")
        new_docs = kept.select(*DOC_COLS)
        if delta_docs is not None:
            new_docs = new_docs.unionByName(delta_docs.select(*DOC_COLS))
        return io.replace_table(new_docs, "docs", extra=docs_extra).to_json()

    bucket_of_url = url_bucket_col(F.col("url"), n_b)
    url_frames = [touched_urls]
    if delta_docs is not None:
        url_frames.append(delta_docs.select("url"))
    all_urls = url_frames[0]
    for fr in url_frames[1:]:
        all_urls = all_urls.unionByName(fr)
    doc_buckets = sorted(
        r["b"] for r in
        all_urls.select(bucket_of_url.alias("b")).distinct().collect())
    if not doc_buckets:
        return (io.read_manifest("docs") or {})

    cur = (io.read("docs")
           .filter(F.col("url_bucket").isin(doc_buckets))
           .join(all_urls.distinct(), "url", "left_anti")
           .select(*DOC_COLS, "url_bucket"))
    repl = cur
    if delta_docs is not None:
        repl = repl.unionByName(
            delta_docs.select(*DOC_COLS)
            .withColumn("url_bucket", bucket_of_url)
            .filter(F.col("url_bucket").isin(doc_buckets)))
    # sort_by keeps rewritten bucket files doc_id-ascending for the
    # serving path's point reads, same discipline as the full build
    # (TableIO prepends the url_bucket prefix the writer requires)
    repl = repl.repartition(len(doc_buckets), "url_bucket")
    return io.overwrite_partitions(
        repl, "docs", "url_bucket", doc_buckets,
        sort_by=["doc_id"]).to_json()
