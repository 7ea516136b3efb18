"""Index build plan — pages ➜ docs ➜ postings ➜ terms ➜ stats.

Replaces the reference's crawl-and-upsert build
(services/IndexingServiceImpl.startIndexing :80-108 + RecursiveSearch): the
crawl's output is our input table; every MySQL read-modify-write counter
(df increment, RecursiveSearch.java:150-161) becomes a declarative
aggregation; each stage commit is a checkpoint (manifest + parquet dir).

Stage graph (each stage resumable, per-partition lineage in _manifest/):

  docs      pages --extract(mapInPandas)--> +deterministic doc_id
  postings  docs --tokenize+tf(mapInPandas)--> (term, doc_id, tf, dl, site)
            partitioned by term_bucket, sorted by (term, doc_id) within files
  terms     postings groupBy(term) -> df, cf   (A2; exact, not incremental)
  stats     scalar corpus stats: n_docs, total_tokens, avgdl  (A3)

Scale notes (100 TB / 10^12 docs):
- the html BINARY column is pruned immediately after extraction; nothing
  downstream ever shuffles raw html
- tokens are pre-aggregated per document inside the Arrow batch (map-side
  combine), so the only wide exchange is the term_bucket repartition
- doc-id assignment is one hash-bucket shuffle + per-bucket sort; bucket
  count is config (raise to thousands of buckets on a real cluster)
- head-term skew is handled at the block-build stage (operators/postings.py)
  by range-sharding doc_ids of high-df terms — see build_blocks
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.udfs import (extract_docs, tokens_from_docs,
                              tokens_from_docs_sql, url_bucket_col)
from ..operators.doc_ids import attach_doc_ids, compute_bucket_offsets
from ..sources.tableio import TableIO

STAGES = ["docs", "postings", "terms", "stats", "site_stats", "blocks"]


def term_bucket_col(term_col, n_buckets: int):
    """Partition key for the postings layout — same md5 spec as doc buckets
    so the oracle/tests can reproduce it."""
    return url_bucket_col(term_col, n_buckets)


class IndexBuilder:
    def __init__(self, spark, io: TableIO, cfg: EngineConfig | None = None,
                 stop_event=None):
        self.spark = spark
        self.io = io
        self.cfg = cfg or EngineConfig()
        # cooperative cancellation (C2): job-group cancel kills in-flight
        # Spark jobs; this event stops the build between stages, where no
        # job is running to cancel
        self.stop_event = stop_event

    # ------------------------------------------------------------------

    def build(self, pages: DataFrame, resume: bool = False) -> dict:
        """Run all stages; with resume=True, completed stages are skipped
        (checkpoint-restart, north_rule). Returns the stage report dict.

        Lifecycle mirrors the reference site status rows
        (IndexingServiceImpl.java:80-108,165-171): build_status meta is
        INDEXING (with the in-flight stage) while running, INDEXED on
        success, FAILED + error on abort/exception — and the interrupted
        stage gets an `aborted` manifest so resume knows where to restart."""
        report: dict[str, dict] = {}
        if not resume:
            self.io.invalidate_from(STAGES, STAGES[0])

        # build-scoped AQE setting (cfg.build_adaptive — see config.py for
        # the measurement); session value restored on every exit path.
        # Conf is session-wide, so a query racing an async build sees the
        # build's setting — plans stay correct either way, only stage
        # boundaries differ.
        from ..config import committer_v2

        aqe_key = "spark.sql.adaptive.enabled"
        aqe_old = self.spark.conf.get(aqe_key, "true")
        self.spark.conf.set(aqe_key, str(self.cfg.build_adaptive).lower())
        try:
            # committer v2 scoped the same way (engine-owned write phase;
            # measured −14% build wall — see config.committer_v2)
            with committer_v2(self.spark):
                return self._build_stages(pages, resume, report)
        finally:
            self.spark.conf.set(aqe_key, aqe_old)

    def _build_stages(self, pages: DataFrame, resume: bool,
                      report: dict) -> dict:
        from ..sources.tableio import StageResult

        t0 = time.monotonic()
        started: list[str] = []  # append-only; GIL-atomic across branches

        def run_stage(s: str, fn) -> None:
            started.append(s)
            if resume and self.io.stage_complete(s):
                report[s] = {**self.io.read_manifest(s), "skipped": True}
                return
            if self.stop_event is not None and self.stop_event.is_set():
                raise InterruptedError("build stopped by user")
            report[s] = fn().to_json()

        self.write_status("INDEXING")
        try:
            self.write_status("INDEXING", stage="docs")
            run_stage("docs", lambda: self._stage_docs(pages))
            self.write_status("INDEXING", stage="postings")
            run_stage("postings", self._stage_postings)

            # site_stats depends only on docs+postings, nothing downstream
            # of it until the end — run it CONCURRENTLY with the
            # terms→stats→blocks chain (independent DAG branches; the
            # driver-side gaps between one branch's jobs are filled by the
            # other's tasks). This is serial fixed cost under Amdahl:
            # removing it is worth more at higher parallelism, which is
            # exactly what the north_rule's scaling criterion measures.
            # InheritableThread propagates the job group (C2 stop) and a
            # plain dict/list carries the branch's report entries (GIL-
            # atomic). Each stage still commits its own manifest, so
            # resume/abort semantics are unchanged.
            self.write_status("INDEXING", stage="terms+site_stats")
            from pyspark import InheritableThread

            branch_exc: list[BaseException] = []

            def ss_branch() -> None:
                try:
                    run_stage("site_stats", self._stage_site_stats)
                except BaseException as e:  # surfaced after join
                    branch_exc.append(e)

            th = InheritableThread(target=ss_branch, daemon=True)
            th.start()
            try:
                run_stage("terms", self._stage_terms)
                run_stage("stats", self._stage_stats)
                self.write_status("INDEXING", stage="blocks")
                run_stage("blocks", self._stage_blocks)
            finally:
                th.join()
            if branch_exc:
                raise branch_exc[0]
        except BaseException as exc:  # incl. job-group cancellation
            msg = f"{type(exc).__name__}: {exc}".splitlines()[0][:300]
            # mark every attempted-but-uncommitted stage aborted (with
            # branches, more than one can be in flight) — and ONLY those:
            # a stop landing on a resume-skipped (complete) stage must not
            # clobber its manifest (vacuum would then treat every file of
            # the table as dead)
            failed_at = None
            for s in started:
                if not self.io.stage_complete(s):
                    failed_at = failed_at or s
                    self.io.write_manifest(StageResult(
                        stage=s, status="aborted", rows=0, bytes=0,
                        wall_ms=int((time.monotonic() - t0) * 1000),
                        extra={"error": msg}))
            # started can be empty (failure before the first run_stage,
            # e.g. the initial write_status raising) — never let the
            # handler itself crash and mask the real error
            last = started[-1] if started else STAGES[0]
            try:
                self.write_status("FAILED", stage=failed_at or last,
                                  error=msg)
            except Exception:
                pass  # a status-write failure must not mask the real one
            raise
        self.write_status("INDEXED")
        report["_total_wall_ms"] = int((time.monotonic() - t0) * 1000)
        return report

    def write_status(self, status: str, stage: str | None = None,
                     error: str | None = None) -> None:
        """Reference Website.status/status_time/last_error analog
        (model/Website.java:14-35), one record for the whole input table."""
        self.io.write_meta("build_status", {
            "status": status, "stage": stage, "error": error,
            "status_time": int(time.time() * 1000),
        })

    # ------------------------------------------------------------------

    def _stage_docs(self, pages: DataFrame):
        # ids are a function of the url SET only: the bucket-count job runs
        # on a url-only projection (Catalyst prunes the scan; html never
        # loads), then the extract UDF runs exactly once and the id window
        # shuffles the html-free extracted frame.
        #
        # The table is PARTITIONED by url_bucket (the same md5 bucket that
        # orders doc_id assignment, so each partition holds a contiguous
        # doc_id range — parquet row-group stats stay tight for the
        # serving path's doc_id point reads) and incremental upserts
        # rewrite only the touched buckets via overwrite_partitions
        # (streaming/incremental.py) instead of the whole table.
        n_b = self.cfg.doc_id_buckets
        offsets = compute_bucket_offsets(pages, n_b)
        extracted = extract_docs(pages)
        # the id window already hash-partitions by the url bucket; keeping
        # its column (instead of recomputing + repartitioning) makes the
        # partitionBy write exchange-free — one task owns each bucket
        docs = attach_doc_ids(extracted, offsets, n_b,
                              keep_bucket_as="url_bucket")
        # sort_by keeps files doc_id-ascending (tight row-group stats for
        # the serving path's point reads); TableIO prepends the
        # url_bucket prefix the partitioned writer requires
        # (_sorted_for_write — the EliminateSorts discipline lives there)
        docs = docs.select("doc_id", "url", "site", "title", "text",
                           "url_bucket")
        return self.io.write_stage(
            docs, "docs", partition_by=["url_bucket"], sort_by=["doc_id"],
            extra={"doc_id_buckets": n_b, "url_bucket_partitioned": True},
        )

    def _stage_postings(self):
        docs = self.io.read("docs")
        cfg = self.cfg
        tokens = (tokens_from_docs_sql(docs) if cfg.tokenizer == "sql"
                  else tokens_from_docs(docs))
        postings = (
            tokens
            .withColumn("term_bucket", term_bucket_col(F.col("term"), cfg.term_buckets))
            # co-locate each term's postings; sort_by lays files out as
            # (term, doc_id)-ordered runs for the exchange-free block
            # encoder and parquet min/max skipping (TableIO prepends the
            # term_bucket prefix the partitioned writer requires)
            .repartition(cfg.term_buckets, "term_bucket")
        )
        return self.io.write_stage(
            postings, "postings", partition_by=["term_bucket"],
            sort_by=["term", "doc_id"],
            # file_sorted: every file of this table is internally ordered
            # by (term, doc_id) — the blocks stage reads it exchange-free
            # (encoder consumes file-ordered runs directly). Writers that
            # do not maintain the discipline must null the flag.
            extra={"term_buckets": cfg.term_buckets, "file_sorted": True},
        )

    def _stage_terms(self):
        from pyspark.sql import Observation

        postings = self.io.read("postings")
        # corpus totals (Σcf, Σdf) ride the terms WRITE job as observed
        # metrics — the stats stage then costs zero Spark jobs. Every job
        # the driver schedules is width-independent wall (~100 ms + plan
        # time each) that the north_rule's N→4N efficiency pays in full,
        # so the build piggybacks scalars on actions it already runs.
        obs = Observation("corpus_totals")
        terms = (
            postings.groupBy("term")
            # each (doc,term) appears once => count(*) == document frequency
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
            .observe(obs, F.sum("cf").alias("total_tokens"),
                     F.sum("df").alias("n_postings"),
                     # head terms (df above the salting threshold) ride the
                     # same write job, sparing _stage_blocks its own collect
                     # job; bounded — head terms are stopword-scale few.
                     # collect_list drops the nulls when() leaves on
                     # non-head rows.
                     F.collect_list(
                         F.when(F.col("df") > self.cfg.salt_df_threshold,
                                F.col("term"))).alias("head_terms"))
            .withColumn("term_bucket", term_bucket_col(F.col("term"), self.cfg.term_buckets))
            # co-locate each bucket in one task so the partitioned write
            # emits one file per bucket, not tasks×buckets small files
            .repartition(self.cfg.term_buckets, "term_bucket")
        )
        res = self.io.write_stage(terms, "terms", partition_by=["term_bucket"])
        # re-commit the manifest with the observed totals (atomic replace;
        # a crash in between leaves a valid manifest and _stage_stats
        # falls back to its own aggregation)
        got = obs.get
        res.extra.update({
            "total_tokens": int(got["total_tokens"] or 0),
            "n_postings": int(got["n_postings"] or 0),
            # sorted for manifest stability (collect_list order is
            # partition-dependent); consumers treat it as a set
            "head_terms": sorted(got["head_terms"] or []),
            "head_df_threshold": self.cfg.salt_df_threshold,
        })
        self.io.write_manifest(res)
        return res

    def _stage_stats(self):
        t0 = time.monotonic()
        # row counts already recorded in the stage manifests (parquet
        # footers) — no extra count job; corpus totals were observed on the
        # terms write job (zero extra jobs). Fallback for a resume from a
        # terms manifest predating the observed totals (or a crash between
        # the terms write and its manifest re-commit): one small agg over
        # the tiny terms table — never a re-scan of the postings fact table.
        n_docs = self.io.read_manifest("docs")["rows"]
        tex = (self.io.read_manifest("terms") or {}).get("extra", {})
        # totals are nulled (not removed) by incremental terms rewrites —
        # require present AND non-None before trusting them
        if tex.get("total_tokens") is not None \
                and tex.get("n_postings") is not None:
            total_tokens = int(tex["total_tokens"])
            n_postings = int(tex["n_postings"])
        else:
            terms = self.io.read("terms")
            agg = terms.agg(F.sum("cf").alias("total_tokens"),
                            F.sum("df").alias("n_postings")).collect()[0]
            total_tokens = int(agg["total_tokens"] or 0)
            n_postings = int(agg["n_postings"] or 0)
        stats = {
            "n_docs": n_docs,
            "n_postings": n_postings,
            "total_tokens": total_tokens,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        }
        self.io.write_meta("stats", stats)
        from ..sources.tableio import StageResult
        res = StageResult(stage="stats", status="complete", rows=n_docs, bytes=0,
                          wall_ms=int((time.monotonic() - t0) * 1000), extra=stats)
        self.io.write_manifest(res)
        return res

    def _site_stats_frame(self, docs: DataFrame, postings: DataFrame,
                          buckets: list[int] | None = None) -> DataFrame:
        """Rows of the precomputed per-site statistics table:
          (site, term_bucket=b,  pages=0, lemmas=<distinct terms of b>)
          (site, term_bucket=-1, pages=<page count>, lemmas=0)
        Distinct (site, term) pairs partition cleanly by term_bucket, so
        incremental updates rewrite only the affected buckets' rows (plus
        the -1 pages rows) — the same partition-overwrite discipline as
        postings/terms. buckets=None computes every bucket (full build).

        Plan shape: postings built by this code carry site_id =
        xxhash64(site) (an 8-byte int attached BEFORE the wide shuffle,
        functions/udfs.py — 64-bit collisions over even 10^8 sites are
        ~birthday 2^-16, and a collision only merges two sites' counts),
        so the lemma counts are ONE aggregation over a column-pruned
        (site_id, term) scan of postings — no postings-sized join, no
        docs scan, and the site STRING never rides any shuffle: names
        join back AFTER aggregation on the tiny (site_id, bucket) frame.

        Legacy fallback (postings written before site_id existed): the
        old postings⋈doc_sites join, hinted shuffle-hash (int keys, no
        sort-merge sort of the posting rows — measured 2.5× at 480k docs
        where AQE's broadcast cutoff tips the unhinted plan into SMJ)."""
        site_names = (docs.select("site").distinct()
                      .withColumn("site_id", F.xxhash64("site")))
        if buckets is not None:
            postings = postings.filter(F.col("term_bucket").isin(buckets))
        if "site_id" in postings.columns:
            lem_ids = (postings.select("site_id", "term_bucket", "term")
                       .groupBy("site_id", "term_bucket")
                       .agg(F.count_distinct("term").cast("long")
                            .alias("lemmas")))
        else:
            doc_sites = docs.select("doc_id",
                                    F.xxhash64("site").alias("site_id"))
            lem_ids = (postings.select("doc_id", "term_bucket", "term")
                       .join(doc_sites.hint("shuffle_hash"), "doc_id")
                       .groupBy("site_id", "term_bucket")
                       .agg(F.count_distinct("term").cast("long")
                            .alias("lemmas")))
        lem = (lem_ids.join(site_names, "site_id")
               .select("site", "term_bucket",
                       F.lit(0).cast("long").alias("pages"), "lemmas"))
        pg = (docs.groupBy("site")
              .agg(F.count("*").cast("long").alias("pages"))
              .select("site", F.lit(-1).cast("int").alias("term_bucket"),
                      "pages", F.lit(0).cast("long").alias("lemmas")))
        return lem.unionByName(pg)

    def _stage_site_stats(self):
        """A4/C5 precompute: per-site page + distinct-lemma counts, built
        once here so statistics() reads a tiny table instead of scanning
        postings per call. Default plan is join-free: postings carry
        site_id, so this is one column-pruned (site_id, term) aggregation
        (see _site_stats_frame; the postings⋈docs join survives only as
        the legacy fallback for pre-site_id tables)."""
        frame = (self._site_stats_frame(self.io.read("docs"),
                                        self.io.read("postings"))
                 .repartition(self.cfg.term_buckets + 1, "term_bucket"))
        return self.io.write_stage(frame, "site_stats",
                                   partition_by=["term_bucket"])

    def refresh_blocks(self):
        """Blocks-only maintenance rebuild: re-encode every posting block
        with the CURRENT corpus avgdl and head-term set. Incremental deltas
        mark the blocks manifest's avgdl stale (streaming/incremental.py
        sets avgdl=None) because untouched buckets' max_tfpart bakes the
        OLD avgdl — WAND then falls back to the looser avgdl-free max_tf
        bound. Before this op the only way to re-tighten was a full
        rebuild; this costs O(one postings scan), touches neither docs nor
        postings, re-shards terms whose df crossed the salting threshold
        since the last full build, and commits via the crash-safe
        partition-overwrite protocol (old blocks snapshot readable until
        the manifest swap — safe against a live serving reader, unlike
        write_stage's destructive overwrite).

        Refuses while a staged delta is pending: postings could be at
        either snapshot of an in-flight commit, and encoding them would
        bake that ambiguity into committed blocks."""
        from ..config import committer_v2
        from ..operators.postings import build_blocks, one_task_per_file
        from ..streaming.incremental import has_pending_delta

        if has_pending_delta(self.io):
            raise RuntimeError(
                "a staged delta is pending — resume_upsert() first, then "
                "refresh blocks")
        for dep in ("postings", "terms", "blocks"):
            if not self.io.stage_complete(dep):
                raise RuntimeError(
                    f"refresh_blocks needs a complete '{dep}' stage — "
                    "run/resume the build first")

        cfg = self.cfg
        self.write_status("INDEXING", stage="blocks_refresh")
        try:
            with committer_v2(self.spark):
                postings = self.io.read("postings")
                stats = self.io.read_meta("stats")
                avgdl = float(stats["avgdl"]) or 1.0
                head = [r["term"] for r in
                        self.io.read("terms")
                            .filter(F.col("df") > cfg.salt_df_threshold)
                            .select("term").collect()]
                pex = (self.io.read_manifest("postings") or {}) \
                    .get("extra", {})
                presorted = bool(pex.get("file_sorted"))
                blocks = build_blocks(postings, head, avgdl, cfg,
                                      presorted=presorted)
                blocks = blocks.withColumn(
                    "term_bucket",
                    term_bucket_col(F.col("term"), cfg.term_buckets))
                if not presorted:
                    blocks = blocks.repartition(cfg.term_buckets,
                                                "term_bucket")
                with one_task_per_file(self.spark, presorted):
                    res = self.io.overwrite_partitions(
                        blocks, "blocks", "term_bucket",
                        list(range(cfg.term_buckets)),
                        sort_by=["term", "shard", "doc_min"],
                        extra_update={
                            "head_terms": head,
                            "block_size": cfg.block_size,
                            "salt_shard_docs": cfg.salt_shard_docs,
                            "avgdl": avgdl,
                        })
        except BaseException as exc:
            msg = f"{type(exc).__name__}: {exc}".splitlines()[0][:300]
            try:
                self.write_status("FAILED", stage="blocks_refresh",
                                  error=msg)
            except Exception:
                pass
            raise
        self.write_status("INDEXED")
        return res

    def _stage_blocks(self):
        """Compressed posting blocks (operators/postings.py): delta+varint,
        block-max metadata, range-sharded head terms. Runs after stats so
        avgdl is available for the idf-independent block-max factor."""
        from ..operators.postings import build_blocks, one_task_per_file

        cfg = self.cfg
        postings = self.io.read("postings")
        stats = self.io.read_meta("stats")
        # head terms (df above salting threshold) are few even at web scale —
        # a bounded driver-side list, observed on the terms write job when
        # this build produced it. Fallback (resume from a pre-observation
        # terms manifest, or a threshold change between build and resume):
        # one small collect over the tiny terms table.
        tex = (self.io.read_manifest("terms") or {}).get("extra", {})
        if tex.get("head_terms") is not None \
                and tex.get("head_df_threshold") == cfg.salt_df_threshold:
            head = list(tex["head_terms"])
        else:
            head = [r["term"] for r in
                    self.io.read("terms")
                        .filter(F.col("df") > cfg.salt_df_threshold)
                        .select("term").collect()]
        # exchange-free path: postings files are already (term, doc_id)-
        # ordered (file_sorted flag, _stage_postings) and shard is
        # monotonic in doc_id within a term, so the encoder can consume
        # the scan directly — the build's THIRD postings-sized shuffle
        # (repartition by (term, shard)) disappears; only the tiny
        # encoded-blocks frame is ever sorted. Scale notes: a bucket file
        # larger than maxPartitionBytes splits across tasks mid-run —
        # blocks stay disjoint/valid (each split encodes its rows as
        # fresh runs), you just get one short block per split, so raise
        # term_buckets with corpus size. Legacy tables without the flag
        # keep the repartition path.
        pex = (self.io.read_manifest("postings") or {}).get("extra", {})
        presorted = bool(pex.get("file_sorted"))
        blocks = build_blocks(postings, head, float(stats["avgdl"]) or 1.0,
                              cfg, presorted=presorted)
        blocks = blocks.withColumn(
            "term_bucket", term_bucket_col(F.col("term"), cfg.term_buckets))
        if not presorted:
            blocks = blocks.repartition(cfg.term_buckets, "term_bucket")

        # presorted: encode parallelism = scan task count, and the default
        # file packing would bin all the small bucket files into a few
        # tasks — one_task_per_file scopes a large open cost around the
        # write action so each bucket file is its own encode task (the
        # same parallelism the repartition path had).
        with one_task_per_file(self.spark, presorted):
            return self.io.write_stage(
                blocks, "blocks", partition_by=["term_bucket"],
                sort_by=["term", "shard", "doc_min"],
                # avgdl is recorded because max_tfpart bakes it in: WAND's
                # block-max bounds are only tight while the corpus avgdl
                # equals this value — incremental deltas mark it stale
                # (avgdl=None) and WAND falls back to the avgdl-free
                # max_tf bound
                extra={"head_terms": head, "block_size": cfg.block_size,
                       "salt_shard_docs": cfg.salt_shard_docs,
                       "avgdl": float(stats["avgdl"]) or 1.0},
            )
