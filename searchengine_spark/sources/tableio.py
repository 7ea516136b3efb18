"""Table IO seam + build manifest (checkpoint/resume + per-partition lineage).

The target deployment writes Iceberg tables (`df.writeTo(...).append()`,
snapshot per stage). This sandbox has no Iceberg runtime jar, so the seam
writes plain parquet directories and emulates the snapshot/manifest layer
with JSON files — the build plan only talks to this module, so swapping in
Iceberg is a one-file change.

Manifest model (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"): one JSON per completed stage under <work>/_manifest/:

    {stage, status, rows, bytes, wall_ms, files: [{path, rows, bytes}, ...],
     extra: {...}}

`files` is the per-partition lineage — one entry per parquet part file,
row counts read from parquet footers (no extra Spark job). A stage is
resumable iff its manifest says status=complete and the data dir exists;
the reference's analog is the site status row lifecycle
(services/IndexingServiceImpl.java:80-108,165-171).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


@dataclass
class StageResult:
    stage: str
    status: str
    rows: int
    bytes: int
    wall_ms: int
    files: list[dict] = field(default_factory=list)
    extra: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "stage": self.stage, "status": self.status, "rows": self.rows,
            "bytes": self.bytes, "wall_ms": self.wall_ms, "files": self.files,
            "extra": self.extra,
        }


class TableIO:
    """Parquet-dir tables + JSON stage manifests under one work dir."""

    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work_dir = work_dir
        self.manifest_dir = os.path.join(work_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # --- paths ---------------------------------------------------------

    def path(self, table: str) -> str:
        return os.path.join(self.work_dir, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs
        )

    # --- manifest ------------------------------------------------------

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.manifest_dir, f"{stage}.json")

    def stage_complete(self, stage: str) -> bool:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return json.load(f).get("status") == "complete"

    def read_manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def write_manifest(self, result: StageResult) -> None:
        """Atomic: the manifest IS the commit point (snapshot swap), so it
        must never be observable half-written."""
        p = self._manifest_path(result.stage)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result.to_json(), f, ensure_ascii=False, indent=1)
        os.replace(tmp, p)

    def invalidate_from(self, stages: list[str], first_dirty: str) -> None:
        """Drop manifests (and data) for first_dirty and everything after."""
        if first_dirty not in stages:
            return
        for s in stages[stages.index(first_dirty):]:
            m = self._manifest_path(s)
            if os.path.exists(m):
                os.remove(m)
            d = self.path(s)
            if os.path.isdir(d):
                shutil.rmtree(d)

    # --- write/read ----------------------------------------------------

    @staticmethod
    def _sorted_for_write(df: DataFrame, partition_by: list[str] | None,
                          sort_by: list[str] | None) -> DataFrame:
        """Apply the partitioned-write sort DISCIPLINE in one place: the
        task ordering must LEAD with the partition columns, or the
        partitionBy writer inserts its own partition-column sort and
        Catalyst's EliminateSorts deletes the caller's — files silently
        land in raw generation order (caught live once; pinned by pyarrow
        per-file tests). Callers pass only the DATA ordering they want
        inside each partition (sort_by); the partition-column prefix is
        prepended here so no write site can forget it."""
        if not sort_by:
            return df
        keys = [*(partition_by or []), *sort_by]
        return df.sortWithinPartitions(*keys)

    def write_stage(self, df: DataFrame, stage: str, table: str | None = None,
                    partition_by: list[str] | None = None,
                    extra: dict | None = None,
                    sort_by: list[str] | None = None) -> StageResult:
        """Write df as the stage output + manifest with per-file lineage.
        sort_by: desired within-file data ordering — the partition-column
        prefix the writer requires is prepended automatically
        (_sorted_for_write)."""
        table = table or stage
        target = self.path(table)
        t0 = time.monotonic()
        df = self._sorted_for_write(df, partition_by, sort_by)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        wall_ms = int((time.monotonic() - t0) * 1000)

        paths = []
        for root, _, fs in os.walk(target):
            for fn in sorted(fs):
                if fn.endswith(".parquet"):
                    paths.append(os.path.join(root, fn))
        # footer reads are I/O-bound and independent — a thread pool keeps
        # this driver-side lineage pass off the build's critical path
        # (serial walks were a fixed per-stage cost that parallelism can't
        # amortize, directly taxing measured scaling efficiency)
        from concurrent.futures import ThreadPoolExecutor

        def _stat(fp):
            return fp, pq.read_metadata(fp).num_rows, os.path.getsize(fp)

        with ThreadPoolExecutor(max_workers=16) as ex:
            stats = list(ex.map(_stat, paths))
        files, rows, nbytes = [], 0, 0
        for fp, nrows, sz in stats:
            files.append({
                "path": os.path.relpath(fp, self.work_dir),
                "rows": nrows, "bytes": sz,
            })
            rows += nrows
            nbytes += sz
        result = StageResult(stage=stage, status="complete", rows=rows,
                             bytes=nbytes, wall_ms=wall_ms, files=files,
                             extra=extra or {})
        self.write_manifest(result)
        return result

    def read(self, table: str) -> DataFrame:
        """Manifest-pinned read (snapshot isolation, Iceberg-style): when a
        stage manifest exists, read exactly ITS file list — not whatever
        the directory currently holds — so an interrupted partition
        overwrite (which adds new-generation files before the manifest
        swap) can never surface duplicate or partial data to the Spark
        paths. basePath keeps hive partition columns + pruning.

        Strictness: a COMPLETE manifest whose listed files are missing on
        disk is corruption (someone deleted committed data) — raise rather
        than silently serving a partial snapshot. A non-complete (aborted)
        manifest likewise raises: readers must resume/rebuild the stage,
        never consume a half-written table. Only a manifest-less directory
        (fresh build in progress, pre-manifest layout) gets the raw read."""
        base = self.path(table)
        m = self.read_manifest(table)
        if m is None:
            return self.spark.read.parquet(base)
        if m.get("status") != "complete":
            raise RuntimeError(
                f"table '{table}' manifest status is "
                f"{m.get('status')!r} — stage aborted/incomplete; resume "
                "the build instead of reading it")
        files = [os.path.join(self.work_dir, f["path"])
                 for f in m.get("files", [])]
        missing = [p for p in files if not os.path.exists(p)]
        if missing:
            raise RuntimeError(
                f"table '{table}' manifest references {len(missing)} "
                f"missing file(s) (first: {missing[0]}) — committed data "
                "was deleted out-of-band; rebuild the stage")
        if not files:
            return self.spark.read.parquet(base)
        return self.spark.read.option("basePath", base).parquet(*files)

    # --- commit lock ----------------------------------------------------
    #
    # Writers are SINGLE-WRITER by contract (one build/upsert/vacuum at a
    # time per work_dir — the Iceberg analog is optimistic-concurrency
    # commit conflict detection, which this parquet emulation does not
    # implement). The lock below guards the one race that would corrupt
    # data even under honest single-writer use: vacuum() running while an
    # overwrite_partitions commit is mid-flight (its fresh gen-* files are
    # on disk but not yet in the manifest, so an unguarded vacuum would
    # delete them and the subsequent manifest swap would commit references
    # to deleted files).

    def _acquire_commit_lock(self, blocking: bool) -> bool:
        lock = os.path.join(self.work_dir, "_commit.lock")
        # deadline must exceed the stale-age threshold, else a recent hard
        # crash would spin the full deadline and fail instead of taking
        # the dead writer's lock over
        deadline = time.monotonic() + 1200.0
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return True
            except FileExistsError:
                if self._takeover_dead_lock(lock):
                    continue
                if not blocking:
                    return False
                if time.monotonic() > deadline:
                    raise TimeoutError(f"commit lock held too long: {lock}")
                time.sleep(0.05)

    @staticmethod
    def _takeover_dead_lock(lock: str) -> bool:
        """Remove the lock iff its holder is provably gone (the recorded
        PID is not alive — same-host writers, the single-writer contract).
        The age fallback applies ONLY when liveness is inconclusive
        (non-numeric PID, e.g. a cross-host writer): a holder that
        os.kill(pid, 0) confirms alive is NEVER reaped, however old the
        file — long commit sections touch the lock mtime periodically
        (_touch_commit_lock) so inconclusive holders stay fresh too.

        Reap = rename-to-unique THEN unlink: rename is atomic, so of two
        waiters that both saw the dead lock only one's rename succeeds —
        the loser can no longer unlink a fresh lock the winner just
        created at the original path. The (dev, ino) re-stat before the
        rename keeps the remaining TOCTOU at syscall width (and a false
        reap additionally requires PID reuse)."""
        import uuid

        try:
            st = os.stat(lock)
            with open(lock) as f:
                pid_txt = f.read().strip()
        except OSError:
            return True  # holder released; caller retries the create
        dead = False
        if pid_txt.isdigit():
            try:
                os.kill(int(pid_txt), 0)
                return False  # provably ALIVE: age never overrides
            except ProcessLookupError:
                dead = True
            except PermissionError:
                return False  # alive under another uid
            except OSError:
                pass  # inconclusive — fall through to the age check
        if not dead and time.time() - st.st_mtime <= 900:
            return False
        try:
            st2 = os.stat(lock)
            if (st2.st_dev, st2.st_ino) != (st.st_dev, st.st_ino):
                return False  # replaced by a live writer meanwhile
            tomb = f"{lock}.reap-{uuid.uuid4().hex[:12]}"
            os.rename(lock, tomb)
            os.remove(tomb)
        except OSError:
            pass
        return True

    def _touch_commit_lock(self) -> None:
        """Heartbeat for long-held commit sections: refresh the lock mtime
        so the age fallback (which only fires for liveness-inconclusive
        holders) never reaps a live writer mid-commit."""
        try:
            os.utime(os.path.join(self.work_dir, "_commit.lock"))
        except OSError:
            pass

    def _release_commit_lock(self) -> None:
        try:
            os.remove(os.path.join(self.work_dir, "_commit.lock"))
        except FileNotFoundError:
            pass

    def vacuum(self, table: str, required: bool = False) -> int:
        """Delete data files not referenced by the table's manifest —
        debris from an interrupted partition overwrite. Returns the number
        of files removed. Takes the commit lock: if a LIVE commit is in
        flight its uncommitted gen-* files must survive, so the default
        non-blocking acquire skips and the committer vacuums after its
        manifest swap. A dead holder's lock is taken over immediately
        (PID-liveness check), so a hard crash never blocks cleanup.
        required=True (the serving path, where directory reads MUST equal
        the snapshot) blocks until the lock is available instead of
        skipping."""
        if not self._acquire_commit_lock(blocking=required):
            return 0
        try:
            return self._vacuum_locked(table)
        finally:
            self._release_commit_lock()

    def _vacuum_locked(self, table: str) -> int:
        m = self.read_manifest(table)
        if m is None:
            return 0
        live = {os.path.join(self.work_dir, f["path"]) for f in m["files"]}
        removed = 0
        base = self.path(table)
        for root, _, fs in os.walk(base):
            for fn in fs:
                fp = os.path.join(root, fn)
                if fn.endswith(".parquet") and fp not in live:
                    os.remove(fp)
                    removed += 1
        return removed

    def replace_table(self, df: DataFrame, stage: str,
                      table: str | None = None,
                      extra: dict | None = None) -> StageResult:
        """Atomic FULL-table overwrite — the unpartitioned analog of
        overwrite_partitions: write the replacement to a side directory
        (safe for a df whose lineage reads the target table), move the
        files into the live directory under generation-unique names (old
        files untouched), atomically swap the manifest to list only the
        new files, vacuum the superseded ones. A crash at any step leaves
        the old snapshot fully readable — unlike write_stage, whose
        Spark-side mode("overwrite") deletes the live directory first."""
        import uuid

        table = table or stage
        target = self.path(table)
        tmp = os.path.join(self.work_dir, f"_tmp_{table}")
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(tmp)
        self._acquire_commit_lock(blocking=True)
        try:
            self._vacuum_locked(table)
            gen = uuid.uuid4().hex[:12]
            os.makedirs(target, exist_ok=True)
            fresh = []
            for root, _, fs in os.walk(tmp):
                self._touch_commit_lock()  # heartbeat: long moves stay fresh
                for fn in sorted(fs):
                    if not fn.endswith(".parquet"):
                        continue
                    fp = os.path.join(root, fn)
                    out = os.path.join(target, f"gen-{gen}-{fn}")
                    meta = pq.read_metadata(fp)
                    shutil.move(fp, out)
                    fresh.append({
                        "path": os.path.relpath(out, self.work_dir),
                        "rows": meta.num_rows,
                        "bytes": os.path.getsize(out),
                    })
            shutil.rmtree(tmp, ignore_errors=True)
            result = StageResult(
                stage=stage, status="complete",
                rows=sum(f["rows"] for f in fresh),
                bytes=sum(f["bytes"] for f in fresh),
                wall_ms=int((time.monotonic() - t0) * 1000),
                files=fresh, extra=extra or {})
            self.write_manifest(result)  # atomic commit point
            self._vacuum_locked(table)
            return result
        finally:
            self._release_commit_lock()

    def overwrite_partitions(self, df: DataFrame, stage: str,
                             partition_col: str, values: list,
                             table: str | None = None,
                             extra_update: dict | None = None,
                             sort_by: list[str] | None = None) -> StageResult:
        """Rewrite ONLY the listed partition directories of a partitioned
        stage table and merge the stage manifest's per-file lineage — the
        parquet-dir emulation of Iceberg dynamic partition overwrite
        (spark.sql.sources.partitionOverwriteMode=dynamic / MERGE on
        touched partitions). df must contain exactly the replacement rows
        for those partitions (a partition with no rows is dropped).

        Crash-safe commit protocol (snapshot emulation):
          1. vacuum debris from any earlier interrupted commit;
          2. write the replacement data to a side directory (a df whose
             lineage reads the target table is therefore safe);
          3. move the new files INTO the partition dirs under
             generation-unique names — old files are NOT touched;
          4. atomically swap the manifest (the commit point): Spark reads
             are manifest-pinned (see read()), so before the swap they see
             exactly the old snapshot, after it exactly the new;
          5. vacuum the superseded files.
        A crash at any step leaves a readable old snapshot plus orphan
        files the next commit's vacuum removes. (The pyarrow serving path
        reads directories, not manifests — run vacuum before serving after
        a crash; real Iceberg closes this gap with metadata-file reads.)"""
        import uuid

        table = table or stage
        target = self.path(table)
        tmp = os.path.join(self.work_dir, f"_tmp_{table}")
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.monotonic()
        # the Spark write (step 2, side dir) runs outside the lock — it
        # touches no live files; the lock covers vacuum + move + swap
        df = self._sorted_for_write(df, [partition_col], sort_by)
        df.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
        self._acquire_commit_lock(blocking=True)
        try:
            return self._commit_partitions(
                df, stage, partition_col, values, table, extra_update,
                tmp, target, t0)
        finally:
            self._release_commit_lock()

    def _commit_partitions(self, df, stage, partition_col, values, table,
                           extra_update, tmp, target, t0) -> StageResult:
        import uuid

        self._vacuum_locked(table)
        gen = uuid.uuid4().hex[:12]
        replaced = [f"{partition_col}={v}" for v in values]
        fresh = []
        for sub in replaced:
            self._touch_commit_lock()  # heartbeat: long moves stay fresh
            src = os.path.join(tmp, sub)
            if not os.path.isdir(src):
                continue  # partition emptied by this commit
            dst = os.path.join(target, sub)
            os.makedirs(dst, exist_ok=True)
            for root, _, fs in os.walk(src):
                for fn in sorted(fs):
                    if not fn.endswith(".parquet"):
                        continue
                    fp = os.path.join(root, fn)
                    out = os.path.join(dst, f"gen-{gen}-{fn}")
                    meta = pq.read_metadata(fp)
                    shutil.move(fp, out)
                    fresh.append({
                        "path": os.path.relpath(out, self.work_dir),
                        "rows": meta.num_rows,
                        "bytes": os.path.getsize(out),
                    })
        shutil.rmtree(tmp, ignore_errors=True)
        wall_ms = int((time.monotonic() - t0) * 1000)

        old = self.read_manifest(stage) or {
            "stage": stage, "files": [], "extra": {}, "wall_ms": 0}
        prefixes = tuple(os.path.join(table, sub) + os.sep for sub in replaced)
        keep = [f for f in old.get("files", [])
                if not f["path"].startswith(prefixes)]
        files = keep + fresh
        extra = {**old.get("extra", {}), **(extra_update or {})}
        result = StageResult(
            stage=stage, status="complete",
            rows=sum(f["rows"] for f in files),
            bytes=sum(f["bytes"] for f in files),
            wall_ms=old.get("wall_ms", 0) + wall_ms,
            files=files, extra=extra)
        self.write_manifest(result)  # atomic commit point
        self._vacuum_locked(table)
        return result

    # --- scalar metadata (corpus stats etc.) ----------------------------

    def write_meta(self, name: str, payload: dict) -> None:
        with open(os.path.join(self.work_dir, f"{name}.json"), "w") as f:
            json.dump(payload, f, ensure_ascii=False, indent=1)

    def read_meta(self, name: str) -> dict:
        with open(os.path.join(self.work_dir, f"{name}.json")) as f:
            return json.load(f)


def resolve_layout(io: TableIO, cfg):
    """Return cfg overridden with the layout parameters the index was
    actually BUILT with, read from the stage manifests (postings: term
    bucket count; blocks: head-term shard width and block size).

    Every query path must derive partition-prune buckets from the on-disk
    layout, not from live config: an index built with term_buckets=16 read
    under cfg term_buckets=64 would hash every term to the wrong partition
    and silently return no rows. Config is only the fallback when no
    manifest exists (fresh build)."""
    import dataclasses

    over = {}
    dm = io.read_manifest("docs")
    if dm and "doc_id_buckets" in dm.get("extra", {}):
        over["doc_id_buckets"] = int(dm["extra"]["doc_id_buckets"])
    pm = io.read_manifest("postings")
    if pm and "term_buckets" in pm.get("extra", {}):
        over["term_buckets"] = int(pm["extra"]["term_buckets"])
    bm = io.read_manifest("blocks")
    if bm:
        extra = bm.get("extra", {})
        if "salt_shard_docs" in extra:
            over["salt_shard_docs"] = int(extra["salt_shard_docs"])
        if "block_size" in extra:
            over["block_size"] = int(extra["block_size"])
    return dataclasses.replace(cfg, **over) if over else cfg
