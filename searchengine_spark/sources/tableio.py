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
        with open(self._manifest_path(result.stage), "w") as f:
            json.dump(result.to_json(), f, ensure_ascii=False, indent=1)

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

    def write_stage(self, df: DataFrame, stage: str, table: str | None = None,
                    partition_by: list[str] | None = None,
                    extra: dict | None = None) -> StageResult:
        """Write df as the stage output + manifest with per-file lineage."""
        table = table or stage
        target = self.path(table)
        t0 = time.monotonic()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        wall_ms = int((time.monotonic() - t0) * 1000)

        files, rows, nbytes = [], 0, 0
        for root, _, fs in os.walk(target):
            for fn in sorted(fs):
                if not fn.endswith(".parquet"):
                    continue
                fp = os.path.join(root, fn)
                meta = pq.read_metadata(fp)
                sz = os.path.getsize(fp)
                files.append({
                    "path": os.path.relpath(fp, self.work_dir),
                    "rows": meta.num_rows, "bytes": sz,
                })
                rows += meta.num_rows
                nbytes += sz
        result = StageResult(stage=stage, status="complete", rows=rows,
                             bytes=nbytes, wall_ms=wall_ms, files=files,
                             extra=extra or {})
        self.write_manifest(result)
        return result

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def overwrite_partitions(self, df: DataFrame, stage: str,
                             partition_col: str, values: list,
                             table: str | None = None,
                             extra_update: dict | None = None) -> StageResult:
        """Rewrite ONLY the listed partition directories of a partitioned
        stage table and merge the stage manifest's per-file lineage — the
        parquet-dir emulation of Iceberg dynamic partition overwrite
        (spark.sql.sources.partitionOverwriteMode=dynamic / MERGE on
        touched partitions). df must contain exactly the replacement rows
        for those partitions (a partition with no rows is dropped).

        The new data is fully written to a side directory BEFORE any
        target directory is touched, so a df whose lineage reads the
        target table is safe, and a crash mid-swap loses at most already-
        replaceable partition dirs (the manifest is rewritten last)."""
        table = table or stage
        target = self.path(table)
        tmp = os.path.join(self.work_dir, f"_tmp_{table}")
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.monotonic()
        df.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
        replaced = [f"{partition_col}={v}" for v in values]
        for sub in replaced:
            dst = os.path.join(target, sub)
            src = os.path.join(tmp, sub)
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                shutil.move(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        wall_ms = int((time.monotonic() - t0) * 1000)

        old = self.read_manifest(stage) or {
            "stage": stage, "files": [], "extra": {}, "wall_ms": 0}
        prefixes = tuple(os.path.join(table, sub) + os.sep for sub in replaced)
        keep = [f for f in old.get("files", [])
                if not f["path"].startswith(prefixes)]
        fresh = []
        for sub in replaced:
            d = os.path.join(target, sub)
            if not os.path.isdir(d):
                continue
            for root, _, fs in os.walk(d):
                for fn in sorted(fs):
                    if not fn.endswith(".parquet"):
                        continue
                    fp = os.path.join(root, fn)
                    meta = pq.read_metadata(fp)
                    fresh.append({
                        "path": os.path.relpath(fp, self.work_dir),
                        "rows": meta.num_rows,
                        "bytes": os.path.getsize(fp),
                    })
        files = keep + fresh
        extra = {**old.get("extra", {}), **(extra_update or {})}
        result = StageResult(
            stage=stage, status="complete",
            rows=sum(f["rows"] for f in files),
            bytes=sum(f["bytes"] for f in files),
            wall_ms=old.get("wall_ms", 0) + wall_ms,
            files=files, extra=extra)
        self.write_manifest(result)
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
