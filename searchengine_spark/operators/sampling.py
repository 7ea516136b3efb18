"""Deterministic splits and samples for training-data pipelines.

A reproducible train/val/test split and a stratified sample are the last
operators a corpus passes through before training. Both here are
ROW-LOCAL, zero-shuffle, and engine-portable: the assignment hash is
md5(id ':' salt) reduced to a 60-bit integer (the same conv-on-hex-prefix
reduction the MinHash family uses, reproducible verbatim in DuckDB), and
split boundaries are EXACT integer thresholds floor(cum_weight · 2^60)
precomputed driver-side — no float arithmetic crosses the engine
boundary, so Spark and any SQL oracle agree bit-for-bit on every row.

Scale notes: assignment is a per-row projection (no shuffle, no sort, no
sampling pass); determinism means re-runs, resumed builds, and
downstream joins all see the same membership without persisting an
assignment table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 1 << 60  # md5-prefix reduction range (15 hex chars)


def _hash60(col, salt: str):
    """60-bit uniform hash of a column value: conv(md5(value ':' salt)
    first 15 hex chars, 16, 10). Identical in DuckDB:
    CAST('0x' || substr(md5(v || ':' || salt), 1, 15) AS BIGINT)."""
    key = F.concat(col.cast("string"), F.lit(":" + salt))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """[(name, upper_bound_exclusive)] with EXACT integer bounds
    floor(cumulative_weight · 2^60); the last bound is forced to 2^60 so
    rounding never drops a row. Deterministic given dict order."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    out, cum = [], 0.0
    names = list(weights)
    for name in names:
        cum += weights[name] / total
        out.append((name, int(cum * HASH_SPACE)))
    out[-1] = (names[-1], HASH_SPACE)
    return out


def hash_split(df: DataFrame, weights: dict[str, float] | None = None,
               salt: str = "split", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, split) — deterministic, reproducible train/val/test
    assignment by hashed id. Default 90/5/5."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    h = _hash60(F.col(id_col), salt)
    expr = None
    for name, bound in split_thresholds(weights):
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return df.select(F.col(id_col).alias("doc_id"), expr.alias("split"))


def stratified_sample(df: DataFrame, fracs: dict[str, float],
                      stratum_col: str, salt: str = "sample",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id) — deterministic per-stratum sample: keep a row iff
    hash60(id) < floor(frac[stratum] · 2^60). Unlike df.sample this is
    stable across runs, partitionings, and engines; unlike sampleBy it
    needs no RNG seed plumbing and is reproducible row-for-row in SQL.
    Strata missing from fracs are dropped (frac 0)."""
    h = _hash60(F.col(id_col), salt)
    expr = None
    for stratum, frac in fracs.items():
        bound = int(min(max(frac, 0.0), 1.0) * HASH_SPACE)
        cond = (F.col(stratum_col) == F.lit(stratum)) & (h < F.lit(bound))
        expr = cond if expr is None else expr | cond
    if expr is None:
        raise ValueError("fracs must name at least one stratum")
    return df.filter(expr).select(F.col(id_col).alias("doc_id"))
