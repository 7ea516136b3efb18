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


def cap_per_stratum(df: DataFrame, cap: int, stratum_col: str = "site",
                    id_col: str = "doc_id",
                    order_salt: str | None = None) -> DataFrame:
    """(doc_id, <stratum_col>, rank) — at most `cap` documents per
    stratum, the per-domain cap every Common-Crawl-style curation
    pipeline applies (unbounded crawls of one domain otherwise dominate
    the corpus). Selection is fully deterministic: rank by doc_id asc
    within the stratum (the keep-first discipline the dedup family
    uses), or — with order_salt — by the engine-portable 60-bit hash of
    the id, which makes the cap a uniform RANDOM-but-reproducible sample
    of the stratum rather than its oldest documents.

    Scale shape: one row_number window per stratum. Strata are domains —
    millions of them, each modest — so the window's hash partitioning
    spreads evenly (the anti-case, one giant stratum, is exactly what
    the cap exists to cut, and the window sorts only within each
    stratum's partition-local run). Text is never read: the projection
    prunes to (id, stratum) before the exchange."""
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    order = (_hash60(F.col(id_col), order_salt).asc()
             if order_salt is not None else F.col(id_col).asc())
    w = (Window.partitionBy(stratum_col)
         .orderBy(order, F.col(id_col).asc()))
    return (df.select(F.col(id_col).alias("doc_id"), F.col(stratum_col))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= F.lit(cap)))


def pack_greedy(df: DataFrame, max_tokens: int, text_col: str = "text",
                id_col: str = "doc_id",
                shard_col=None) -> DataFrame:
    """(doc_id, shard, n_tokens, pack_id, pack_offset) — GPT-style sequence
    packing: documents are concatenated in deterministic (shard, doc_id)
    order and the token stream is cut every `max_tokens`; pack_id /
    pack_offset locate each document's FIRST token (documents may
    straddle pack boundaries — the standard concat-and-cut pretraining
    layout, which wastes zero tokens to padding). First-fit bin packing
    (no straddling) is inherently sequential per bin; this cumulative
    form is the one that stays a pure window computation and is the
    layout trainers actually consume.

    shard_col partitions the stream (e.g. a url_bucket or split name) so
    each shard packs independently — at 100 TB the window never sees
    more than one shard's rows, and shards are the write partitioning.
    pack_id is PER-SHARD; the returned `shard` column (the shard_col
    value, or 0 for the default single stream) makes (shard, pack_id)
    the global pack key with no join-back.
    Default is a single global stream (fine while one shard fits a
    sort; pass a shard at scale). NULL text counts 0 tokens and rides
    along (offset-preserving, like empty docs in a real stream).

    One exchange + in-partition sort on (shard, doc_id); only
    (doc_id, n_tokens) ever shuffles — the text column is pruned before
    the exchange (same discipline as quality_percentile_filter)."""
    from pyspark.sql import Window

    from .textstats import ws_token_count

    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if shard_col is None:
        shard = F.lit(0)
    elif isinstance(shard_col, str):
        shard = F.col(shard_col)
    else:
        shard = shard_col
    sig = df.select(F.col(id_col).alias("doc_id"),
                    shard.alias("shard"),
                    ws_token_count(F.col(text_col)).alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(F.col("doc_id").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (sig.withColumn("_cum", cum)
            .select("doc_id", "shard", "n_tokens",
                    (F.col("_cum") / F.lit(max_tokens)).cast("long")
                    .alias("pack_id"),
                    (F.col("_cum") % F.lit(max_tokens)).alias("pack_offset")))
