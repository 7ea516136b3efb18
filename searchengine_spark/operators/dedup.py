"""Deduplication operators for webtext corpora — exact, n-gram Jaccard,
MinHash-LSH, SimHash (see textstats.simhash16).

All pure DataFrame ops. Scale notes:
- exact dedup: one groupBy on the content hash — the hash (16 bytes) is the
  shuffle key, never the text
- shingle self-joins: the join key is the shingle string; at 100 TB replace
  with (a) md5(shingle) keys (fixed width) and (b) a frequency cap dropping
  ubiquitous shingles before the self-join (they generate quadratic pairs
  and carry no dedup signal) — `max_shingle_df` below
- MinHash: k independent hash functions simulated as md5(j || ':' || term);
  banding = per-hash bucket join (band size 1), candidate pairs verified by
  true Jaccard downstream if `verify` is set
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import fingerprints, tokens


def exact_dup_summary(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """One row: n_docs, n_unique, n_dup_docs (exact content hash)."""
    fp = fingerprints(df, text_col, id_col)
    return fp.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("fp").cast("long").alias("n_unique"),
        (F.count("*") - F.count_distinct("fp")).cast("long").alias("n_dup_docs"),
    )


def exact_keep_first(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Retained doc ids: min doc_id per distinct content hash."""
    fp = fingerprints(df, text_col, id_col)
    return fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")


def shingles(df: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sh) — distinct word n-gram shingles per document."""
    toks = F.split(F.col(text_col), " ")
    idxs = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)) \
            .otherwise(F.array().cast("array<int>"))
    tri = F.transform(
        idxs,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return (df.select(F.col(id_col).alias("doc_id"), F.explode(tri).alias("sh"))
              .filter(F.col("sh") != "")
              .distinct())


def jaccard_pairs(sh: DataFrame, threshold: float = 0.5,
                  max_shingle_df: int | None = None) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-set Jaccard ≥ threshold.

    Self-join on shingle -> common counts -> |A∪B| = |A|+|B|-common.
    max_shingle_df drops shingles shared by more than that many docs before
    the join (quadratic-pair guard for head shingles at scale).
    """
    if max_shingle_df is not None:
        hot = (sh.groupBy("sh").agg(F.count("*").alias("sdf"))
                 .filter(F.col("sdf") > max_shingle_df).select("sh"))
        sh = sh.join(hot, "sh", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (a.join(b, "sh")
               .filter(F.col("doc_a") < F.col("doc_b"))
               .groupBy("doc_a", "doc_b")
               .agg(F.count("*").alias("common")))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (common.join(na, "doc_a").join(nb, "doc_b")
            .withColumn("jaccard",
                        F.round(F.col("common")
                                / (F.col("na") + F.col("nb") - F.col("common")), 6))
            .filter(F.col("jaccard") >= F.lit(threshold))
            .select("doc_a", "doc_b", "jaccard"))


def minhash_signatures(df: DataFrame, k: int = 4, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, hash_id, minhash) — k MinHashes over the token set.
    Hash family: md5(j || ':' || term), minimum taken as string order —
    deterministic and reproducible in ANSI SQL for the oracle."""
    t = tokens(df, text_col, id_col).select("doc_id", "term").distinct()
    # all k minhashes in ONE aggregation pass (k agg columns), then an
    # unpivot — tokenize/distinct/shuffle happen once, not k times
    aggs = [F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("term")))).alias(f"h{j}")
            for j in range(k)]
    wide = t.groupBy("doc_id").agg(*aggs)
    stack = ", ".join(f"{j}, h{j}" for j in range(k))
    return wide.selectExpr(
        "doc_id", f"stack({k}, {stack}) as (hash_id, minhash)")


def minhash_candidate_pairs(df: DataFrame, k: int = 4, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """LSH candidate pairs: docs sharing any of the k minhash band values."""
    sigs = minhash_signatures(df, k, text_col, id_col)
    a = sigs.select(F.col("doc_id").alias("doc_a"), "hash_id", "minhash")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "hash_id", "minhash")
    return (a.join(b, ["hash_id", "minhash"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct())
