"""Generic text-analysis operators over a (doc_id, text) corpus.

These are the training-data-pipeline operators (language-ID heuristic,
quality scoring, token counting, fingerprinting) applied to whitespace
corpora such as the driver's `documents` table. Everything is pure Catalyst
column expressions — JVM-side, whole-stage-codegen, zero Python in the hot
path. The Russian reference pipeline (functions/text_core.py) is separate:
it must match the reference byte-for-byte; these are scale utilities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small deterministic English stopword list for ratio features
EN_STOPWORDS = ["the", "a", "an", "of", "to", "in", "and", "is", "on", "for"]


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, term) — whitespace tokenization, empties dropped."""
    return (df
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"))
            .filter(F.col("term") != ""))


def term_frequencies(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) — the per-document hash aggregate (A1)."""
    return (tokens(df, text_col, id_col)
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("long").alias("tf")))


def doc_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df, cf) from a (doc_id, term, tf) frame (A2)."""
    return tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (ceil(len/4) per word)."""
    t = tokens(df, text_col, id_col)
    return t.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("ws_tokens"),
        F.sum(F.ceil(F.length("term") / F.lit(4.0))).cast("long").alias("bpe_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: token count, type-token ratio, mean token
    length, stopword ratio — the standard webtext quality-filter family."""
    t = tokens(df, text_col, id_col)
    return (t.groupBy("doc_id").agg(
                F.count("*").cast("long").alias("n_tokens"),
                F.count_distinct("term").cast("long").alias("n_types"),
                F.round(F.avg(F.length("term")), 6).alias("mean_tok_len"),
                F.round(F.avg(F.col("term").isin(EN_STOPWORDS).cast("double")), 6)
                 .alias("stop_ratio"))
            .withColumn("ttr", F.round(F.col("n_types") / F.col("n_tokens"), 6)))


def lang_id_heuristic(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.05) -> DataFrame:
    """Stopword-ratio language-ID heuristic: en-like iff the English
    stopword ratio exceeds the threshold. (Real deployments plug a fasttext
    model into the same shape via mapInPandas.)"""
    q = quality_scores(df, text_col, id_col)
    return q.select(
        "doc_id",
        (F.col("stop_ratio") > F.lit(threshold)).alias("is_en_like"),
    )


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp) — md5 content fingerprint (exact-dup key)."""
    return df.select(F.col(id_col).alias("doc_id"),
                     F.md5(F.col(text_col)).alias("fp"))


def _hex_digit_val(col):
    # value of one lowercase hex character (Catalyst conv)
    return F.conv(col, 16, 10).cast("int")


def simhash16(tf: DataFrame) -> DataFrame:
    """16-bit SimHash per document from a (doc_id, term, tf) frame.

    Bit b (b = 0..15) uses the parity of hex digit b of md5(term):
    weight_b(doc) = Σ_terms tf * (2*parity − 1); simhash bit = weight_b > 0.
    Pure column expressions — a deterministic cross-engine-reproducible
    near-dup signature (same formula is expressible in ANSI SQL).
    """
    h = tf.withColumn("h", F.md5(F.col("term")))
    bit_cols = []
    for b in range(16):
        parity = (_hex_digit_val(F.substring("h", b + 1, 1)) % 2)
        bit_cols.append((F.col("tf") * (parity * 2 - 1)).alias(f"w{b}"))
    weighted = h.select("doc_id", *bit_cols)
    aggs = [F.sum(f"w{b}").alias(f"s{b}") for b in range(16)]
    summed = weighted.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(16):
        sim = sim + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return summed.select("doc_id", sim.alias("simhash"))
