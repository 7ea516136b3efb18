"""SQL-expressible full-text operators over a generic whitespace corpus.

These mirror the reference's query-side operators (SURVEY.md §2: A1/A2/A3,
O1/O2, J3, A6, O3/O4) for ANY (doc_id, text) table — used both by the driver
correctness gate (DuckDB oracle side-by-side) and as the relational
foundation the Russian engine specializes. BM25 parameters follow the
north_rule (k1=1.2, b=0.75); idf = ln(1 + (N-df+0.5)/(df+0.5)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import doc_frequencies, term_frequencies

BM25_K1 = 1.2
BM25_B = 0.75


def corpus_stats(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """One row: n_docs, n_terms, total_tokens, avgdl (A3)."""
    tf = term_frequencies(docs, text_col, id_col)
    n_docs = docs.select(F.count("*").alias("n_docs"))
    agg = tf.agg(
        F.count_distinct("term").cast("long").alias("n_terms"),
        F.sum("tf").cast("long").alias("total_tokens"),
    )
    return (n_docs.crossJoin(agg)
            .withColumn("avgdl", F.round(F.col("total_tokens") / F.col("n_docs"), 6))
            .select("n_docs", "n_terms", "total_tokens", "avgdl"))


def stopword_terms(docs: DataFrame, ratio: float, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Terms with df/N > ratio (O2 generalized; reference ratio 0.95)."""
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = doc_frequencies(tf)
    n = docs.count()
    return (dfreq.filter(F.col("df") / F.lit(float(n)) > F.lit(ratio))
                 .select("term", "df").orderBy("term"))


def rarest_first(docs: DataFrame, query_terms: list[str],
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Query terms ordered by ascending df (O1) with their df."""
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = doc_frequencies(tf).filter(F.col("term").isin(query_terms))
    return (dfreq.select("term", "df")
                 .withColumn("ord", F.row_number().over(
                     Window.orderBy(F.col("df").asc(), F.col("term").asc())))
                 .select("ord", "term", "df"))


def and_intersection(docs: DataFrame, query_terms: list[str],
                     text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """doc_ids containing ALL query terms (J3) — one hash aggregate."""
    tf = term_frequencies(docs, text_col, id_col)
    return (tf.filter(F.col("term").isin(query_terms))
              .groupBy("doc_id")
              .agg(F.count_distinct("term").alias("nt"))
              .filter(F.col("nt") == F.lit(len(query_terms)))
              .select("doc_id"))


def relevance_tf_sum(docs: DataFrame, query_terms: list[str], k: int = 20,
                     text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Reference relevance: Σtf over query terms for AND docs, top-k
    (A6+O3; deterministic (rel desc, doc_id asc) tiebreak)."""
    tf = term_frequencies(docs, text_col, id_col)
    q = tf.filter(F.col("term").isin(query_terms))
    agg = (q.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("nt"),
                 F.sum("tf").cast("long").alias("relevance"))
            .filter(F.col("nt") == F.lit(len(query_terms))))
    return (agg.select("doc_id", "relevance")
               .orderBy(F.col("relevance").desc(), F.col("doc_id").asc())
               .limit(k))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              offset: int = 0, k1: float = BM25_K1, b: float = BM25_B,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k with AND semantics over a whitespace corpus (the flagship
    relational form of the engine's query plan; scores rounded to 6dp)."""
    tf = term_frequencies(docs, text_col, id_col)
    n = docs.count()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))
    avgdl = dl.agg(F.avg("dl")).collect()[0][0] or 1.0
    dfreq = doc_frequencies(tf).filter(F.col("term").isin(query_terms))
    idf = dfreq.select(
        "term",
        F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("df") + 0.5)
              / (F.col("df") + 0.5)).alias("idf"),
    )
    q = (tf.filter(F.col("term").isin(query_terms))
           .join(F.broadcast(idf), "term")
           .join(dl, "doc_id"))
    score = (F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
             / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))))
    agg = (q.withColumn("s", score)
            .groupBy("doc_id")
            .agg(F.count_distinct("term").alias("nt"), F.sum("s").alias("score"))
            .filter(F.col("nt") == F.lit(len(query_terms))))
    return (agg.orderBy(F.col("score").desc(), F.col("doc_id").asc())
               .offset(offset).limit(k)
               .select("doc_id", F.round("score", 6).alias("score")))
