"""Content scrubbing for training-data pipelines: PII redaction and
C4-style line-level quality filtering.

Both operators are ROW-LOCAL Catalyst projections — zero shuffle, zero
Python, whole-stage-codegen — so they compose for free with any scan and
scale linearly with corpus bytes at any cluster width. The regexes are
deliberately restricted to the Java-regex ∩ RE2 common subset (no
lookaround, no backreferences) so any SQL oracle reproduces them
verbatim.

At 100 TB these run as a map over the documents scan: filters and column
pruning push past them, and the redacted/filtered text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Naive-by-design recognizers (a production deployment plugs
# presidio-grade recognizers into the same operator shape via the
# pattern arguments). Java regex and RE2 agree on all three.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

# redaction order matters: emails first (their digit runs must not be
# eaten as IPs), then IPv4s, then phones. Counts are taken per-pattern
# over the ORIGINAL text, so they are order-independent.
REDACTIONS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def pii_redact(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text, n_email, n_ipv4, n_phone) — mask emails, IPv4
    addresses, and NNN-NNN-NNNN / NNN.NNN.NNNN phone numbers with
    sentinel tokens; counts are per-pattern occurrences in the original
    text. Pure regexp_replace/regexp_count chain: row-local, no shuffle."""
    red = F.col(text_col)
    counts = []
    for name, pat, token in REDACTIONS:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat))
                      .cast("long").alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, token)
    return df.select(F.col(id_col).alias("doc_id"),
                     red.alias("text"), *counts)


def _line_keep(line: Column, min_words: int) -> Column:
    """The C4 line predicate (Raffel et al. 2020 §2.2, re-expressed):
    a line survives iff it ends in terminal punctuation, has at least
    `min_words` words, and does not mention javascript."""
    t = F.trim(line)
    ends_ok = F.substring(t, -1, 1).isin(".", "!", "?", '"')
    n_words = F.size(F.filter(F.split(t, " "), lambda w: w != ""))
    return (ends_ok & (n_words >= F.lit(min_words))
            & ~F.contains(F.lower(t), F.lit("javascript")))


def c4_line_filter(df: DataFrame, min_words: int = 3,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """C4-style line-level filter: split each document on newlines, keep
    only lines that end in terminal punctuation, have >= min_words words,
    and do not mention javascript; reassemble survivors in order. The
    document-level C4 rules are surfaced as a flag rather than a filter:
    `drop_doc` is true when the text contains "lorem ipsum" (any case) or
    a curly brace (code), so callers choose between auditing and
    dropping. Returns (doc_id, text, n_lines, n_kept, drop_doc); every
    input row appears (text may be empty).

    Scale shape: one higher-order-function projection per row — the line
    array never explodes, nothing shuffles, and text bytes stream through
    one codegen stage."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda x: _line_keep(x, min_words))
    drop = (F.contains(F.lower(F.col(text_col)), F.lit("lorem ipsum"))
            | F.contains(F.col(text_col), F.lit("{")))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept, "\n").alias("text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        drop.alias("drop_doc"),
    )
