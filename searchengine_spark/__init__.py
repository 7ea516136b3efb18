"""searchengine_spark — a PySpark-native full-text indexing + BM25 query engine.

Re-implements the capabilities of the reference engine
(sergeytupitsyn/searchengine: crawl → extract → lemmatize → inverted index →
ranked multi-term search) as an idiomatic Spark pipeline over a
Common-Crawl-style pages table:

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Subpackages
-----------
functions/   pure-Python text core (extract/tokenize/lemmatize) + pandas UDFs
sources/     deterministic synthetic corpus generator, table IO + manifests
operators/   doc-id assignment, posting-block codec, dedup, similarity,
             text-analysis, multimodal plumbing
plans/       index build plan, exact + block-max-WAND query plans, snippets,
             statistics, public API facade
streaming/   incremental maintenance (upsert/remove = snapshot-to-snapshot)

The pure-Python model in ``oracle.py`` is the correctness source of truth:
every Spark result must be rank-identical (doc ids, BM25 scores to 1e-6).
"""

__version__ = "0.1.0"
