"""Engine configuration. One dataclass, explicit defaults, no env magic."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # ranking (north_rule: BM25 k1=1.2 b=0.75)
    bm25_k1: float = 1.2
    bm25_b: float = 0.75
    # query analysis: prune lemma if df/N > threshold
    # (reference SearchServiceImpl.java:161)
    stopword_df_ratio: float = 0.95
    # deterministic doc-id assignment buckets (shuffle width of the
    # assignment stage; raise to thousands on a real cluster). Must never
    # cap parallelism below the core count — 64 covers local[32].
    doc_id_buckets: int = 64
    # posting-block codec
    block_size: int = 128
    # skew handling: terms with df > salt_df_threshold are range-sharded by
    # doc_id so no single build task materializes a full stopword posting list
    salt_df_threshold: int = 50_000
    salt_shard_docs: int = 25_000  # docs per range shard for head terms
    # postings layout: term-hash buckets (partition pruning at query time);
    # also the write parallelism of the postings/blocks stages
    term_buckets: int = 64
    # tokenize+lemmatize stage implementation: "sql" = pure Catalyst
    # (regexp split + broadcast lexicon join; zero Python in the build hot
    # path), "python" = vectorized mapInArrow calling the oracle's code
    # (bit-for-bit the reference semantics; equivalence is test-enforced)
    tokenizer: str = "sql"
    # strategy="auto" routing: serve from the driver (pyarrow, no Spark
    # job) while every query term's posting list fits one process
    # (plans/serve.py scale caveat); above it, distributed block-max WAND
    driver_df_limit: int = 10_000_000
    # defaults mirrored from the reference UI
    default_limit: int = 10  # templates/index.html:128
    snippet_window: int = 20  # SnippetSearch.java:25
