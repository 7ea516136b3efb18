"""Per-stratum caps and sequence packing (operators/sampling.py).

The driver contract hash-checks both against DuckDB at sf0.01
(tests/test_entry_contract.py: domain_cap, pack_greedy); these pin the
SEMANTICS on planted fixtures."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from searchengine_spark.operators.sampling import cap_per_stratum, pack_greedy


def test_cap_keeps_lowest_ids_per_stratum(spark):
    rows = [(i, "x", "a") for i in range(5)] + [(i, "x", "b")
                                                for i in range(10, 13)]
    df = spark.createDataFrame(rows, "doc_id long, text string, site string")
    out = cap_per_stratum(df, cap=2, stratum_col="site")
    got = sorted((r["site"], r["doc_id"], r["rank"]) for r in out.collect())
    # keep-first discipline: the 2 lowest doc_ids of each stratum
    assert got == [("a", 0, 1), ("a", 1, 2), ("b", 10, 1), ("b", 11, 2)]


def test_cap_salted_is_deterministic_sample_not_head(spark):
    """order_salt ranks by the engine-portable id hash: the kept set is a
    reproducible uniform sample of the stratum, not its lowest ids."""
    df = spark.createDataFrame([(i, "x", "a") for i in range(40)],
                               "doc_id long, text string, site string")
    a = sorted(r["doc_id"] for r in
               cap_per_stratum(df, 10, "site", order_salt="s1").collect())
    b = sorted(r["doc_id"] for r in
               cap_per_stratum(df, 10, "site", order_salt="s1").collect())
    head = list(range(10))
    assert a == b and len(a) == 10 and a != head  # stable, not the head


def test_cap_rejects_bad_cap(spark):
    df = spark.createDataFrame([(1, "x", "a")],
                               "doc_id long, text string, site string")
    with pytest.raises(ValueError):
        cap_per_stratum(df, 0, "site")


def test_pack_greedy_concat_and_cut(spark):
    """Documents concatenate in doc_id order; pack boundaries cut the
    token stream every max_tokens; a straddling doc keeps the pack/offset
    of its FIRST token; NULL text is 0 tokens and offset-transparent."""
    rows = [(1, "a b c"), (2, "d e f g"), (3, None), (4, "h i j k l"),
            (5, "m")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["pack_id"], r["pack_offset"])
           for r in pack_greedy(df, max_tokens=5).collect()}
    # stream: doc1 tokens 0-2, doc2 3-6 (straddles packs 0/1), doc3 at 7,
    # doc4 7-11 (straddles 1/2), doc5 at 12
    assert out == {1: (3, 0, 0), 2: (4, 0, 3), 3: (0, 1, 2),
                   4: (5, 1, 2), 5: (1, 2, 2)}
    # zero padding waste by construction: offsets advance exactly by
    # token counts
    total = sum(v[0] for v in out.values())
    last = out[5]
    assert last[1] * 5 + last[2] + last[0] == total


def test_pack_greedy_shards_pack_independently(spark):
    rows = [(1, "a b c", "s0"), (2, "d e", "s1"), (3, "f g h i", "s0")]
    df = spark.createDataFrame(rows, "doc_id long, text string, sh string")
    out = {r["doc_id"]: (r["pack_id"], r["pack_offset"]) for r in
           pack_greedy(df, max_tokens=4, shard_col=F.col("sh")).collect()}
    # s0 stream: doc1 at 0-2, doc3 at 3-6 (straddles); s1: doc2 at 0
    assert out == {1: (0, 0), 3: (0, 3), 2: (0, 0)}


def test_pack_greedy_rejects_bad_max(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_greedy(df, max_tokens=0)


def test_unigram_lm_scores_rank_gibberish_low(spark):
    """The LM-quality gate's point: docs made of corpus-common words
    outscore docs of corpus-rare gibberish; the integer micro-logprob
    sum is exact and run-stable."""
    from searchengine_spark.operators.textstats import unigram_logprob_scores

    common = "the cat sat on the mat and the dog sat too"
    rows = ([(i, common) for i in range(8)]
            + [(100, "zqxj vvkw pflm qqrt")]          # corpus-rare junk
            + [(101, "the dog and the cat")])          # common words only
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["avg_logp"]
           for r in unigram_logprob_scores(df).collect()}
    assert out[101] > out[100]                 # natural >> gibberish
    assert out[0] > out[100]
    again = {r["doc_id"]: r["avg_logp"]
             for r in unigram_logprob_scores(df).collect()}
    assert out == again                        # exact reproducibility
    # zero-token docs are absent, not scored
    df2 = spark.createDataFrame(rows + [(200, "")],
                                "doc_id long, text string")
    ids = {r["doc_id"] for r in unigram_logprob_scores(df2).collect()}
    assert 200 not in ids


def test_bigram_lm_is_order_sensitive(spark):
    """The bigram scorer's point over the unigram one: a doc of corpus-
    frequent bigrams outscores a shuffled doc of the SAME unigrams."""
    from searchengine_spark.operators.textstats import (
        bigram_logprob_scores, unigram_logprob_scores)

    natural = "the cat sat on the mat"
    rows = ([(i, natural) for i in range(8)]
            + [(100, "mat the on sat cat the")]   # same unigrams, shuffled
            + [(101, "the cat sat")])             # frequent bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bg = {r["doc_id"]: r["avg_logp"]
          for r in bigram_logprob_scores(df).collect()}
    assert bg[101] > bg[100]                      # order matters
    ug = {r["doc_id"]: r["avg_logp"]
          for r in unigram_logprob_scores(df).collect()}
    # ...and the unigram scorer CANNOT separate doc 100 from doc 0's
    # per-token quality (same bag of words): bigram adds real signal
    assert abs(ug[100] - ug[0]) < 0.3
    # docs with < 2 tokens have no bigrams and are absent
    df2 = spark.createDataFrame(rows + [(200, "solo")],
                                "doc_id long, text string")
    assert 200 not in {r["doc_id"]
                       for r in bigram_logprob_scores(df2).collect()}
