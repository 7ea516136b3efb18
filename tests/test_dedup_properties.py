"""Property tests for the near-duplicate operators.

- MinHash-LSH banding (b×r + exact-Jaccard verify) must agree with the
  exhaustive shingle-Jaccard join wherever LSH recall holds, and must
  NEVER emit a pair below the threshold (precision is exact by
  construction — every candidate is verified).
- 64-bit SimHash band blocking is pigeonhole-complete at radius 3: any
  pair within Hamming distance ≤ 3 shares at least one of the 4 16-bit
  bands, so the banded operator equals the brute-force Hamming join.
"""

import random

import pytest
from pyspark.sql import functions as F


def _mk_docs(spark, rng, n_base=30, n_dups=8):
    """Synthetic corpus with planted near-dups: clones of base docs with a
    few token edits."""
    vocab = [f"w{i}" for i in range(120)]
    rows = []
    for i in range(n_base):
        words = [rng.choice(vocab) for _ in range(rng.randrange(12, 40))]
        rows.append((i, " ".join(words)))
    for j in range(n_dups):
        src_id, text = rows[rng.randrange(n_base)]
        words = text.split()
        for _ in range(rng.randrange(0, 3)):  # 0-2 edits
            words[rng.randrange(len(words))] = rng.choice(vocab)
        rows.append((1000 + j, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_minhash_banded_verified_subset_of_truth(spark, seed):
    from searchengine_spark.operators.dedup import (jaccard_pairs,
                                                    minhash_neardup_pairs,
                                                    shingles)

    rng = random.Random(seed)
    docs = _mk_docs(spark, rng)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in minhash_neardup_pairs(docs, k=12, bands=4, n=3,
                                          threshold=0.5).collect()}
    truth = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in jaccard_pairs(shingles(docs, 3), threshold=0.5,
                                    hashed_keys=False).collect()}
    # precision is exact: every emitted pair is in the truth set with the
    # same verified jaccard
    for pair, j in got.items():
        assert pair in truth and abs(j - truth[pair]) < 1e-9
    # planted near-dups (0-2 edits => very high shingle jaccard) recall:
    # every truth pair with j >= 0.8 must survive banding at r=3, b=4
    high = {p for p, j in truth.items() if j >= 0.8}
    assert high, "fixture must plant high-similarity pairs"
    assert high <= set(got)


@pytest.mark.parametrize("seed", [11, 12])
def test_simhash_banding_equals_bruteforce(spark, seed):
    from searchengine_spark.operators.textstats import (simhash64,
                                                        simhash_neardup_pairs,
                                                        term_frequencies)

    rng = random.Random(seed)
    docs = _mk_docs(spark, rng)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_neardup_pairs(docs, max_hamming=3).collect()}

    s = simhash64(term_frequencies(docs))
    a = s.select(F.col("doc_id").alias("doc_a"),
                 F.col("simhash_hi").alias("ha"),
                 F.col("simhash_lo").alias("la"))
    b = s.select(F.col("doc_id").alias("doc_b"),
                 F.col("simhash_hi").alias("hb"),
                 F.col("simhash_lo").alias("lb"))
    ham = (F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
           + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))).cast("long")
    brute = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in a.crossJoin(b)
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", ham.alias("hamming"))
             .filter(F.col("hamming") <= 3).collect()}
    assert got == brute  # pigeonhole: banding loses nothing at radius 3


def _union_find(nodes, pairs):
    """Reference union-find: {node: min doc of its component}."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _mk_cluster_docs(spark, rng, cluster_sizes=(3, 4, 2), n_unique=12):
    """Corpus with planted ≥3-doc near-dup clusters: each cluster shares a
    long common base and differs by one trailing unique word."""
    vocab = [f"c{i}" for i in range(200)]
    rows, nid = [], 0
    for size in cluster_sizes:
        base = [rng.choice(vocab) for _ in range(30)]
        for _ in range(size):
            rows.append((nid, " ".join(base + [f"uniq{nid}"])))
            nid += 1
    for _ in range(n_unique):
        rows.append((nid, " ".join(rng.choice(vocab)
                                   for _ in range(rng.randrange(15, 35)))))
        nid += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("seed", [5, 6])
def test_neardup_components_match_union_find(spark, seed):
    from searchengine_spark.operators.dedup import (minhash_neardup_pairs,
                                                    neardup_components)

    rng = random.Random(seed)
    docs = _mk_cluster_docs(spark, rng)
    pairs = minhash_neardup_pairs(docs, k=12, bands=4, n=3, threshold=0.5)
    pair_rows = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert pair_rows, "fixture must produce near-dup pairs"
    nodes = {x for p in pair_rows for x in p}
    want = _union_find(nodes, pair_rows)
    got = {r["node"]: r["component"]
           for r in neardup_components(pairs).collect()}
    assert got == want


@pytest.mark.parametrize("seed", [7])
def test_minhash_keep_first_collapses_planted_clusters(spark, seed):
    """Drop-list semantics on planted 3+-doc clusters: each cluster keeps
    exactly its min doc_id, unique docs all survive."""
    from searchengine_spark.operators.dedup import (minhash_keep_first,
                                                    minhash_neardup_pairs)

    rng = random.Random(seed)
    sizes = (3, 4, 2)
    docs = _mk_cluster_docs(spark, rng, cluster_sizes=sizes)
    kept = sorted(r["doc_id"]
                  for r in minhash_keep_first(docs, k=12, bands=4, n=3,
                                              threshold=0.5).collect())
    # oracle: union-find over the SAME pair graph
    pair_rows = [(r["doc_a"], r["doc_b"])
                 for r in minhash_neardup_pairs(docs, k=12, bands=4, n=3,
                                                threshold=0.5).collect()]
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    comp = _union_find(set(all_ids), pair_rows)
    want = sorted(n for n in all_ids if comp[n] == n)
    assert kept == want
    # the planted clusters must have actually collapsed: cluster c spans
    # ids [start, start+size) and near-identical texts => only min survives
    start = 0
    for size in sizes:
        ids = set(range(start, start + size))
        assert ids & set(kept) == {start}
        start += size


def test_components_chain_converges(spark):
    """A long chain (worst-case diameter) still converges within max_iter
    thanks to pointer jumping: chain of 40 nodes => one component."""
    from searchengine_spark.operators.dedup import neardup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long")
    got = {r["node"]: r["component"]
           for r in neardup_components(pairs).collect()}
    assert got == {i: 0 for i in range(41)}


def test_simhash64_halves_are_32bit(spark):
    from searchengine_spark.operators.textstats import (simhash64,
                                                        term_frequencies)

    docs = _mk_docs(spark, random.Random(99))
    rows = simhash64(term_frequencies(docs)).collect()
    assert rows
    for r in rows:
        assert 0 <= r["simhash_hi"] < (1 << 32)
        assert 0 <= r["simhash_lo"] < (1 << 32)


def test_decontamination_planted(spark):
    """Planted leakage: a training doc embedding a benchmark passage
    (>= min_overlap shared 3-gram shingles) is flagged with the right
    overlap count and dropped by decontaminate_keep; a doc sharing fewer
    n-grams and a clean doc are both kept; short/empty docs survive."""
    from searchengine_spark.operators.dedup import (contamination_pairs,
                                                    decontaminate_keep)

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "intro text then the quick brown fox jumps over something"),
         # shares shingles 'the quick brown','quick brown fox',
         # 'brown fox jumps','fox jumps over' with bench 100 => 4 >= 3
         (2, "pack my box again"),           # 1 shared shingle => kept
         (3, "completely unrelated content here"),
         (4, "tiny")],                        # < n tokens: no shingles
        "doc_id long, text string")

    pairs = {(r["doc_id"], r["bench_id"]): r["n_common"]
             for r in contamination_pairs(docs, bench, n=3,
                                          min_overlap=3).collect()}
    assert pairs == {(1, 100): 4}

    kept = {r["doc_id"]
            for r in decontaminate_keep(docs, bench, n=3,
                                        min_overlap=3).collect()}
    assert kept == {2, 3, 4}


def test_span_dedup_planted(spark):
    """C4-style span dedup with planted cross-doc span duplication:
    a 4-token span repeated verbatim in two later docs survives only at
    its first occurrence (min (doc_id, pos) owner); unique spans and the
    owner doc are untouched; counts are per-doc exact."""
    from searchengine_spark.operators.dedup import span_dedup

    boiler = "all rights reserved contact"          # the duplicated span
    docs = spark.createDataFrame(
        [(1, f"alpha beta gamma delta {boiler} epsilon zeta eta theta"),
         (2, f"{boiler} iota kappa lambda mu"),
         (3, "nu xi omicron pi rho sigma tau upsilon"),
         (4, f"phi chi psi omega {boiler}")],
        "doc_id long, text string")

    out = {r["doc_id"]: r for r in
           span_dedup(docs, span_tokens=4).collect()}
    # doc 1 owns the boilerplate span (pos 1): keeps all 3 spans
    assert out[1]["text"] == ("alpha beta gamma delta "
                              f"{boiler} epsilon zeta eta theta")
    assert (out[1]["n_spans"], out[1]["n_kept"]) == (3, 3)
    # doc 2 loses its first span, keeps the remainder in order
    assert out[2]["text"] == "iota kappa lambda mu"
    assert (out[2]["n_spans"], out[2]["n_kept"]) == (2, 1)
    # doc 3 untouched
    assert out[3]["text"] == "nu xi omicron pi rho sigma tau upsilon"
    assert (out[3]["n_spans"], out[3]["n_kept"]) == (2, 2)
    # doc 4 loses its second span
    assert out[4]["text"] == "phi chi psi omega"
    assert (out[4]["n_spans"], out[4]["n_kept"]) == (2, 1)


def test_repetition_stats_planted(spark):
    """Hand-computed Gopher repetition signals, and the zero-shuffle plan
    claim: the whole operator is row-local Catalyst (no Exchange)."""
    from searchengine_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b a b a"),       # 5 toks, top 'a'×3; bigrams: ab ba ab ba -> 2/4 dup
         (2, "x x x x"),         # 4 toks, top 4/4; bigrams: xx xx xx -> 2/3 dup
         (3, "p q r s"),         # no repetition at all
         (4, "solo")],           # single token: no bigram -> dropped
        "doc_id long, text string")

    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_tokens"], out[1]["top_token_frac"],
            out[1]["dup_ngram_frac"]) == (5, 0.6, 0.5)
    assert (out[2]["n_tokens"], out[2]["top_token_frac"],
            out[2]["dup_ngram_frac"]) == (4, 1.0, round(1 - 1 / 3, 6))
    assert (out[3]["top_token_frac"], out[3]["dup_ngram_frac"]) == (0.25, 0.0)

    plan = repetition_stats(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_hash_split_deterministic_and_complete(spark):
    """hash_split: every doc gets exactly one split, assignment is
    identical across runs and partitionings, fractions are near the
    weights, and the plan is Exchange-free (row-local projection)."""
    from searchengine_spark.operators.sampling import hash_split

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"),
                                       F.lit("t").alias("text"))
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(docs.repartition(7)).collect()}
    assert a == b and len(a) == 2000
    frac_train = sum(1 for s in a.values() if s == "train") / 2000
    assert 0.85 < frac_train < 0.95
    assert set(a.values()) == {"train", "val", "test"}

    plan = hash_split(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("Repartition")[0]


def test_stratified_sample_respects_strata(spark):
    """stratified_sample keeps only named strata at their fractions and
    is deterministic (a subset relation holds when fracs grow)."""
    from searchengine_spark.operators.sampling import stratified_sample

    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
         .when(F.col("id") % 3 == 1, "de").otherwise("zh").alias("lang"))
    small = {r["doc_id"] for r in stratified_sample(
        docs, {"en": 0.3}, "lang").collect()}
    big = {r["doc_id"] for r in stratified_sample(
        docs, {"en": 0.6}, "lang").collect()}
    assert small <= big                      # same hash, larger bound
    assert all(d % 3 == 0 for d in big)      # only the named stratum
    assert 0.2 < len(small) / 1000 < 0.4 and 0.5 < len(big) / 1000 < 0.7


def test_minhash_index_probe_and_append(spark, tmp_path):
    """MinHashIndex: the batch probe finds exactly the direct
    cross-set pairs; the sidecar gates probing; append extends the
    index without rebuild; dedup_batch filters matched batch rows."""
    from searchengine_spark.operators.dedup import (MinHashIndex,
                                                    minhash_neardup_pairs)

    corpus_rows = [(i, " ".join(f"w{i}_{j}" for j in range(20)))
                   for i in range(1, 7)]
    batch_rows = [
        (101, corpus_rows[1][1] + " tail101"),   # near-dup of corpus 2
        (102, "totally different content " + " ".join(
            f"q{j}" for j in range(24))),         # no dup
        (103, corpus_rows[4][1]),                 # exact dup of corpus 5
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    import pytest as _pytest
    path = str(tmp_path / "mh_idx")
    unbuilt = MinHashIndex(spark, path)
    with _pytest.raises(ValueError, match="sidecar"):
        unbuilt.probe_pairs(batch, corpus)

    idx = MinHashIndex(spark, path).build(corpus)
    with _pytest.raises(ValueError, match="params"):
        MinHashIndex(spark, path, bands=6, k=12).probe_pairs(batch, corpus)

    got = sorted(map(tuple, idx.probe_pairs(batch, corpus).collect()))
    both = corpus.unionByName(batch)
    direct = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in minhash_neardup_pairs(both).collect()}
    want = sorted((a, b, j) for (a, b), j in direct.items()
                  if a <= 6 and b >= 101)
    assert got == want
    assert {(a, b) for a, b, _ in got} == {(2, 101), (5, 103)}

    kept = sorted(r["doc_id"]
                  for r in idx.dedup_batch(batch, corpus).collect())
    assert kept == [102]

    # append batch; a later near-dup of an appended doc is then caught
    idx.append(batch)
    batch2 = spark.createDataFrame(
        [(201, batch_rows[1][1] + " tail201")],   # near-dup of batch 102
        "doc_id long, text string")
    hits = sorted(map(tuple, idx.probe_pairs(
        batch2, corpus.unionByName(batch)).collect()))
    assert [(a, b) for a, b, _ in hits] == [(102, 201)]


def test_span_dedup_over_limit_doc_raises(spark):
    """The owner-key encoding doc_id*2^20+pos is exact only while
    pos < 2^20; a doc exceeding that span count must raise, not silently
    elect a wrong owner (r4 judge finding)."""
    import pytest

    from searchengine_spark.operators.dedup import span_dedup

    big = "a " * ((1 << 20) + 2)            # > 2^20 one-token spans
    docs = spark.createDataFrame([(1, big), (2, "b c d")],
                                 "doc_id long, text string")
    with pytest.raises(Exception, match="span_dedup"):
        span_dedup(docs, span_tokens=1).collect()


def test_span_dedup_null_text_doc_is_dropped_not_crash(spark):
    """A NULL-text doc keeps the pre-guard behavior (explode drops it);
    the over-limit guard must not misfire on the NULL span count."""
    from searchengine_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame([(1, None), (2, "a b c d")],
                                 "doc_id long, text string")
    got = {r["doc_id"] for r in span_dedup(docs, span_tokens=2).collect()}
    assert got == {2}
