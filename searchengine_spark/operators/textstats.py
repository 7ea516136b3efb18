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


def spread_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Widen a narrow-source frame to the session's parallelism before
    CPU-heavy per-row map work. At web scale inputs arrive as thousands of
    file splits and this is a no-op; it guards the degenerate
    few-big-files case (e.g. one parquet file ⇒ one input split) where a
    single task would otherwise own the whole map side. Measured 5× on
    the shingle/minhash family at sf0.1 (single-file input). NOT applied
    to light explodes (whitespace tokens): there the extra exchange costs
    more than the serial map side saves (measured 2× slower) — apply only
    where per-row work dominates."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def ws_token_count(col):
    """Column: whitespace token count with NULL text counting 0 — the
    shared expression behind pack_greedy and quality_percentile_filter
    (ONE definition so the operators and their DuckDB oracles —
    len(list_filter(string_split(coalesce(text,''),' '), w->w<>'')) —
    can never drift apart)."""
    return F.size(F.filter(F.split(F.coalesce(col, F.lit("")), " "),
                           lambda w: w != "")).cast("long")


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


def simhash64(tf: DataFrame, broadcast_signs: bool | None = None) -> DataFrame:
    """64-bit SimHash per document from a (doc_id, term, tf) frame, emitted
    as two 32-bit halves (simhash_hi, simhash_lo) so every engine's signed
    64-bit integer holds them without overflow.

    broadcast_signs: the per-term sign table is |vocab|×(22 longs + term)
    — broadcast-able up to a few million distinct terms, a multi-GB
    driver/executor bomb at web-scale vocabularies (10^8+ terms). The
    default (None) emits NO join hint and lets AQE decide at runtime
    from the distinct's ACTUAL shuffle statistics: under
    spark.sql.autoBroadcastJoinThreshold the sign-table side converts to
    a broadcast join, above it the join stays shuffled — the scale-safe
    default with zero extra jobs (no eager vocabulary count, and the
    lineage stays streamable). Pass True to force the broadcast hint
    when the caller KNOWS the vocabulary is small (e.g. AQE disabled);
    False is an explicit no-hint alias of the default.

    Bit b (0..63) draws from bit (b%4) of the value of hex digit (b//4) of
    md5(term): weight_b(doc) = Σ tf·(2·bit−1), simhash bit = weight_b > 0.
    Pure column expressions, reproducible in ANSI SQL — this is the real
    near-dup signature (simhash16's 65k buckets are a demo; 2^64 codes +
    banded Hamming search below scale to web corpora).

    Lane-packed aggregation: weight_b > 0 ⟺ 2·pos_b > total where
    pos_b = Σ tf·bit_b (non-negative) and total = Σ tf, so only UNSIGNED
    per-bit sums are needed — three 21-bit lanes pack into one long with
    no carry between lanes while every lane sum < 2^21 (pos_b ≤ total =
    doc length; a 2M-token single document would be ~8 MB of text — far
    beyond any real page). 64 bits therefore aggregate as 22 packed longs
    + 1 total instead of 64 signed sums, and the per-row join output is
    22 multiplies tf·mask_j (the term's bits pre-spread 21 apart) instead
    of 64."""
    # the 64-bit pattern depends only on the TERM: compute md5 digits and
    # packed masks once per distinct term (|vocab| rows), then join back
    terms = tf.select("term").distinct().withColumn("h", F.md5(F.col("term")))
    digit_vals = [_hex_digit_val(F.substring("h", i + 1, 1))
                  for i in range(16)]
    W, L = 21, 3  # lane width (bits), lanes per packed column
    n_packed = -(-64 // L)
    mask_cols = []
    for j in range(n_packed):
        acc = None
        for i in range(L):
            b = L * j + i
            if b >= 64:
                break
            bit = (F.shiftright(digit_vals[b // 4], b % 4)
                   .bitwiseAND(F.lit(1)).cast("long"))
            part = bit * F.lit(1 << (W * i))
            acc = part if acc is None else acc + part
        mask_cols.append(acc.alias(f"m{j}"))
    term_signs = terms.select("term", *mask_cols)
    if broadcast_signs:
        term_signs = F.broadcast(term_signs)
    weighted = (tf.join(term_signs, "term")
                  .select("doc_id", F.col("tf").cast("long").alias("tf"),
                          *[(F.col("tf").cast("long") * F.col(f"m{j}"))
                            .alias(f"w{j}") for j in range(n_packed)]))
    summed = weighted.groupBy("doc_id").agg(
        F.sum("tf").alias("total"),
        *[F.sum(f"w{j}").alias(f"s{j}") for j in range(n_packed)])
    lane_mask = (1 << W) - 1

    def pos(b: int):
        return (F.shiftright(F.col(f"s{b // L}"), W * (b % L))
                .bitwiseAND(F.lit(lane_mask)))

    half = []
    for lo_bit in (32, 0):  # hi half first
        acc = F.lit(0).cast("long")
        for b in range(lo_bit, lo_bit + 32):
            acc = acc + F.when(pos(b) * 2 > F.col("total"),
                               F.lit(1 << (b - lo_bit))).otherwise(F.lit(0))
        half.append(acc)
    return summed.select("doc_id", half[0].alias("simhash_hi"),
                         half[1].alias("simhash_lo"))


def simhash_neardup_pairs(df: DataFrame, max_hamming: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, hamming) — SimHash near-duplicate pairs.

    Standard 64-bit simhash blocking: split the code into 4 bands of 16
    bits; any pair within Hamming distance ≤ 3 must agree exactly on at
    least one band (pigeonhole), so candidates = equality join per band
    (the shuffle key is a 16-bit value + band id — never an all-pairs
    join), verified by exact popcount(xor) ≤ max_hamming. max_hamming ≤ 3
    keeps the pigeonhole guarantee with 4 bands; larger radii need more
    bands."""
    s = simhash64(term_frequencies(df, text_col, id_col))
    bands = [
        F.col("simhash_lo").bitwiseAND(F.lit(0xFFFF)),
        F.shiftright(F.col("simhash_lo"), 16).bitwiseAND(F.lit(0xFFFF)),
        F.col("simhash_hi").bitwiseAND(F.lit(0xFFFF)),
        F.shiftright(F.col("simhash_hi"), 16).bitwiseAND(F.lit(0xFFFF)),
    ]
    stacked = s.select(
        "doc_id", "simhash_hi", "simhash_lo",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"), b.alias("key"))
            for i, b in enumerate(bands)])).alias("bk"))
    stacked = stacked.select("doc_id", "simhash_hi", "simhash_lo",
                             F.col("bk.band").alias("band"),
                             F.col("bk.key").alias("key"))
    a = stacked.select(F.col("doc_id").alias("doc_a"),
                       F.col("simhash_hi").alias("ha"),
                       F.col("simhash_lo").alias("la"), "band", "key")
    b = stacked.select(F.col("doc_id").alias("doc_b"),
                       F.col("simhash_hi").alias("hb"),
                       F.col("simhash_lo").alias("lb"), "band", "key")
    ham = (F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
           + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))).cast("long")
    # popcount-filter BEFORE the distinct: far pairs (the overwhelming
    # majority of band collisions) die in the codegen'd filter instead of
    # riding the distinct's shuffle
    return (a.join(b, ["band", "key"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .filter(ham <= F.lit(max_hamming))
             .select("doc_a", "doc_b", ham.alias("hamming"))
             .distinct())


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


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, top_token_frac, dup_ngram_frac) — Gopher-style
    within-document repetition signals (most-frequent-token fraction,
    duplicate-bigram fraction), the filters a webtext quality pipeline
    runs before training.

    Entirely ROW-LOCAL Catalyst — zero shuffle, zero Python: the top
    token fraction is the maximum run length of the per-row sorted token
    array (an aggregate() fold, not an explode+groupBy), and the
    duplicate-bigram fraction is 1 − |array_distinct(bigrams)|/|bigrams|
    over the same row. Docs with fewer than two tokens are dropped (no
    bigram is defined there), matching the oracle's inner join."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    nt = F.size(toks)
    srt = F.array_sort(toks)
    max_run = F.when(
        nt >= 2,
        F.aggregate(
            F.sequence(F.lit(1), nt - 1),
            F.struct(F.lit(1).alias("cur"), F.lit(1).alias("best")),
            lambda acc, i: F.when(
                F.element_at(srt, i + 1) == F.element_at(srt, i),
                F.struct((acc["cur"] + 1).alias("cur"),
                         F.greatest(acc["best"], acc["cur"] + 1)
                         .alias("best")))
             .otherwise(F.struct(F.lit(1).alias("cur"),
                                 acc["best"].alias("best"))),
            lambda acc: acc["best"]),
    ).otherwise(F.lit(1))
    bigrams = F.when(
        nt >= 2,
        F.transform(F.sequence(F.lit(0), nt - 2),
                    lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                          F.element_at(toks, i + 2))),
    ).otherwise(F.array().cast("array<string>"))
    n_bg = F.size(bigrams)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        nt.cast("long").alias("n_tokens"),
        F.round(max_run / nt, 6).alias("top_token_frac"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(bigrams)) / n_bg, 6)
         .alias("dup_ngram_frac"),
        n_bg.alias("_n_bg"),
    )
    return (out.filter(F.col("_n_bg") > 0)
            .drop("_n_bg"))


def unigram_logprob_scores(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, sum_logp_micro, avg_logp) — the CCNet-style
    language-model quality signal, unigram edition: each document scored
    by the mean log10 corpus-unigram probability of its tokens. Natural
    prose (common words) scores high; gibberish, boilerplate IDs, and
    wrong-language text (rare unigrams) score low — the standard "LM
    perplexity" curation gate with the model trained on the corpus
    itself (CCNet trains 5-gram KenLM; the unigram form is the
    shuffle-shaped skeleton, and the signal quality gate tests pin).

    Cross-engine determinism (the interesting part): floating-point SUMS
    are order-dependent and Spark's aggregation order is not, so per-term
    log-probs are quantized to INTEGER micro-units — lpm =
    round(log10(cf/total)·1e6) as a long — before any aggregation. The
    per-doc reduction Σ tf·lpm is then exact 64-bit integer arithmetic
    (order-free), and the only float ops left are one division chain
    applied once per doc: avg_logp = round((Σ/1e6)/n_tokens, 6).
    |lpm| ≤ ~12·1e6 and Σ|tf·lpm| ≤ doc_tokens·12e6 — overflow needs a
    10^12-token document. Honest residual exposure: the quantization
    itself reads a library log10 (JVM vs libm can differ in the last
    ulp), so a term whose log10·1e6 lands within ~1e-10 of a .5
    boundary could round to different micro-units across engines —
    measure-zero per term (~1e-10), not engineered away; the INTEGER
    columns are exact once lpm agrees, which the sum's order-freedom
    guarantees (the thing float accumulation could never give).

    Scale shape: the unigram table is one (term → cf) aggregation; total
    corpus tokens ride a 1-row broadcast cross join (no driver scalar);
    scoring is one join of (doc_id, term, tf) against the table (AQE
    picks broadcast vs shuffle from the table's real size) and one
    integer groupBy per doc. Docs with zero tokens have no rows to score
    and are absent from the output (both engines, by join construction)."""
    tf = term_frequencies(df, text_col, id_col)
    cf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    tot = cf.agg(F.sum("cf").cast("long").alias("_tot"))
    lpm = (cf.crossJoin(F.broadcast(tot))
           .select("term",
                   F.round(F.log10(F.col("cf") / F.col("_tot"))
                           * F.lit(1000000.0), 0)
                    .cast("long").alias("lpm")))
    d = (tf.join(lpm, "term")
         .groupBy("doc_id")
         .agg(F.sum("tf").cast("long").alias("n_tokens"),
              F.sum(F.col("tf") * F.col("lpm")).cast("long")
               .alias("sum_logp_micro")))
    return d.select(
        "doc_id", "n_tokens", "sum_logp_micro",
        F.round((F.col("sum_logp_micro") / F.lit(1000000.0))
                / F.col("n_tokens"), 6).alias("avg_logp"))


def bigram_logprob_scores(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, sum_logp_micro, avg_logp) — bigram conditional
    LM quality: each document scored by the mean log10 p(w_i | w_{i-1})
    under the corpus's own bigram model, p(w|prev) = cf(prev,w)/ctx(prev)
    with ctx(prev) = Σ_w cf(prev,w). The order-sensitive upgrade of
    unigram_logprob_scores: "the cat sat" and "sat the cat" share
    unigrams but not bigram likelihood — this is the signal that
    separates shuffled/templated boilerplate from prose (the CCNet
    n-gram-LM direction; 5-gram KenLM is the same shape with a bigger
    join key). Self-scoring over one corpus needs no smoothing — every
    document bigram is in the corpus table by construction; scoring NEW
    text against a frozen table is the two-frame variant (join misses ⇒
    back off to unigram_logprob_scores' table, the stupid-backoff plan).

    Determinism: identical to unigram_logprob_scores — per-bigram
    log-probs quantized to integer micro-units before the order-free
    per-doc integer reduction (same measure-zero log10-ulp boundary
    note). Docs with fewer than 2 tokens have no bigrams and are absent.

    Scale shape: bigram extraction is one lag window per doc (partition
    = doc_id — millions of small partitions, never skewed); the model is
    two aggregations on (prev, term) / (prev); scoring is one AQE-routed
    join + one integer groupBy. Bigram keys are the shuffle currency —
    at web scale hash the pair to a 64-bit key (xxhash64) if the string
    pair dominates the exchange; kept as strings here for oracle
    transparency."""
    from pyspark.sql import Window

    t = tokens(df, text_col, id_col)
    wlag = Window.partitionBy("doc_id").orderBy(F.col("pos").asc())
    bg = (t.withColumn("prev", F.lag("term").over(wlag))
          .filter(F.col("prev").isNotNull()))
    dbt = (bg.groupBy("doc_id", "prev", "term")
           .agg(F.count("*").cast("long").alias("tf")))
    bgcf = (dbt.groupBy("prev", "term")
            .agg(F.sum("tf").cast("long").alias("cf")))
    ctx = bgcf.groupBy("prev").agg(F.sum("cf").cast("long").alias("ctx_cf"))
    lp = (bgcf.join(ctx, "prev")
          .select("prev", "term",
                  F.round(F.log10(F.col("cf") / F.col("ctx_cf"))
                          * F.lit(1000000.0), 0)
                   .cast("long").alias("lpm")))
    d = (dbt.join(lp, ["prev", "term"])
         .groupBy("doc_id")
         .agg(F.sum("tf").cast("long").alias("n_bigrams"),
              F.sum(F.col("tf") * F.col("lpm")).cast("long")
               .alias("sum_logp_micro")))
    return d.select(
        "doc_id", "n_bigrams", "sum_logp_micro",
        F.round((F.col("sum_logp_micro") / F.lit(1000000.0))
                / F.col("n_bigrams"), 6).alias("avg_logp"))
