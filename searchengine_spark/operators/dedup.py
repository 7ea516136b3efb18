"""Deduplication operators for webtext corpora — exact, n-gram Jaccard,
MinHash-LSH, SimHash (see textstats.simhash16).

All pure DataFrame ops. Scale notes:
- exact dedup: one groupBy on the content hash — the hash (16 bytes) is the
  shuffle key, never the text
- shingle self-joins: joined on a fixed-width xxhash64 of the shingle (not
  the raw string) by default, with a frequency cap (`max_shingle_df`)
  dropping ubiquitous shingles before the self-join — they generate
  quadratic pairs and carry no dedup signal
- MinHash-LSH: one md5 per shingle reduced to a 60-bit int, then k affine
  derivations (a_j·h + b_j) mod (2^31-1) — k-fold cheaper than k string
  md5s; b bands of r = k/b rows each; a candidate pair must agree on ALL
  r minhashes of some band (S-curve selectivity), then exact shingle
  Jaccard verifies — candidates stay O(near-duplicates), never O(n²)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import fingerprints, spread_input, tokens


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
    """(doc_id, sh) — distinct word n-gram shingles per document.

    Distinctness is enforced with array_distinct BEFORE the explode: all
    of a document's shingles come from its single input row, so per-doc
    dedup is task-local by construction — a trailing .distinct() would
    shuffle the full (doc_id, sh) frame corpus-wide for the same result.
    Every shingle consumer (Jaccard, MinHash, decontamination) saves that
    exchange."""
    df = spread_input(df)
    toks = F.split(F.col(text_col), " ")
    idxs = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)) \
            .otherwise(F.array().cast("array<int>"))
    tri = F.transform(
        idxs,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(F.array_distinct(tri)).alias("sh"))
              .filter(F.col("sh") != ""))


def jaccard_pairs(sh: DataFrame, threshold: float = 0.5,
                  max_shingle_df: int | None = None,
                  hashed_keys: bool = True) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-set Jaccard ≥ threshold.

    Self-join on shingle -> common counts -> |A∪B| = |A|+|B|-common.
    max_shingle_df drops shingles shared by more than that many docs before
    the join (quadratic-pair guard for head shingles at scale).
    hashed_keys joins on xxhash64(sh) instead of the raw shingle string —
    fixed 8-byte shuffle keys; a collision would need ~2^32 distinct
    shingles per partition-pair to matter (negligible below 10^9 docs;
    switch to a 128-bit digest beyond).
    """
    if hashed_keys:
        sh = sh.select("doc_id", F.xxhash64("sh").alias("sh"))
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
    raw = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    # threshold on the RAW ratio (the oracle SQL does the same); rounding
    # is output formatting only — filtering the rounded value would admit
    # boundary pairs the oracle rejects
    return (common.join(na, "doc_a").join(nb, "doc_b")
            .filter(raw >= F.lit(threshold))
            .select("doc_a", "doc_b", F.round(raw, 6).alias("jaccard")))


MINHASH_P = 2_147_483_647  # 2^31-1 (Mersenne prime): products stay < 2^62


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for the affine hash family
    h_j(x) = (a_j·x + b_j) mod p — integer-literal constants, identical on
    the Spark and DuckDB sides (embedded as literals in the oracle SQL)."""
    coeffs = []
    for j in range(k):
        a = (2_654_435_761 * (j + 1) + 104_729) % MINHASH_P
        b = (40_503 * (j + 1) + 12_345) % MINHASH_P
        coeffs.append((a or 1, b))
    return coeffs


def minhash_band_signatures(sh: DataFrame, k: int = 12,
                            bands: int = 4) -> DataFrame:
    """(doc_id, n_sh, band, sig) — b×r MinHash-LSH band signatures over a
    (doc_id, sh) shingle frame, r = k // bands minhashes per band.

    Hash family: ONE md5 per shingle reduced to a 60-bit int
    (conv(md5[:15], 16, 10) — reproducible in DuckDB as
    CAST('0x'||substr(md5,1,15) AS BIGINT)), then k affine derivations
    (a_j·h + b_j) mod p over that single int — k-fold cheaper than k
    independent string md5s, which previously dominated the dedup bench.
    All k minhashes AND the shingle-set size come out of ONE aggregation
    pass (k+1 agg columns); a band's signature is the md5 of its r
    concatenated minhashes, so two docs collide on a band only when all r
    agree — the classic S-curve P(cand) = 1-(1-s^r)^b, not the degenerate
    single-hash collision (which at r=1 pairs nearly everything sharing
    one min)."""
    if k % bands:
        raise ValueError(f"bands={bands} must divide k={k}")
    r = k // bands
    p = F.lit(MINHASH_P)
    h = (F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10)
         .cast("long") % p)
    hashed = sh.select("doc_id", h.alias("h"))
    aggs = [F.count("*").cast("long").alias("n_sh")] + [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % p).alias(f"h{j}")
        for j, (a, b) in enumerate(minhash_coeffs(k))]
    wide = hashed.groupBy("doc_id").agg(*aggs)
    sig_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"h{b * r + j}") for j in range(r)]))
        .alias(f"s{b}")
        for b in range(bands)]
    wide = wide.select("doc_id", "n_sh", *sig_cols)
    stack = ", ".join(f"{b}, s{b}" for b in range(bands))
    return wide.selectExpr(
        "doc_id", "n_sh", f"stack({bands}, {stack}) as (band, sig)")


def minhash_neardup_pairs(df: DataFrame, k: int = 12, bands: int = 4,
                          n: int = 3, threshold: float = 0.5,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, jaccard) — MinHash-LSH near-duplicate pairs.

    Pipeline: word n-gram shingles -> b×r banded minhash signatures ->
    candidate pairs = docs equal on (band, sig) [the ONLY self-join; its
    key is a 32-char digest, cardinality O(near-dups), never O(n²)] ->
    exact shingle-set Jaccard verification >= threshold.

    Scale notes: the band join's fan-out is bounded by real near-dup
    clusters (plus the vanishing 1-(1-s^r)^b tail), so output stays linear
    in duplicates; exact duplicates should be pre-collapsed via
    exact_keep_first so giant identical clusters don't quadratically
    inflate candidate pairs. The shingle frame and the candidate set feed
    multiple downstream joins, so both are materialized once
    (localCheckpoint — the in-session analog of writing them to a table,
    which is what a 100 TB run would do) instead of re-deriving the
    explode per consumer."""
    sh = shingles(df, n, text_col, id_col).localCheckpoint(eager=True)
    sigs = minhash_band_signatures(sh, k, bands)
    a = sigs.select(F.col("doc_id").alias("doc_a"),
                    F.col("n_sh").alias("na"), "band", "sig")
    b = sigs.select(F.col("doc_id").alias("doc_b"),
                    F.col("n_sh").alias("nb"), "band", "sig")
    cand = (a.join(b, ["band", "sig"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", "na", "nb").distinct()
             .localCheckpoint(eager=True))
    # exact verification: |A ∩ B| via two joins against the shingle frame
    # PRE-RESTRICTED to candidate docs (broadcast semi-joins — cand is
    # O(near-dups), so the verify shuffle moves only duplicates' shingles,
    # not the corpus; for pathological giant-dup-cluster inputs collapse
    # exact dups with exact_keep_first first)
    cand_docs = (cand.select(F.col("doc_a").alias("doc_id"))
                     .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
                     .distinct())
    sh_c = sh.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    sa = sh_c.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh_c.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (cand.join(sa, "doc_a").join(sb, ["doc_b", "sh"])
                  .groupBy("doc_a", "doc_b", "na", "nb")
                  .agg(F.count("*").alias("common")))
    raw = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    # threshold on the raw ratio, round only for output (oracle parity at
    # exact threshold boundaries — see jaccard_pairs)
    return (common
            .filter(raw >= F.lit(threshold))
            .select("doc_a", "doc_b", F.round(raw, 6).alias("jaccard")))


def neardup_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(node, component) — connected components over an undirected pair
    graph (e.g. minhash_neardup_pairs / simhash_neardup_pairs output);
    component = the MINIMUM doc_id of the component. Covers only nodes that
    appear in some pair — singletons trivially label themselves and are
    handled by the callers (neardup_keep_first) without materializing an
    all-docs label frame.

    Algorithm: iterative min-label propagation with pointer jumping
    (label ← label-of-label each round), so convergence is O(log diameter)
    rounds, not O(diameter) — the DataFrame rendition of path-halving
    union-find (the same plan family as large-star/small-star, Kiveris et
    al., "Connected Components in MapReduce"). Each round is two
    shuffle-joins + one aggregate on a frame of O(duplicate docs) rows —
    near-dup graphs are tiny relative to the corpus, and labels are pairs
    of longs, so even a billion-dup-doc graph is a few GB of shuffle.
    Lineage is cut per round (localCheckpoint); convergence is detected by
    the strictly-decreasing Σlabel fixpoint (one scalar agg per round, no
    extra join). max_iter bounds pathological chains; 25 rounds covers
    diameter 2^25."""
    edges = (pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
             .unionByName(
                 pairs.select(F.col("doc_b").alias("src"),
                              F.col("doc_a").alias("dst")))
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        nbr = (edges.join(labels, edges["src"] == labels["node"])
               .select(F.col("dst").alias("node"), F.col("label")))
        merged = (labels.unionByName(nbr)
                  .groupBy("node").agg(F.min("label").alias("label")))
        # pointer jump: label ← label(label); every label value is itself
        # a node (labels are node ids), so the join always matches
        ptr = merged.select(F.col("node").alias("pnode"),
                            F.col("label").alias("plabel"))
        labels = (merged.join(ptr, merged["label"] == ptr["pnode"], "left")
                  .select("node",
                          F.coalesce("plabel", "label").alias("label"))
                  .localCheckpoint(eager=True))
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("node", F.col("label").alias("component"))


def neardup_keep_first(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Retained doc ids after near-dup cluster resolution: for every
    connected component of the pair graph keep the minimum doc_id, drop the
    rest; docs in no pair keep themselves. This is the operator a training
    pipeline actually consumes — a drop-list, not a pair list.

    One anti-join against the O(duplicates) drop set — the corpus-sized
    side is never shuffled wide (the join key is the 8-byte doc_id and the
    drop side broadcasts while duplicates are < broadcast threshold)."""
    comp = neardup_components(pairs)
    drop = (comp.filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias(id_col)))
    return (docs.select(F.col(id_col).alias(id_col))
            .join(drop, id_col, "left_anti")
            .select(id_col))


def minhash_keep_first(df: DataFrame, k: int = 12, bands: int = 4,
                       n: int = 3, threshold: float = 0.5,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """End-to-end MinHash near-dup dedup: banded-LSH pairs -> connected
    components -> keep min-doc-per-cluster. Exact duplicates should be
    pre-collapsed with exact_keep_first on giant-dup-cluster corpora (see
    minhash_neardup_pairs scale notes)."""
    pairs = minhash_neardup_pairs(df, k, bands, n, threshold,
                                  text_col, id_col)
    return neardup_keep_first(df, pairs, id_col)


def contamination_pairs(docs: DataFrame, bench: DataFrame, n: int = 3,
                        min_overlap: int = 2, text_col: str = "text",
                        id_col: str = "doc_id",
                        bench_id_col: str = "doc_id",
                        hashed_keys: bool = True) -> DataFrame:
    """(doc_id, bench_id, n_common) — training docs sharing at least
    min_overlap DISTINCT word n-gram shingles with a benchmark document.
    The standard pre-training decontamination screen (strip eval-set
    leakage from the corpus before training; cf. the n-gram-overlap
    procedures published for GPT-3 appendix C / Llama 2 §A.6 — public
    methods, re-expressed as DataFrame ops).

    Scale shape: benchmark sets are tiny (10^3–10^6 rows) next to a
    10^12-doc corpus, so the bench shingle frame is broadcast — the
    corpus side streams map-side through the join with NO corpus-sized
    shuffle; only matching (doc, bench) rows (a near-empty frame when the
    corpus is clean) reach the counting aggregation. hashed_keys joins on
    xxhash64(shingle) — 8-byte keys, same collision calculus as
    jaccard_pairs.
    """
    from pyspark.sql.functions import broadcast

    dsh = shingles(docs, n, text_col, id_col)
    # bench_id_col names the id column IN the bench frame; the output
    # column is always bench_id
    bsh = shingles(bench, n, text_col, bench_id_col) \
        .withColumnRenamed("doc_id", "bench_id")
    if hashed_keys:
        dsh = dsh.select("doc_id", F.xxhash64("sh").alias("sh"))
        bsh = bsh.select("bench_id", F.xxhash64("sh").alias("sh"))
    return (dsh.join(broadcast(bsh), "sh")
            .groupBy("doc_id", "bench_id")
            .agg(F.count("*").cast("long").alias("n_common"))
            .filter(F.col("n_common") >= min_overlap))


def decontaminate_keep(docs: DataFrame, bench: DataFrame, n: int = 3,
                       min_overlap: int = 2, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Retained doc ids after benchmark decontamination: drop every doc
    with ≥ min_overlap shared n-gram shingles against ANY benchmark doc.
    One broadcast join + one anti-join on the 8-byte doc_id — the corpus
    text is never shuffled."""
    flagged = (contamination_pairs(docs, bench, n, min_overlap,
                                   text_col, id_col)
               .select("doc_id").distinct())
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(flagged, "doc_id", "left_anti")
            .select("doc_id"))


def span_dedup(df: DataFrame, span_tokens: int = 12,
               text_col: str = "text", id_col: str = "doc_id",
               hashed_keys: bool = True) -> DataFrame:
    """C4-style span-level dedup: chunk each document into consecutive
    fixed-width token spans, drop every span whose exact text occurs
    elsewhere in the corpus EXCEPT its first occurrence (owner = the
    lexicographically smallest (doc_id, pos)), and reassemble the
    surviving spans in order. Returns (doc_id, text, n_spans, n_kept);
    docs whose every span was dropped do not appear (their text is
    empty). This is the published C4 procedure ("discard all but one of
    any three-sentence span occurring more than once") re-expressed over
    fixed token windows — the corpus here has no sentence boundaries.

    Scale shape: two shuffles of span-granular rows — ownership is one
    groupBy on the span key (an 8-byte xxhash64 when hashed_keys, so the
    span TEXT never shuffles for ownership and keys are uniform — no
    salting needed), reassembly is one groupBy on doc_id. Owner identity
    is the encoded key doc_id·2^20 + pos: exact while pos < 2^20 (docs
    under ~12.6M tokens at span 12) and doc_id < 2^43 — both comfortably
    true at 10^12-doc web scale. The pos bound is ENFORCED (one per-doc
    comparison: an over-limit doc raises instead of silently electing a
    wrong owner); doc_id < 2^43 remains a documented precondition of the
    caller's id assignment (operators/doc_ids.py stays far below it).
    """
    spark_toks = F.split(F.col(text_col), " ")
    n_sp_raw = F.ceil(F.size(spark_toks) / F.lit(span_tokens)).cast("int")
    # NULL text stays NULL (sequence(0, NULL) -> NULL -> explode drops the
    # doc, the pre-guard behavior); only a real over-limit count raises
    n_sp = F.when(n_sp_raw.isNull() | (n_sp_raw <= F.lit(1 << 20)),
                  n_sp_raw).otherwise(
        F.raise_error(F.concat(
            F.lit("span_dedup: doc "), F.col(id_col).cast("string"),
            F.lit(f" has more than 2^20 spans of {span_tokens} tokens; "
                  "the owner key doc_id*2^20+pos would collide"))))
    span_structs = F.transform(
        F.sequence(F.lit(0), n_sp - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(
                " ", F.slice(spark_toks, i * span_tokens + 1, span_tokens)
            ).alias("sp")),
    )
    spans = (spread_input(df)
             .select(F.col(id_col).alias("doc_id"),
                     F.explode(span_structs).alias("s"))
             .select("doc_id", F.col("s.pos").alias("pos"),
                     F.col("s.sp").alias("sp")))
    key = (F.col("doc_id") * F.lit(1 << 20) + F.col("pos")).alias("okey")
    skey = F.xxhash64("sp") if hashed_keys else F.col("sp")
    spans = spans.withColumn("k", skey)
    own = (spans.select("k", key)
           .groupBy("k")
           .agg(F.count("*").alias("sdf"), F.min("okey").alias("okey")))
    kept = (spans.join(own, "k")
            .filter((F.col("sdf") == 1)
                    | (F.col("doc_id") * F.lit(1 << 20) + F.col("pos")
                       == F.col("okey"))))
    sizes = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"))
    out = (kept.groupBy("doc_id")
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "sp"))),
                        lambda x: x["sp"]),
                    " ").alias("text"),
                F.count("*").cast("long").alias("n_kept")))
    return (out.join(sizes, "doc_id")
            .select("doc_id", "text", "n_spans", "n_kept"))


# --- materialized near-dup index (incremental ingestion) --------------------

MINHASH_SIDECAR = "_minhash.json"


class MinHashIndex:
    """Materialized MinHash-LSH near-duplicate index: the banded signature
    table (doc_id, n_sh, band, sig) written ONCE, partitioned by band.
    This is the incremental-ingestion dedup path a production pipeline
    runs: each incoming batch is signed and joined against the signature
    scan on (band, sig) — per-batch cost is O(batch shingles + matched
    candidates), independent of corpus size, and the corpus TEXT is only
    re-shingled for the matched candidate docs (broadcast semi-join).
    `append` adds a committed batch's signatures in place (partitioned
    append, no rebuild), so later batches dedup against corpus + all
    prior batches. Signatures are ~bands rows of 32-char digests per doc
    (~200 B/doc at b=4), so the index stays tiny next to the corpus.

    The parameter sidecar doubles as the commit marker (the IvfAnnIndex
    discipline): a crash mid-build leaves no sidecar and the index then
    refuses to probe; a parameter mismatch on reopen refuses too, since
    signatures from different (k, bands, n) are incomparable."""

    def __init__(self, spark, path: str, k: int = 12, bands: int = 4,
                 n: int = 3):
        self.spark = spark
        self.path = path
        self.k = k
        self.bands = bands
        self.n = n

    def _params(self) -> dict:
        return {"k": self.k, "bands": self.bands, "n": self.n}

    def _write_sidecar(self) -> None:
        import json
        import os
        tmp = os.path.join(self.path, MINHASH_SIDECAR + ".tmp")
        with open(tmp, "w") as f:
            json.dump(self._params(), f)
        os.replace(tmp, os.path.join(self.path, MINHASH_SIDECAR))

    def _check_sidecar(self) -> None:
        import json
        import os
        p = os.path.join(self.path, MINHASH_SIDECAR)
        if not os.path.exists(p):
            raise ValueError(
                f"MinHash index at {self.path} has no {MINHASH_SIDECAR} "
                "sidecar: the build did not complete. Rebuild.")
        with open(p) as f:
            on_disk = json.load(f)
        if on_disk != self._params():
            raise ValueError(
                f"MinHash index params {on_disk} != requested "
                f"{self._params()}: signatures are incomparable. Rebuild "
                "or reopen with the on-disk parameters.")

    def _signatures(self, df: DataFrame, text_col: str,
                    id_col: str) -> DataFrame:
        sh = shingles(df, self.n, text_col, id_col)
        return minhash_band_signatures(sh, self.k, self.bands)

    def build(self, df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> "MinHashIndex":
        (self._signatures(df, text_col, id_col)
             .repartition("band")
             .write.mode("overwrite").partitionBy("band").parquet(self.path))
        self._write_sidecar()
        return self

    def append(self, df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> "MinHashIndex":
        self._check_sidecar()
        (self._signatures(df, text_col, id_col)
             .repartition("band")
             .write.mode("append").partitionBy("band").parquet(self.path))
        return self

    def probe_pairs(self, batch: DataFrame, corpus: DataFrame,
                    threshold: float = 0.5, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
        """(corpus_doc, batch_doc, jaccard) — near-dup pairs between the
        incoming batch and the INDEXED docs. `corpus` supplies the text
        of indexed docs for exact verification; only matched candidates'
        rows are read from it."""
        self._check_sidecar()
        bsh = (shingles(batch, self.n, text_col, id_col)
               .localCheckpoint(eager=True))
        bsigs = (minhash_band_signatures(bsh, self.k, self.bands)
                 .select(F.col("doc_id").alias("batch_doc"),
                         F.col("n_sh").alias("nb"), "band", "sig"))
        idx = (self.spark.read.parquet(self.path)
               .select(F.col("doc_id").alias("corpus_doc"),
                       F.col("n_sh").alias("na"), "band", "sig"))
        cand = (idx.join(bsigs, ["band", "sig"])
                .select("corpus_doc", "batch_doc", "na", "nb").distinct()
                .localCheckpoint(eager=True))
        cset = (cand.select(F.col("corpus_doc").alias(id_col)).distinct())
        csh = shingles(corpus.join(F.broadcast(cset), id_col, "left_semi"),
                       self.n, text_col, id_col)
        sa = csh.select(F.col("doc_id").alias("corpus_doc"), "sh")
        sb = bsh.select(F.col("doc_id").alias("batch_doc"), "sh")
        common = (cand.join(sa, "corpus_doc").join(sb, ["batch_doc", "sh"])
                  .groupBy("corpus_doc", "batch_doc", "na", "nb")
                  .agg(F.count("*").alias("common")))
        raw = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
        return (common.filter(raw >= F.lit(threshold))
                .select("corpus_doc", "batch_doc",
                        F.round(raw, 6).alias("jaccard")))

    def dedup_batch(self, batch: DataFrame, corpus: DataFrame,
                    threshold: float = 0.5, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
        """The ingest-time filter: batch rows minus those near-dup to the
        indexed corpus. Intra-batch dups are the batch's own concern —
        run minhash_keep_first on it first if needed."""
        dupes = (self.probe_pairs(batch, corpus, threshold, text_col,
                                  id_col)
                 .select(F.col("batch_doc").alias(id_col)).distinct())
        return batch.join(F.broadcast(dupes), id_col, "left_anti")
