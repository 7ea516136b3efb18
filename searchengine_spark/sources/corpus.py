"""Deterministic synthetic Common-Crawl-style pages corpus.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Every row is a pure function of (seed, row index) — generation is therefore
order-independent and can run either locally (pyarrow) or distributed
(spark.range(n).mapInPandas over the same per-row function) with identical
bytes. No wall-clock, no external data.

Corpus shape (FIXTURES.md §1):
- 8 sites (the reference's multi-site model, config/SitesList.java)
- vocabulary drawn from the in-repo lexicon (100% lemmatizer coverage)
- Zipf(s≈1.1) term distribution with HEAD_TERMS present in >95% of documents
  (exercises the stopword prune SearchServiceImpl.java:161 and the
  skew/salting path of the index build)
- log-normal doc lengths, 20–2000 tokens
- ~8% English docs (tokenized to nothing by the [^а-я\\s] rule)
- 4 documents embed the reference JUnit golden texts verbatim
  (LemmaSearchTests.java, IndexingServiceImplTests.java:186)
"""

from __future__ import annotations

import bisect
import math
import random
from datetime import datetime, timedelta, timezone
from functools import lru_cache

from ..functions.lexicon import DEFAULT_VOCAB_SIZE, build_lexicon, synthetic_lemmas
from ..functions.text_core import extract_text

DEFAULT_SEED = 42
N_SITES = 8
ZIPF_S = 1.1
N_HEAD_TERMS = 5          # designated >95%-df stopword lemmas
HEAD_TERM_PROB = 1.0      # every ru doc carries every head term => df/N>0.95
EN_FRACTION = 0.02
EPOCH = datetime(2024, 10, 16, tzinfo=timezone.utc)  # fixed; no wall clock

PAGES_SCHEMA_COLS = ["url", "warc_ts", "html", "text", "lang"]


def pages_schema():
    """The canonical page-batch schema (shared by gen_pages_spark and the
    streaming ingest file source, which must declare it up front)."""
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType, TimestampType)
    return StructType([
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ])

_EN_WORDS = ("the quick brown fox jumps over lazy dog search engine index "
             "query ranking shard partition merge block compress scale").split()

# The four reference golden texts, embedded verbatim (FIXTURES.md §1).
_GOLDEN_BODIES = [
    "появление леопарда в Осетии позволяет предположить, что леопард обитает",
    (
        "<ul><li>Междометие&#160;— это разнородный по составу синтаксический класс, стоящий вне "
        'деления слов по <a href="/wiki/%D0%A7%D0%B0%D1%81%D1%82%D0%B8">частям</a> речи.</li>\n'
        '<li>Междометия входят в систему частей речи, но стоят в ней изолированно'
        '<sup id="cite_ref-2" class="reference"><a href="#cite_note-2"><span class="cite-bracket">'
        "&#91;</span>2<span class=\"cite-bracket\">&#93;</span></a></sup>.</li>"
    ),
    "повторное обитает районам северного кавказа обитать район",
    "Съешь еще этих мягких французских булок да выпей чаю",
]


@lru_cache(maxsize=4)
def _zipf_cum(vocab_size: int) -> list[float]:
    weights = [1.0 / (k + 1) ** ZIPF_S for k in range(vocab_size)]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)
    return cum


@lru_cache(maxsize=4)
def head_terms(vocab_size: int = DEFAULT_VOCAB_SIZE) -> list[str]:
    """The designated >95%-df lemmas (skew + stopword-prune fixtures)."""
    return synthetic_lemmas(vocab_size)[:N_HEAD_TERMS]


def _sample_lemma_ids(rng: random.Random, n: int, vocab_size: int) -> list[int]:
    cum = _zipf_cum(vocab_size)
    return [bisect.bisect_left(cum, rng.random()) for _ in range(n)]


def _doc_length(rng: random.Random) -> int:
    # log-normal, clipped to [20, 2000]
    return max(20, min(2000, int(math.exp(rng.gauss(4.5, 0.9)))))


def gen_page(i: int, n_docs: int, seed: int = DEFAULT_SEED,
             vocab_size: int = DEFAULT_VOCAB_SIZE) -> dict:
    """Row i of the corpus — pure function of (seed, i, n_docs, vocab)."""
    rng = random.Random(f"{seed}:{i}")
    lex = build_lexicon(vocab_size)
    lemmas = synthetic_lemmas(vocab_size)
    site_id = i % N_SITES
    site = f"https://site{site_id:02d}.example"

    if i < len(_GOLDEN_BODIES):
        body = _GOLDEN_BODIES[i]
        title = f"Золотой документ {i}"
        lang = "ru"
    elif rng.random() < EN_FRACTION:
        n_tok = _doc_length(rng) // 4
        body = " ".join(rng.choice(_EN_WORDS) for _ in range(n_tok))
        title = "English page " + str(i)
        lang = "en"
    else:
        n_tok = _doc_length(rng)
        ids = _sample_lemma_ids(rng, n_tok, len(lemmas))
        words = []
        for lid in ids:
            forms = lex.forms_by_lemma[lemmas[lid]]
            words.append(forms[rng.randrange(len(forms))])
        # head terms present in >95% of docs regardless of Zipf draw
        for h in head_terms(vocab_size):
            if rng.random() < HEAD_TERM_PROB:
                words.insert(rng.randrange(len(words) + 1), h)
        # sentence-ish chunks with light markup + entities
        parts, j = [], 0
        while j < len(words):
            k = min(len(words), j + rng.randrange(6, 14))
            sent = " ".join(words[j:k]).capitalize() + "."
            if rng.random() < 0.15:
                sent = sent.replace(" ", "&#160;", 1)
            if rng.random() < 0.2:
                w0 = sent.split(" ", 1)
                sent = f'<a href="/l{j}">{w0[0]}</a> ' + (w0[1] if len(w0) > 1 else "")
            parts.append("<p>" + sent + "</p>")
            j = k
        body = "\n".join(parts)
        title = " ".join(words[:3]).capitalize()
        lang = "ru"

    html = (
        f"<html><head><title>{title}</title>"
        f"<script>var page={i};</script></head>"
        f"<body><!-- generated:{seed}:{i} -->{body}</body></html>"
    )
    text = extract_text(html)
    slug = f"doc-{i:08d}"
    return {
        "url": f"{site}/{slug}",
        "warc_ts": EPOCH + timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def gen_pages_local(n_docs: int, seed: int = DEFAULT_SEED,
                    vocab_size: int = DEFAULT_VOCAB_SIZE) -> list[dict]:
    return [gen_page(i, n_docs, seed, vocab_size) for i in range(n_docs)]


def write_pages_parquet(path: str, n_docs: int, seed: int = DEFAULT_SEED,
                        vocab_size: int = DEFAULT_VOCAB_SIZE) -> None:
    """Local (driver-side) parquet writer for small fixture corpora."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = gen_pages_local(n_docs, seed, vocab_size)
    table = pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })
    pq.write_table(table, path)


def gen_pages_spark(spark, n_docs: int, seed: int = DEFAULT_SEED,
                    vocab_size: int = DEFAULT_VOCAB_SIZE, partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas over gen_page.

    Scales linearly with executors (each row independent); identical bytes to
    gen_pages_local for the same (seed, n_docs, vocab_size).
    """
    import pandas as pd

    from .deploy import ship_package

    ship_package(spark)

    schema = pages_schema()

    def gen(batches):
        for pdf in batches:
            rows = [gen_page(int(i), n_docs, seed, vocab_size) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=PAGES_SCHEMA_COLS)

    rng_df = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=schema)
