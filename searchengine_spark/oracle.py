"""Pure-Python single-node reference model ("the oracle").

Implements the COMPLETE pipeline — extract → tokenize → lemmatize → tf/df →
BM25 → top-k → snippet — with no Spark, using the same text core the Spark
UDFs use. Every Spark result must be rank-identical to this model:
same doc_ids, BM25 scores equal to 1e-6, same snippet bytes.

Semantics sources (reference, /root/reference):
- tf per page:        services/LemmaSearch.java:33-56
- df:                 services/RecursiveSearch.java:150-161 (incremented once
                      per page; here recomputed as count-distinct-docs)
- stopword prune:     df/N > 0.95 skipped (services/SearchServiceImpl.java:161-163)
- rarest-first order: sort by df asc (SearchServiceImpl.java:166); ties by
                      lemma asc (OUR definition — reference order is unstable)
- AND intersection:   SearchServiceImpl.java:133-140
- ranking:            BM25 k1=1.2 b=0.75 (north_rule; replaces the
                      reference's Σtf/max normalization, kept as
                      relevance_mode="reference" for parity tests)
- result order:       (score desc, doc_id asc) — OUR deterministic tiebreak;
                      the reference sort (SearchServiceImpl.java:70) is
                      unstable on ties
- snippet:            services/SnippetSearch.java:14-105, including the
                      window-growing search, last-lemma relaxation (which
                      mutates the shared lemma list, :55-68) and <b>
                      highlighting with trailing space (:85-96)
- doc_id assignment:  position in (bucket(url), url) order, bucket =
                      int(md5(url)[:8],16) % n_buckets — deterministic and
                      cluster-reproducible (SURVEY.md §7 hard-points)
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

from .functions.text_core import (
    extract_text,
    extract_title,
    is_query_valid,
    split_to_lemmas,
    tokenize,
    word_to_lemma,
)

BM25_K1 = 1.2
BM25_B = 0.75
STOPWORD_DF_RATIO = 0.95  # SearchServiceImpl.java:161
SNIPPET_WINDOW = 20  # SnippetSearch.java:25
DEFAULT_LIMIT = 10  # templates/index.html:128
DEFAULT_DOC_BUCKETS = 64  # keep in sync with EngineConfig.doc_id_buckets


def url_bucket(url: str, n_buckets: int = DEFAULT_DOC_BUCKETS) -> int:
    """Deterministic shuffle bucket for doc-id assignment (md5-based so the
    Spark side can reproduce it with built-in md5())."""
    return int(hashlib.md5(url.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def site_of(url: str) -> str:
    """Host prefix, the analog of the reference's site row (E6/J4)."""
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0]


def bm25_idf(n_docs: int, df: int) -> float:
    """Lucene-style always-positive BM25 idf."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf: int, dl: int, avgdl: float, idf: float,
                    k1: float = BM25_K1, b: float = BM25_B) -> float:
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


@dataclass
class OracleIndex:
    """In-memory inverted index over an extracted corpus."""

    n_docs: int = 0
    avgdl: float = 0.0
    df: dict[str, int] = field(default_factory=dict)
    cf: dict[str, int] = field(default_factory=dict)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc_id: tf}
    dl: dict[int, int] = field(default_factory=dict)
    docs: dict[int, dict] = field(default_factory=dict)  # doc_id -> {url, site, title, text}


def assign_doc_ids(urls: list[str], n_buckets: int = DEFAULT_DOC_BUCKETS) -> dict[str, int]:
    """Canonical deterministic doc-id spec shared with the Spark engine."""
    ordered = sorted(urls, key=lambda u: (url_bucket(u, n_buckets), u))
    return {u: i for i, u in enumerate(ordered)}


def build_index(pages: list[dict], n_buckets: int = DEFAULT_DOC_BUCKETS) -> OracleIndex:
    """pages: [{url, html (str|bytes), text?, lang?}] → full index.

    Extracted text is recomputed from html (byte-identical invariant);
    when html is absent the provided text is used as-is.
    """
    idx = OracleIndex()
    ids = assign_doc_ids([p["url"] for p in pages], n_buckets)
    total_len = 0
    for p in pages:
        doc_id = ids[p["url"]]
        html = p.get("html")
        if isinstance(html, (bytes, bytearray)):
            html = html.decode("utf-8")
        text = extract_text(html) if html is not None else p["text"]
        title = extract_title(html) if html is not None else ""
        tfs = split_to_lemmas(text)
        dl = sum(tfs.values())
        idx.docs[doc_id] = {
            "url": p["url"], "site": site_of(p["url"]), "title": title, "text": text,
        }
        idx.dl[doc_id] = dl
        total_len += dl
        for term, tf in tfs.items():
            idx.postings.setdefault(term, {})[doc_id] = tf
            idx.df[term] = idx.df.get(term, 0) + 1
            idx.cf[term] = idx.cf.get(term, 0) + tf
    idx.n_docs = len(pages)
    idx.avgdl = (total_len / idx.n_docs) if idx.n_docs else 0.0
    return idx


def analyze_query(idx: OracleIndex, query: str) -> list[str]:
    """Lemmatize, keep indexed terms, prune stopwords, order rarest-first
    (SearchServiceImpl.getLemmaList :153-168)."""
    lemmas = split_to_lemmas(query)
    kept = []
    for term in lemmas:
        df = idx.df.get(term)
        if df is None:
            continue
        if idx.n_docs and df / idx.n_docs > STOPWORD_DF_RATIO:
            continue
        kept.append(term)
    kept.sort(key=lambda t: (idx.df[t], t))
    return kept


def search(idx: OracleIndex, query: str, limit: int = DEFAULT_LIMIT,
           offset: int = 0, site: str | None = None,
           relevance_mode: str = "bm25", with_snippets: bool = True) -> dict:
    """Full search response: {result, count?, data?, error?}.

    relevance_mode="bm25" (ours, north_rule) or "reference" (Σtf / max —
    SearchServiceImpl.getPageListWithRelevance :96-115) for parity tests.
    """
    if not query:
        return {"result": False, "error": "Задан пустой поисковый запрос"}
    if not is_query_valid(query):
        return {"result": False, "error": "Запрос должен быть на русском языке"}
    terms = analyze_query(idx, query)
    if not terms:
        return {"result": False, "error": "Указанная страница не найдена"}

    # AND intersection, rarest term first (J3/O1)
    candidates = set(idx.postings[terms[0]])
    for t in terms[1:]:
        candidates &= idx.postings[t].keys()
    if site is not None:
        candidates = {d for d in candidates if idx.docs[d]["site"] == site}
    if not candidates:
        return {"result": False, "error": "Указанная страница не найдена"}

    scores: dict[int, float] = {}
    for d in candidates:
        if relevance_mode == "bm25":
            s = 0.0
            for t in terms:
                s += bm25_term_score(idx.postings[t][d], idx.dl[d], idx.avgdl,
                                     bm25_idf(idx.n_docs, idx.df[t]))
        else:
            s = float(sum(idx.postings[t][d] for t in terms))
        scores[d] = s
    if relevance_mode == "reference":
        mx = max(scores.values())
        scores = {d: s / mx for d, s in scores.items()}

    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    page = ranked[offset:offset + limit]
    data = []
    for rank, (d, s) in enumerate(page, start=offset + 1):
        doc = idx.docs[d]
        row = {
            "rank": rank,
            "doc_id": d,
            "site": doc["site"],
            # SearchData.siteName (SearchServiceImpl.java:61-62): the
            # configured display name; our input table has no site registry,
            # so the host doubles as the name (documented W4 mapping)
            "site_name": doc["site"],
            "uri": doc["url"],
            "title": doc["title"],
            "score": s,
        }
        if with_snippets:
            row["snippet"] = build_snippet(doc["text"], list(terms))
        data.append(row)
    return {"result": True, "count": len(candidates), "data": data}


# --- Snippets (SnippetSearch.java:14-105, exact port of semantics) -----------


def build_snippet(text: str, query_lemmas: list[str]) -> str:
    """20-word window containing all query lemmas (growing window, last-lemma
    relaxation), query words wrapped in <b>, trailing space preserved.
    query_lemmas must be rarest-first (the relaxation drops the LAST =
    most frequent, SnippetSearch.java:60-61); the list is mutated, and the
    mutated list drives highlighting — mirroring the reference aliasing."""
    words = tokenize(text)
    norms = [word_to_lemma(w) for w in words]
    n = len(words)
    snippet_size = min(SNIPPET_WINDOW, n)

    lemmas = query_lemmas  # alias, mutated by relaxation like the reference

    def find_for(lemma_list: list[str]) -> tuple[int, int] | None:
        for box in range(len(lemma_list), snippet_size):
            for i in range(0, n - box):
                window = norms[i:i + box]
                if all(l in window for l in lemma_list):
                    return (i, i + box)
        return None

    pos = None
    for _ in range(len(list(lemmas))):
        pos = find_for(lemmas)
        if pos is not None:
            break
        lemmas.pop()  # drop most frequent (SnippetSearch.java:60-61)

    if pos is None:
        start, end = 0, SNIPPET_WINDOW
    else:
        box = pos[1] - pos[0] + 1
        if pos[0] <= 10 - box // 2:
            start, end = 0, SNIPPET_WINDOW
        elif pos[1] >= n - 11 + box // 2:
            start, end = n - 21, n - 1
        else:
            start, end = pos[0] - 10 + box // 2, pos[1] + 10 - box // 2
    # clamp (the reference would IndexOutOfBounds on tiny docs; we define
    # clamping as the behavior — documented non-goal)
    start, end = max(0, start), min(end, n - 1)

    out = []
    qset = set(lemmas)
    for i in range(start, end + 1):
        if norms[i] in qset:
            out.append(f"<b>{words[i]}</b> ")
        else:
            out.append(words[i] + " ")
    return "".join(out)
