"""Oracle model invariants over the deterministic fixture corpus."""

import pytest

from searchengine_spark import oracle as O
from searchengine_spark.functions.lexicon import synthetic_lemmas
from searchengine_spark.sources.corpus import gen_pages_local, head_terms

N_DOCS = 300


@pytest.fixture(scope="module")
def idx():
    return O.build_index(gen_pages_local(N_DOCS))


def test_corpus_is_deterministic():
    a = gen_pages_local(50)
    b = gen_pages_local(50)
    assert a == b


def test_doc_ids_dense_and_deterministic(idx):
    ids = sorted(idx.docs)
    assert ids == list(range(N_DOCS))
    urls = [idx.docs[d]["url"] for d in ids]
    remap = O.assign_doc_ids(list(reversed(urls)))  # order-independent
    assert all(remap[u] == d for d, u in zip(ids, urls))


def test_head_terms_are_stopwords(idx):
    for h in head_terms():
        assert idx.df[h] / idx.n_docs > O.STOPWORD_DF_RATIO, h
    # all-stopword query => "not found" error path
    r = O.search(idx, " ".join(head_terms()))
    assert r["result"] is False


def test_query_validation_paths(idx):
    assert O.search(idx, "")["error"] == "Задан пустой поисковый запрос"
    assert O.search(idx, "english only")["error"] == "Запрос должен быть на русском языке"
    assert O.search(idx, "этогословавкорпусенет")["result"] is False


def test_golden_doc_search(idx):
    r = O.search(idx, "леопард обитает")
    assert r["result"] and r["count"] == 1
    hit = r["data"][0]
    assert "леопарда" in hit["snippet"] and "<b>" in hit["snippet"]


def test_and_semantics(idx):
    sl = synthetic_lemmas()
    t1, t2 = sl[10], sl[50]
    both = O.search(idx, f"{t1} {t2}", limit=1000)
    only1 = {d for d in idx.postings[t1]}
    only2 = {d for d in idx.postings[t2]}
    assert both["count"] == len(only1 & only2)


def test_ranking_deterministic_and_sorted(idx):
    sl = synthetic_lemmas()
    r = O.search(idx, sl[10], limit=50)
    rows = r["data"]
    keys = [(-x["score"], x["doc_id"]) for x in rows]
    assert keys == sorted(keys)


def test_site_filter(idx):
    sl = synthetic_lemmas()
    r = O.search(idx, sl[5], limit=1000, site="site01.example")
    assert r["result"]
    assert all(x["site"] == "site01.example" for x in r["data"])


def test_pagination(idx):
    sl = synthetic_lemmas()
    full = O.search(idx, sl[5], limit=30, offset=0)["data"]
    page2 = O.search(idx, sl[5], limit=10, offset=10)["data"]
    assert [x["doc_id"] for x in page2] == [x["doc_id"] for x in full[10:20]]


def test_reference_relevance_mode(idx):
    # reference mode: Σtf normalized by max (SearchServiceImpl.java:96-115)
    sl = synthetic_lemmas()
    r = O.search(idx, sl[8], limit=5, relevance_mode="reference")
    assert r["result"]
    assert max(x["score"] for x in r["data"]) == pytest.approx(1.0)
