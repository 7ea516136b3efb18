"""THE correctness gate: Spark engine vs pure-Python oracle, rank-identical
top-k (doc ids, BM25 scores to 1e-6, snippets byte-identical) over the full
reference query set (north_rule)."""

import pytest

from searchengine_spark import oracle as O
from searchengine_spark.sources.queryset import reference_queries


@pytest.mark.parametrize("q", reference_queries(), ids=lambda q: f"q{q['query_id']}")
def test_rank_identity(q, built_engine, oracle_index):
    want = O.search(oracle_index, q["query"], limit=q["k"], offset=q["offset"],
                    site=q["site"])
    got = built_engine.search(q["query"], limit=q["k"], offset=q["offset"],
                              site=q["site"])
    assert got["result"] == want["result"], (got, want)
    if not want["result"]:
        assert got["error"] == want["error"]
        return
    assert got["count"] == want["count"]
    assert len(got["data"]) == len(want["data"])
    for g, w in zip(got["data"], want["data"]):
        assert g["doc_id"] == w["doc_id"]
        assert g["score"] == pytest.approx(w["score"], abs=1e-6)
        assert g["uri"] == w["uri"]
        assert g["title"] == w["title"]
        assert g["snippet"] == w["snippet"]
        assert g["rank"] == w["rank"]


def test_reference_relevance_mode_parity(built_engine, oracle_index):
    from searchengine_spark.functions.lexicon import synthetic_lemmas

    sl = synthetic_lemmas()
    q = f"{sl[8]} {sl[21]}"
    want = O.search(oracle_index, q, limit=10, relevance_mode="reference")
    got = built_engine.search(q, limit=10, relevance_mode="reference")
    assert got["count"] == want["count"]
    for g, w in zip(got["data"], want["data"]):
        assert g["doc_id"] == w["doc_id"]
        assert g["score"] == pytest.approx(w["score"], abs=1e-6)


def test_statistics(built_engine, oracle_index):
    stats = built_engine.statistics()
    assert stats["result"]
    total = stats["statistics"]["total"]
    assert total["pages"] == oracle_index.n_docs
    by_site = {}
    for d in oracle_index.docs.values():
        by_site[d["site"]] = by_site.get(d["site"], 0) + 1
    got_sites = {d["site"]: d["pages"] for d in stats["statistics"]["detailed"]}
    assert got_sites == by_site
