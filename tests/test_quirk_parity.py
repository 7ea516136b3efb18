"""Parity-of-quirks pins (SURVEY.md §5): reference bugs we intentionally do
NOT replicate, each asserted on a fixture where the two behaviors actually
differ — so the documented divergence is a tested fact, not a comment.

- trim-before-score: SearchServiceImpl.trimToLimit (:142-151, called at :50)
  slices the candidate page list BEFORE relevance is computed, so with
  limit < match-count the reference ranks an arbitrary subset and can drop
  the best-scoring page entirely. This engine scores first, then takes
  top-k (plans/query.py — TakeOrderedAndProject).
- cross-site df contamination: RecursiveSearch.java:150-161 increments
  lemma frequency via lemmaRepository.findByLemma(:156), which ignores
  site_id even though Lemma rows are per-site — a lemma seen on two sites
  accumulates all increments into whichever site's row is found first, and
  the other site's lemma accounting loses it. This engine's per-site stats
  are computed from each site's own postings (plans/statistics.py).
"""

import pytest

# a fixture term with ~80 matches whose best-scoring doc is far from the
# low end of the doc_id order (verified by the precondition asserts below,
# so a corpus change can't silently make the test vacuous)
MANY_MATCH_QUERY = "педешоый"
LIMIT = 3


def test_score_then_trim_not_trim_then_score(built_engine):
    full = built_engine.search(MANY_MATCH_QUERY, limit=1000,
                               with_snippets=False)
    assert full["result"] and full["count"] > 10 * LIMIT
    ranked_ids = [d["doc_id"] for d in full["data"]]

    # the reference iterates candidate pages in repository order (doc_id)
    # and trims to [offset, limit) BEFORE scoring — simulate that slice
    ref_slice = set(sorted(ranked_ids)[:LIMIT])
    # precondition: on this fixture the slice and the true top-k disagree
    assert ranked_ids[0] not in ref_slice

    got = built_engine.search(MANY_MATCH_QUERY, limit=LIMIT,
                              with_snippets=False)
    got_ids = [d["doc_id"] for d in got["data"]]
    # ours: the limited result IS the prefix of the full ranking (score
    # first, then trim) — in particular it contains the best-scoring doc
    assert got_ids == ranked_ids[:LIMIT]
    assert got_ids[0] == ranked_ids[0]
    # and the reported count is the full match count, not the page size
    assert got["count"] == full["count"]
    # the divergence is real: the reference's pre-score slice differs
    assert set(got_ids) != ref_slice


def test_per_site_lemma_counts_not_contaminated(built_engine, oracle_index):
    # find a lemma present on >= 2 sites — the contamination fixture
    site_of = {d: v["site"] for d, v in oracle_index.docs.items()}
    shared = None
    for t, pl in oracle_index.postings.items():
        sites = {site_of[d] for d in pl}
        if len(sites) >= 2:
            shared, shared_sites = t, sites
            break
    assert shared is not None, "fixture must contain a cross-site lemma"

    per_site = {d["site"]: d["lemmas"]
                for d in built_engine.statistics()["statistics"]["detailed"]}
    # true per-site distinct-lemma counts from each site's own postings
    want = {}
    for t, pl in oracle_index.postings.items():
        for d in pl:
            want.setdefault(site_of[d], set()).add(t)
    want_counts = {s: len(v) for s, v in want.items()}
    assert per_site == want_counts

    # the contaminated accounting (findByLemma ignoring site) credits a
    # shared lemma to ONE site only; ours counts it for every site it
    # appears on, so summing per-site counts exceeds the global distinct
    # count exactly when lemmas are shared — assert that inequality holds
    # on this fixture (i.e. the two accountings would disagree here)
    global_distinct = len(oracle_index.postings)
    assert sum(want_counts.values()) > global_distinct
    for s in shared_sites:
        assert shared in want[s]
