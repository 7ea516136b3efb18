"""Reference query set (FIXTURES.md §2) — deterministic, covers every query
path of the reference engine. The rank-identity gate runs each of these
through BOTH the oracle and the Spark engine and requires identical top-k
(doc ids + scores to 1e-6) and snippets."""

from __future__ import annotations

from ..functions.lexicon import synthetic_lemmas
from ..sources.corpus import head_terms


def reference_queries() -> list[dict]:
    """~40 queries: {query_id, query, site, k, offset, expect_error?}."""
    sl = synthetic_lemmas()
    ht = head_terms()
    lex_forms = {  # inflected surfaces exercising lemmatization
        "inflected_noun": sl[20][:-1] + "ами",   # paradigm NOUN form
        "inflected_verb": None,
    }
    qs: list[dict] = []

    def add(query, site=None, k=10, offset=0):
        qs.append({"query_id": len(qs), "query": query, "site": site,
                   "k": k, "offset": offset})

    # golden-text queries (reference pytest anchors)
    add("леопард")
    add("леопард обитает")
    add("появление леопарда в Осетии")
    add("междометие речь")
    add("французских булок")
    add("повторное северного кавказа")
    # single mid-frequency and rare terms
    for i in (8, 15, 40, 120, 400, 900, 1500):
        if i < len(sl):
            add(sl[i])
    # multi-term AND with non-empty intersections
    add(f"{sl[10]} {sl[30]}")
    add(f"{sl[6]} {sl[7]} {sl[9]}")
    add(f"{sl[12]} {sl[25]} {sl[55]} {sl[80]}")
    add(f"{sl[5]} {sl[300]}")
    # inflected forms (lemmatizer must normalize)
    if lex_forms["inflected_noun"]:
        add(lex_forms["inflected_noun"])
    # query containing a stopword (must be pruned, rest still match)
    add(f"{ht[0]} {sl[18]}")
    add(f"{ht[1]} {sl[22]} {sl[61]}")
    # all-stopword query => empty-result error path
    add(" ".join(ht))
    # term absent from corpus
    add("этогословаточнонет")
    add(f"{sl[9]} этогословаточнонет")  # unknown word skipped, rest match
    # empty + non-Russian (validation errors)
    add("")
    add("hello world")
    # site-filtered
    add(sl[7], site="site01.example")
    add(f"{sl[6]} {sl[14]}", site="site03.example")
    add(sl[9], site="site07.example")
    # pagination / tie-break exercise (head-adjacent common terms)
    add(sl[5], k=10, offset=0)
    add(sl[5], k=10, offset=10)
    add(sl[5], k=10, offset=40)
    add(sl[6], k=25, offset=5)
    # terms that rarely co-occur in one 20-word window (snippet relaxation)
    add(f"{sl[200]} {sl[210]}")
    add(f"{sl[150]} {sl[400]} {sl[700]}")
    # mixed punctuation/digits (charset rule strips them)
    add(f"{sl[11]}, 1905 {sl[33]}!")
    return qs
