"""WAND == exhaustive scoring on randomized corpora (SURVEY.md §5 property
test). The partition-local algorithm in plans/wand.py is re-implemented
nowhere here — we drive the real _wand_task against brute-force scoring of
randomly generated posting sets, covering multi-range, multi-shard, tied
scores, and k larger than the result set."""

import heapq
import random

import pandas as pd
import pytest

from searchengine_spark.operators.postings import (bm25_tfpart,
                                                   encode_posting_block)
from searchengine_spark.plans.wand import _wand_task

K1, B = 1.2, 0.75


def _make_blocks(postings_by_term, block_size, range_w, head_terms):
    """postings_by_term: {term: {doc_id: (tf, dl)}} -> block rows df."""
    rows = []
    avgdl = 100.0
    for term, pl in postings_by_term.items():
        items = sorted(pl.items())
        if term in head_terms:
            shards = {}
            for d, v in items:
                shards.setdefault(d // range_w, []).append((d, v))
        else:
            shards = {0: items}
        for sh, run in shards.items():
            for bi in range(0, len(run), block_size):
                chunk = run[bi:bi + block_size]
                ds = [d for d, _ in chunk]
                ts = [v[0] for _, v in chunk]
                ls = [v[1] for _, v in chunk]
                docs_bin, tfs_bin, dls_bin = encode_posting_block(ds, ts, ls)
                rows.append({
                    "term": term, "shard": sh, "block_id": bi,
                    "n": len(ds), "doc_min": ds[0], "doc_max": ds[-1],
                    "max_tf": max(ts),
                    "max_tfpart": max(bm25_tfpart(a, b_, avgdl, K1, B)
                                      for a, b_ in zip(ts, ls)),
                    "docs_bin": docs_bin, "tfs_bin": tfs_bin,
                    "dls_bin": dls_bin,
                })
    return pd.DataFrame(rows), avgdl


def _exhaustive(postings_by_term, terms, idf, avgdl, kprime):
    docs = None
    for t in terms:
        s = set(postings_by_term[t])
        docs = s if docs is None else docs & s
    scored = []
    for d in docs or ():
        s = sum(idf[t] * bm25_tfpart(postings_by_term[t][d][0],
                                     postings_by_term[t][d][1], avgdl, K1, B)
                for t in terms)
        scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:kprime]


@pytest.mark.parametrize("seed", range(12))
def test_wand_task_equals_exhaustive(seed):
    rng = random.Random(seed)
    n_docs = rng.choice([50, 400, 3000])
    range_w = rng.choice([64, 256, 1000])
    block_size = rng.choice([4, 16, 128])
    n_terms = rng.randint(1, 4)
    terms = [f"t{i}" for i in range(n_terms)]
    head_terms = {t for t in terms if rng.random() < 0.5}

    postings_by_term = {}
    for t in terms:
        df_t = rng.randint(1, max(1, n_docs // rng.choice([1, 2, 10])))
        docs = rng.sample(range(n_docs), min(df_t, n_docs))
        postings_by_term[t] = {
            d: (rng.randint(1, 5),
                rng.choice([50, 100, 100, 200]))  # repeated dl => score ties
            for d in docs
        }

    blocks, avgdl = _make_blocks(postings_by_term, block_size, range_w,
                                 head_terms)
    n = n_docs
    idf = {t: max(0.01, 1.0 + (n - len(postings_by_term[t])) / (1 + len(postings_by_term[t])))
           for t in terms}
    term_order = sorted(terms, key=lambda t: len(postings_by_term[t]))
    kprime = rng.choice([1, 5, 100])

    # emulate the driver split: blocks -> covered ranges -> task groups
    rows = []
    for _, r in blocks.iterrows():
        for rid in range(int(r["doc_min"]) // range_w,
                         int(r["doc_max"]) // range_w + 1):
            rr = dict(r)
            rr["range_id"] = rid
            rows.append(rr)
    full = pd.DataFrame(rows)
    n_tasks = rng.choice([1, 3])
    partials = []
    for g in range(n_tasks):
        pdf = full[full["range_id"] % n_tasks == g]
        if len(pdf):
            out = _wand_task(pdf, term_order=term_order, idf=idf,
                             avgdl=avgdl, k1=K1, b=B, kprime=kprime,
                             range_w=range_w)
            partials.append(out)
    got = []
    if partials:
        allp = pd.concat(partials)
        # driver-side merge: max-dedup + (score desc, doc_id asc) top-k
        best = allp.groupby("doc_id")["score"].max().reset_index()
        got = sorted(((int(r["doc_id"]), float(r["score"]))
                      for _, r in best.iterrows()),
                     key=lambda x: (-x[1], x[0]))[:kprime]

    want = _exhaustive(postings_by_term, term_order, idf, avgdl, kprime)
    assert [d for d, _ in got] == [d for d, _ in want], (seed, got, want)
    for (_, sg), (_, sw) in zip(got, want):
        assert sg == pytest.approx(sw, abs=1e-9)
