"""Simulates the driver's correctness gate: every queries() entry runs at
sf0.01 and must match its oracle_sql() DuckDB result — row count, column
names, and order-insensitive values (exact after the declared rounding)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return v


def _rows(df_pandas, cols):
    return sorted(tuple(_canon(r[c]) for c in cols)
                  for _, r in df_pandas.iterrows())


QUERY_NAMES = sorted(entrymod.queries().keys())


# Entries whose results are data-dependent in a way a STATIC oracle SQL
# string cannot mirror — EMPTY since round 5: the trained-quantizer
# entries (ivf_ann_trained, ivfpq_ann) now run in their exact-equivalence
# configuration (all lists probed / full rerank pool), where the trained
# centroids cancel out of the top-k and the brute-force kNN oracle
# applies verbatim. Kept as a mechanism for future genuinely
# non-SQL-expressible entries.
NO_ORACLE: set = set()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_vs_duckdb_oracle(name, spark, ddb):
    q = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    if name in NO_ORACLE:
        assert name not in sqls  # intentionally oracle-less, not forgotten
        a = q(spark, SF_DIR).toPandas()
        b = q(spark, SF_DIR).toPandas()
        cols = sorted(a.columns)
        assert len(a) > 0 and sorted(b.columns) == cols
        assert _rows(a, cols) == _rows(b, cols)  # deterministic
        return
    assert name in sqls, f"{name} missing oracle_sql"
    got = q(spark, SF_DIR).toPandas()
    want = ddb.execute(sqls[name]).fetchdf()
    got_cols = sorted(got.columns)
    want_cols = sorted(want.columns)
    assert got_cols == want_cols, (got_cols, want_cols)
    assert len(got) == len(want), f"rowcount {len(got)} != {len(want)}"
    g, w = _rows(got, got_cols), _rows(want, got_cols)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, mismatches[:5]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
