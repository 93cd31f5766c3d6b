"""Differential test: every queries() entry vs its DuckDB oracle, mimicking
the driver's comparison — row count, column names, and order-insensitive
value equality (columns sorted by name, rows sorted by all columns).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("FR_PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(df):
    """Sort columns by name and rows by values — order-insensitive compare."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


ALL_QUERIES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, con, name):
    fn = entry_mod.queries()[name]
    got = fn(spark, SF_DIR).toPandas()
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert len(got) >= 0  # rows-only check, like the driver's
        return
    want = con.sql(oracles[name]).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {got.columns} vs {want.columns}")
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"

    g, w = normalize(got), normalize(want)
    for col in g.columns:
        for i, (x, y) in enumerate(zip(g[col], w[col])):
            assert values_equal(x, y), (
                f"{name}: value mismatch col={col} row={i}: {x!r} vs {y!r}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["step", "matching_groups", "matching_group_rows"]
