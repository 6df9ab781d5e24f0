"""Mirror of the driver's correctness gate: run every __spark_entry__
query at sf0.001 and compare row-count + order-insensitive values against
its DuckDB oracle."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "nan"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "canonical_id"}


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_vs_oracle(spark, ddb, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entrymod.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count {len(spark_rows)} vs {len(ddb_rows)}"
    assert _normalize(spark_rows, spark_cols) == _normalize(ddb_rows, ddb_cols), f"{name}: value mismatch"


@pytest.mark.parametrize("name", sorted(set(entrymod.queries()) - set(entrymod.oracle_sql())))
def test_rows_only_queries(spark, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    assert sdf.count() > 0
