"""Driver-gate rehearsal: every relational query must match its DuckDB
oracle SQL — row count, column names, and values (order-insensitive) — on
the driver's testdata. Mirrors the driver's sf0.01 comparison at sf0.001
for speed (sf0.01 is exercised by the driver itself)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_ocr_spark.relational import all_oracle_sql, all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

QUERIES = all_queries()
ORACLES = all_oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{SF_DIR}/{name}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="stable") \
        .reset_index(drop=True)


def test_every_query_has_oracle():
    assert set(ORACLES) <= set(QUERIES)
    # all currently-registered relational queries are SQL-expressible
    assert set(ORACLES) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(ddb.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count differs"
    for c in got.columns:
        if got[c].dtype.kind == "f" or want[c].dtype.kind == "f":
            a = got[c].astype(float).to_numpy()
            b = want[c].astype(float).to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            assert np.all(both_nan | np.isclose(a, b, rtol=0, atol=1e-9)), \
                f"{name}.{c}: float values differ"
        else:
            pd.testing.assert_series_equal(
                got[c], want[c].astype(got[c].dtype), check_names=False,
                obj=f"{name}.{c}")
