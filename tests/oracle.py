"""Local re-implementation of the driver's DuckDB-oracle compare.

Runs a Spark query callable and its oracle SQL side by side, then compares
row count, schema (column names), and an order-insensitive value hash with
columns sorted by name — the same contract described for CORRECTNESS_r{N}.json.
Used by tests to catch mismatches before the driver does.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    rows = []
    for tup in df.itertuples(index=False, name=None):
        canon_row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(round(v, 6))
            elif hasattr(v, "isoformat"):
                canon_row.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__module__ == "numpy" and getattr(v, "ndim", 0) > 0:
                canon_row.append(tuple(v))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    rows.sort(key=repr)
    return rows


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "q") -> None:
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()
    assert len(actual) == len(expected), f"{name}: row count {len(actual)} != {len(expected)}"
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: columns {sorted(actual.columns)} != {sorted(expected.columns)}"
    )
    a, e = _canon(actual), _canon(expected)
    mism = [i for i, (x, y) in enumerate(zip(a, e)) if x != y]
    assert not mism, f"{name}: first value mismatch at sorted-row {mism[0]}:\n spark={a[mism[0]]}\n duck ={e[mism[0]]}"
