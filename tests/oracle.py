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


def _canon_value(v):
    """Type-strict canonicalization: int vs float is PRESERVED (tagged), because
    the driver's value-hash distinguishes 110 from 110.0 (round-1 lesson: DuckDB
    integer sum() -> HUGEINT -> float64 while Spark returns bigint)."""
    import numpy as np

    if v is None or (isinstance(v, (float, np.floating)) and math.isnan(v)) or v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        return ("f", round(float(v), 6))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or (type(v).__module__ == "numpy" and getattr(v, "ndim", 0) > 0):
        return tuple(_canon_value(x) for x in v)
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    rows = [tuple(_canon_value(v) for v in tup) for tup in df.itertuples(index=False, name=None)]
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
