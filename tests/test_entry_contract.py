"""Driver-contract simulation: every queries() entry runs at sf0.01; entries
with oracle SQL must hash-match DuckDB, the rest must at least produce rows
with a stable schema."""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import compare, duckdb_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    return duckdb_con(oracle_sf_dir)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, oracle_sf_dir, con):
    out = QUERIES[name](spark, oracle_sf_dir)
    if name in ORACLES:
        compare(out, con, ORACLES[name], name)
    else:
        # rows-only check: runs, has stable schema, deterministic count
        c1 = out.count()
        c2 = QUERIES[name](spark, oracle_sf_dir).count()
        assert c1 == c2
