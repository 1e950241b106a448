"""Driver-contract simulation: every queries() entry runs at sf0.01; entries
with oracle SQL must hash-match DuckDB, the rest must at least produce rows
with a stable schema."""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import compare, duckdb_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

#: r16 slow tier (r15 VERDICT #1): rows whose check is minutes-long — the
#: DuckDB replay of a recursive-CTE clustering chain (curate_md5_docs
#: ~142 s, dedup_cluster_docs ~25 s, ngram_jaccard_docs ~13 s: the oracle
#: side, not Spark) or a double determinism run of a six-arm grid build
#: (ivf_recall_grid). Default-tier coverage for the same operators:
#: test_curate.test_curate_md5_buckets_engine, the CC/bucket suites in
#: test_llm, minhash_pairs_docs/dedup_cluster oracle twins, and the IVF
#: recall-floor tests. The slow tier runs these same oracle compares via
#: `-m slow` at every round close.
_SLOW_ORACLE_ROWS = {
    "curate_md5_docs",
    "dedup_cluster_docs",
    "ngram_jaccard_docs",
    "ivf_recall_grid",
}


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    return duckdb_con(oracle_sf_dir)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE_ROWS else n
        for n in sorted(QUERIES)
    ],
)
def test_query(name, spark, oracle_sf_dir, con):
    out = QUERIES[name](spark, oracle_sf_dir)
    if name in ORACLES:
        compare(out, con, ORACLES[name], name)
    else:
        # rows-only check: runs, has stable schema, deterministic count
        c1 = out.count()
        c2 = QUERIES[name](spark, oracle_sf_dir).count()
        assert c1 == c2
