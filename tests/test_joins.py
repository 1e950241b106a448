"""As-of join + range join (operators/joins.py).

Correctness against pandas merge_asof (the canonical as-of semantics) and
DuckDB ASOF JOIN / BETWEEN join as independent oracles; plan-shape checks
that the broadcast path broadcasts and both range strategies agree.
"""

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.operators import joins as M_j
from tests.oracle import compare, duckdb_con


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    return duckdb_con(oracle_sf_dir)


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 1.0, 10),
            ("A", 3.0, 11),
            ("A", 7.0, 12),
            ("B", 2.0, 20),
            ("B", 2.5, 21),
            ("C", 5.0, 30),  # no quotes for C
        ],
        ["sym", "t", "qty"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", 0.5, 99.0),
            ("A", 3.0, 101.0),  # exact-match tie with trade t=3
            ("A", 6.0, 102.0),
            ("B", 2.4, 200.0),
        ],
        ["sym", "t", "px"],
    )
    return trades, quotes


def _pandas_asof(trades, quotes, direction="backward", allow_exact=True, tolerance=None):
    tp = trades.toPandas().sort_values("t")
    qp = quotes.toPandas().sort_values("t")
    kwargs = dict(on="t", by="sym", direction=direction, allow_exact_matches=allow_exact)
    if tolerance is not None:
        kwargs["tolerance"] = tolerance
    return pd.merge_asof(tp, qp, **kwargs).sort_values(["sym", "t"]).reset_index(drop=True)


@pytest.mark.parametrize(
    "direction,allow_exact",
    [
        ("backward", True),
        ("backward", False),
        ("forward", True),
        ("forward", False),
        ("nearest", True),
        ("nearest", False),
    ],
)
def test_asof_matches_pandas_merge_asof(spark, direction, allow_exact):
    trades, quotes = _trades_quotes(spark)
    got = (
        M_j.asof_join(
            trades, quotes, on="t", by="sym", direction=direction, allow_exact_matches=allow_exact
        )
        .orderBy("sym", "t")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = _pandas_asof(trades, quotes, direction=direction, allow_exact=allow_exact)
    assert list(got["px"].fillna(-1)) == list(exp["px"].fillna(-1)), (direction, allow_exact)


def test_asof_nearest_tie_and_plan(spark):
    """Equidistant candidates resolve to the backward match (pandas tie
    rule); the nearest plan stays join-free with ONE exchange (the second
    window direction reuses the hash partitioning, adds only a sort)."""
    left = spark.createDataFrame([("a", 5.0, 1)], ["sym", "t", "id"])
    right = spark.createDataFrame([("a", 3.0, 100.0), ("a", 7.0, 200.0)], ["sym", "t", "px"])
    out = M_j.asof_join(left, right, on="t", by="sym", direction="nearest").collect()
    assert out[0]["px"] == 100.0  # tie → backward

    plan = (
        M_j.asof_join(left, right, on="t", by="sym", direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_nearest_tolerance(spark):
    trades, quotes = _trades_quotes(spark)
    got = (
        M_j.asof_join(trades, quotes, on="t", by="sym", direction="nearest", tolerance=F.lit(1.0))
        .orderBy("sym", "t")
        .toPandas()
    )
    exp = _pandas_asof(trades, quotes, direction="nearest", tolerance=1.0)
    assert list(got["px"].fillna(-1)) == list(exp["px"].fillna(-1))


def test_asof_tolerance(spark):
    trades, quotes = _trades_quotes(spark)
    got = (
        M_j.asof_join(trades, quotes, on="t", by="sym", tolerance=F.lit(1.5))
        .orderBy("sym", "t")
        .toPandas()
    )
    exp = _pandas_asof(trades, quotes, tolerance=1.5)
    assert list(got["px"].fillna(-1)) == list(exp["px"].fillna(-1))


def test_asof_no_by_and_suffix(spark):
    left = spark.createDataFrame([(1.0, "x"), (5.0, "y")], ["t", "v"])
    right = spark.createDataFrame([(0.0, "r0"), (4.0, "r4")], ["t", "v"])
    out = M_j.asof_join(left, right, on="t").orderBy("t").collect()
    assert [r["v_asof"] for r in out] == ["r0", "r4"]
    assert [r["v"] for r in out] == ["x", "y"]


def test_asof_single_shuffle_no_join_node(spark):
    """The as-of plan is union+window: no join operator, ONE exchange."""
    trades, quotes = _trades_quotes(spark)
    plan = M_j.asof_join(trades, quotes, on="t", by="sym")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_events_oracle(spark, oracle_sf_dir, con):
    """Purchases as-of their user's latest preceding view — DuckDB ASOF JOIN."""
    ev = load_table(spark, oracle_sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select("user_id", "ts", "event_id", "value")
    views = ev.filter("event_type = 'view'").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    out = M_j.asof_join(purchases, views, on="ts", by="user_id").select(
        "user_id", "event_id", F.round("value", 6).alias("purchase_value"),
        F.round("view_value", 6).alias("view_value"),
    )
    sql = """
    SELECT p.user_id, p.event_id, round(p.value, 6) AS purchase_value,
           round(v.value, 6) AS view_value
    FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type='purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type='view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """
    compare(out, con, sql, "asof_events")


def _bands(spark):
    rows = [Row(band=i, lo=float(i * 50), hi=float(i * 50 + 49.999999)) for i in range(10)]
    return spark.createDataFrame(rows)


def test_range_join_strategies_agree(spark, oracle_sf_dir):
    ev = load_table(spark, oracle_sf_dir, "events").select("event_id", "value")
    bands = _bands(spark)
    a = M_j.range_join(ev, bands, "value", "lo", "hi", mode="broadcast")
    b = M_j.range_join(ev, bands, "value", "lo", "hi", mode="binned", bin_width=37.0)
    ca = {(r["event_id"], r["band"]) for r in a.collect()}
    cb = {(r["event_id"], r["band"]) for r in b.collect()}
    assert ca == cb and len(ca) > 0


def test_range_join_broadcast_in_plan(spark, oracle_sf_dir):
    ev = load_table(spark, oracle_sf_dir, "events").select("event_id", "value")
    plan = (
        M_j.range_join(ev, _bands(spark), "value", "lo", "hi", mode="broadcast")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan


def test_range_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 500.0)], ["id", "v"])
    right = spark.createDataFrame([(0.0, 10.0, "low")], ["lo", "hi", "label"])
    out = {r["id"]: r["label"] for r in M_j.range_join(left, right, "v", "lo", "hi", how="left").collect()}
    assert out == {1: "low", 2: None}
    out2 = {
        r["id"]: r["label"]
        for r in M_j.range_join(left, right, "v", "lo", "hi", how="left", mode="binned", bin_width=10.0).collect()
    }
    assert out2 == out


def test_range_join_left_null_payload_not_duplicated(spark):
    """Regression: binned left join must not re-emit a MATCHED left row whose
    payload contains a null (the old anti-join on all left columns used
    non-null-safe equality, so such a row failed to match itself)."""
    left = spark.createDataFrame(
        [(1, 5.0, None), (2, 500.0, "y"), (3, 7.0, "z")], "id int, v double, payload string"
    )
    right = spark.createDataFrame([(0.0, 10.0, "low")], ["lo", "hi", "label"])
    for mode in ("broadcast", "binned"):
        rows = M_j.range_join(left, right, "v", "lo", "hi", how="left", mode=mode, bin_width=10.0).collect()
        assert len(rows) == 3
        by_id = {r["id"]: (r["payload"], r["label"]) for r in rows}
        assert by_id == {1: (None, "low"), 2: ("y", None), 3: ("z", "low")}


def test_range_join_by_keys(spark):
    left = spark.createDataFrame([("a", 5.0), ("b", 5.0)], ["k", "v"])
    right = spark.createDataFrame([("a", 0.0, 10.0, "ra"), ("b", 6.0, 10.0, "rb")], ["k", "lo", "hi", "lbl"])
    for mode in ("broadcast", "binned"):
        rows = M_j.range_join(left, right, "v", "lo", "hi", by=["k"], mode=mode, bin_width=10.0).collect()
        assert [(r["k"], r["lbl"]) for r in rows] == [("a", "ra")]
        assert "k" in rows[0].asDict() and "__r_k" not in rows[0].asDict()


def test_range_join_oracle(spark, oracle_sf_dir, con):
    ev = load_table(spark, oracle_sf_dir, "events").select("event_id", "value")
    out = (
        M_j.range_join(ev, _bands(spark), "value", "lo", "hi")
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )
    sql = """
    WITH bands AS (SELECT i AS band, i*50.0 AS lo, i*50.0+49.999999 AS hi FROM range(10) t(i))
    SELECT band, count(*) AS n, round(avg(value), 6) AS avg_value
    FROM events JOIN bands ON value BETWEEN lo AND hi
    GROUP BY band
    """
    compare(out, con, sql, "range_bands")


def test_asof_empty_right(spark):
    left = spark.createDataFrame([(1.0, "x")], ["t", "v"])
    right = spark.createDataFrame([], "t double, p string")
    out = M_j.asof_join(left, right, on="t").collect()
    assert len(out) == 1 and out[0]["p"] is None


def test_range_join_empty_right(spark):
    left = spark.createDataFrame([(1, 5.0)], ["id", "v"])
    right = spark.createDataFrame([], "lo double, hi double, label string")
    assert M_j.range_join(left, right, "v", "lo", "hi").count() == 0
    got = M_j.range_join(left, right, "v", "lo", "hi", how="left").collect()
    assert len(got) == 1 and got[0]["label"] is None


def test_asof_timestamp_interval_tolerance(spark, oracle_sf_dir):
    """Timestamp on-column with an INTERVAL tolerance: matches farther than
    the tolerance null out (pandas merge_asof tolerance semantics)."""
    ev = load_table(spark, oracle_sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select("user_id", "ts", "event_id")
    views = ev.filter("event_type = 'view'").select("user_id", "ts", F.col("value").alias("view_value"))
    out = M_j.asof_join(
        purchases, views, on="ts", by="user_id", tolerance="INTERVAL 10 MINUTES"
    )
    loose = M_j.asof_join(purchases, views, on="ts", by="user_id")
    n_tol = out.filter("view_value IS NOT NULL").count()
    n_all = loose.filter("view_value IS NOT NULL").count()
    assert 0 < n_tol < n_all  # tolerance must null out some distant matches
    # every surviving match is within the window (re-derive the matched ts)
    tp = out.filter("view_value IS NOT NULL").select("user_id", "ts", "view_value")
    joined = tp.join(views.withColumnRenamed("ts", "vts"), ["user_id", "view_value"])
    within = joined.filter("vts <= ts AND ts - vts <= INTERVAL 10 MINUTES").count()
    assert within == joined.filter("vts <= ts").count()
