"""Skew mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these utilities cover the two cases it does not:

- ``salted_agg``: holistic aggregations (collect_list/set, exact mode counts)
  over a groupBy whose key distribution is pathological. Algebraic aggs
  (sum/count/avg) don't need this — map-side partial aggregation already
  absorbs skew — so reach for it only when the agg buffers are value-sized.
- ``skew_split_join``: equi-join where a handful of hot keys dominate. Hot
  keys (found by sampling) take a broadcast path, the long tail takes the
  normal shuffle join; results union. This is the classic split-join, useful
  when AQE can't help (e.g. the skewed side is the build side, or stats are
  missing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    merges: dict[str, Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage grouped aggregation through a random salt.

    ``aggs``: output name → aggregate over the raw rows (stage 1, runs per
    (key, salt) — bounded buffers). ``merges``: output name → aggregate over
    the stage-1 column of the same name (stage 2, merges the ≤ n_salts partial
    rows per key).

    Example (exact value lists under skew):
        salted_agg(df, ["k"], {"vals": F.collect_list("v")},
                   {"vals": F.flatten(F.collect_list("vals"))})
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    stage1 = salted.groupBy(*keys, "__salt").agg(*[a.alias(n) for n, a in aggs.items()])
    return stage1.groupBy(*keys).agg(*[m.alias(n) for n, m in merges.items()])


def hot_keys(df: DataFrame, key: str, threshold_fraction: float = 0.01, sample_fraction: float = 0.05) -> list:
    """Keys holding more than ``threshold_fraction`` of (sampled) rows."""
    sample = df.sample(False, sample_fraction, seed=42) if sample_fraction < 1.0 else df
    counts = sample.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = sample.count()
    if total == 0:
        return []
    return [r[0] for r in counts.filter(F.col("n") > total * threshold_fraction).collect()]


def skew_split_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    hot: list | None = None,
) -> DataFrame:
    """Equi-join with hot-key split: hot keys join via broadcast of the
    (filtered, small) right slice; the remainder takes the regular shuffle
    join. Only inner/left joins preserve semantics under the split."""
    if how not in ("inner", "left"):
        raise ValueError("skew_split_join supports inner and left joins")
    hot = hot if hot is not None else hot_keys(left, on)
    if not hot:
        return left.join(right, on, how)
    hot_lit = [F.lit(h) for h in hot]
    left_hot = left.filter(F.col(on).isin(hot_lit))
    left_cold = left.filter(~F.col(on).isin(hot_lit) | F.col(on).isNull())
    right_hot = right.filter(F.col(on).isin(hot_lit))
    joined_hot = left_hot.join(F.broadcast(right_hot), on, how)
    joined_cold = left_cold.join(right, on, how)
    return joined_hot.unionByName(joined_cold)
