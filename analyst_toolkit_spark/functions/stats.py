"""Pandas-parity statistics as Spark Column expressions.

The reference reports pandas statistics (reference m01_diagnostics/data_diag.py:46-113):
``skew()``/``kurt()`` are *bias-corrected* (adjusted Fisher–Pearson), ``std`` is
ddof=1, ``quantile`` interpolates linearly, ``mode`` breaks ties by smallest
value. Spark's ``F.skewness``/``F.kurtosis`` are the *population* estimators, so
a naive translation silently reports different numbers. DuckDB's built-ins match
pandas, which is what the oracle checks.

All of these are plain Column expressions → they fuse into a single whole-stage
codegen'd aggregation pass; nothing here adds a scan or a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skewness_g1(col: str | Column) -> Column:
    """Bias-corrected sample skewness (pandas ``Series.skew``, DuckDB ``skewness``).

    G1 = g1 * sqrt(n(n-1)) / (n-2) where g1 is Spark's population skewness.
    Null for n < 3 (pandas returns NaN).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    g1 = F.skewness(c)
    return F.when(n >= 3, g1 * F.sqrt(n * (n - 1)) / (n - 2)).otherwise(F.lit(None))


def kurtosis_g2(col: str | Column) -> Column:
    """Bias-corrected sample excess kurtosis (pandas ``Series.kurt``, DuckDB ``kurtosis``).

    G2 = ((n+1)*g2 + 6) * (n-1) / ((n-2)(n-3)) where g2 is Spark's population
    excess kurtosis. Null for n < 4.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    g2 = F.kurtosis(c)
    return F.when(n >= 4, ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))).otherwise(F.lit(None))


def percentile_exact(col: str | Column, p: float | list[float]) -> Column:
    """Exact percentile with linear interpolation (pandas ``quantile``,
    DuckDB ``quantile_cont``, SQL ``percentile``). NOT ``approxQuantile``:
    the IQR bounds feed outlier predicates, so precision is semantic.

    At 100 TB this is a sort-based exact aggregate; switch to
    ``F.approx_percentile`` via the profiler's ``exact=False`` mode when a
    relative-error answer is acceptable.
    """
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(p, (int, float)):
        return F.percentile(c, F.lit(float(p)))
    return F.percentile(c, F.array(*[F.lit(float(x)) for x in p]))


def mode_value(df: DataFrame, col: str):
    """Column mode with the pandas tie-break: most frequent, then smallest value
    (reference m07_imputation/impute_data.py:53-56 — ``mode()[0]`` after sort).

    One groupBy (map-side combined) + a driver take(1) of the winner.
    Returns the Python scalar, or None for an all-null column.
    """
    row = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .count()
        .orderBy(F.desc("count"), F.asc(col))
        .take(1)
    )
    return row[0][0] if row else None


def any_horizontal(cols: list[Column]) -> Column:
    """Row-wise OR over flag columns (reference detect_outliers.py:81) with
    null-as-false semantics."""
    out = F.lit(False)
    for c in cols:
        out = out | F.coalesce(c, F.lit(False))
    return out
