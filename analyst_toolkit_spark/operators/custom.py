"""User-defined quality-rule seam (SURVEY §2.10).

The reference's extension surface is "apply arbitrary Python to the table"
(pandas ``apply``); the idiomatic Spark seam is Arrow-batched pandas functions,
never row-at-a-time Python UDFs:

- ``apply_row_rule``: mapInPandas — a vectorized pandas fn over Arrow batches,
  for rules that need Python (regex libs, custom scoring) on each row.
- ``apply_grouped_rule``: applyInPandas — grouped-map for per-entity rules
  (per-customer anomaly checks, per-session validation) where the whole group
  must be in one pandas frame.
- ``vector_rule``: pandas_udf scalar — a rule as a reusable Column, composable
  with the validation rule compiler (compile_rules + custom predicates in the
  same one-scan summary).

Scale notes: all three move data JVM↔Python in Arrow batches (~10-100× the
throughput of row UDFs); grouped rules shuffle once on the group key and the
group must fit in executor memory — document per-rule key cardinality.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_row_rule(df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str | Any) -> DataFrame:
    """Run a pandas-frame→pandas-frame rule over Arrow batches (mapInPandas)."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(runner, schema)


def apply_grouped_rule(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str | Any,
) -> DataFrame:
    """Run a per-group pandas rule (applyInPandas): fn sees one full group."""
    return df.groupBy(*keys).applyInPandas(lambda pdf: fn(pdf), schema)


def vector_rule(fn: Callable[..., pd.Series], return_type: str = "boolean") -> Callable[..., Column]:
    """Wrap a pandas Series fn as a reusable vectorized Column expression.

    Example:
        is_shouting = vector_rule(lambda s: s.str.isupper())
        df.withColumn("flag", is_shouting(F.col("comment")))
    """
    return F.pandas_udf(fn, returnType=return_type)
