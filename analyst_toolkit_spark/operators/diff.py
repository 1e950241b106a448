"""Diff/changelog engine — the ``df.compare`` equivalent powering every module
report (reference m00_utils/report_tables.py:79-126, 203-262, 319-327).

One implementation shared by normalization / imputation / outlier-handling
reports:

- ``row_diff``: long-form (row_id, column, before, after) for changed cells —
  inner join on ``_row_id`` + null-safe inequality, then in-plan unpivot.
- ``change_summary``: per-column changed-cell counts + rows-changed count in
  the same pass (A15/A16).
- ``dropped_rows``: anti-join on row id (J2).
- ``value_audit``: before/after value-count alignment via full-outer join (J4).

Scale notes: the join is id-equi on ``_row_id`` — if ``after`` derives from
``before`` without a shuffle (the common module case: pure column transforms)
Catalyst co-partitions the two sides for free. Values are compared with the
null-safe equality operator (``<=>``) so null→value and value→null edits count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import ROW_ID


def _common_cols(before: DataFrame, after: DataFrame, columns: list[str] | None) -> list[str]:
    cols = columns or [c for c in before.columns if c != ROW_ID and c in set(after.columns)]
    missing = [c for c in cols if c not in before.columns or c not in after.columns]
    if missing:
        raise ValueError(f"columns not in both frames: {missing}")
    return cols


def row_diff(before: DataFrame, after: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-form changed cells: (_row_id, column, before, after), values cast
    to string for the unpivot (mixed types in one column)."""
    cols = _common_cols(before, after, columns)
    b = before.select(ROW_ID, *[F.col(c).alias(f"b_{c}") for c in cols])
    a = after.select(ROW_ID, *[F.col(c).alias(f"a_{c}") for c in cols])
    joined = b.join(a, ROW_ID)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"b_{c}").cast("string").alias("before"),
            F.col(f"a_{c}").cast("string").alias("after"),
            (~F.col(f"b_{c}").eqNullSafe(F.col(f"a_{c}"))).alias("changed"),
        )
        for c in cols
    ]
    return (
        joined.select(F.col(ROW_ID), F.explode(F.array(*structs)).alias("d"))
        .select(ROW_ID, "d.column", "d.before", "d.after", "d.changed")
        .filter("changed")
        .drop("changed")
    )


def change_summary(before: DataFrame, after: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column changed-cell counts plus the distinct-rows-changed total, in
    ONE join+agg pass (reference report_tables.py:89-126).

    Output: column, cells_changed  (+ a '__rows_changed__' row)."""
    cols = _common_cols(before, after, columns)
    b = before.select(ROW_ID, *[F.col(c).alias(f"b_{c}") for c in cols])
    a = after.select(ROW_ID, *[F.col(c).alias(f"a_{c}") for c in cols])
    joined = b.join(a, ROW_ID)
    changed = {c: (~F.col(f"b_{c}").eqNullSafe(F.col(f"a_{c}"))) for c in cols}
    any_changed = F.lit(False)
    for c in cols:
        any_changed = any_changed | changed[c]
    aggs = [F.sum(changed[c].cast("long")).alias(f"ch::{c}") for c in cols]
    aggs.append(F.sum(any_changed.cast("long")).alias("__rows"))
    wide = joined.agg(*aggs)
    structs = [
        F.struct(F.lit(c).alias("column"), F.col(f"`ch::{c}`").cast("long").alias("cells_changed"))
        for c in cols
    ] + [F.struct(F.lit("__rows_changed__").alias("column"), F.col("__rows").cast("long").alias("cells_changed"))]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def dropped_rows(before: DataFrame, after: DataFrame) -> DataFrame:
    """Rows present in before but not after (J2 anti-join on row id)."""
    return before.join(after.select(ROW_ID), ROW_ID, "left_anti")


def value_audit(before: DataFrame, after: DataFrame, column: str) -> DataFrame:
    """Before/after value counts aligned full-outer (J4 / report_tables.py:48-59):
    value, count_before, count_after, delta. Null bucket included."""
    b = before.groupBy(F.col(column).alias("value")).agg(F.count(F.lit(1)).alias("count_before"))
    a = after.groupBy(F.col(column).alias("value")).agg(F.count(F.lit(1)).alias("count_after"))
    return (
        b.join(a, ["value"], "full_outer")
        .na.fill(0, ["count_before", "count_after"])
        .withColumn("delta", F.col("count_after") - F.col("count_before"))
        .orderBy(F.desc("count_before"), F.asc_nulls_last("value"))
    )
