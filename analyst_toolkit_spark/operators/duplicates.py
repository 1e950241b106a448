"""M04 duplicates → window-based flag/remove with keep-order semantics.

pandas ``duplicated(keep=...)`` / ``drop_duplicates(keep=...)`` are order
sensitive: "first" means first in RangeIndex order
(reference m04_duplicates/detect_dupes.py:32, handle_dupes.py:25-28). Spark's
``dropDuplicates`` keeps an ARBITRARY row, so the engine uses a window over the
subset keys ordered by an explicit order key — ``_row_id`` (ingest order) by
default, or any deterministic column order for cross-engine reproducibility.

Scale: one shuffle on the subset keys (unavoidable for exact dedup); AQE handles
skewed keys. For near-dup dedup at 100 TB see ``llm/dedup.py`` (MinHash-LSH).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import ROW_ID


def _order_cols(df: DataFrame, order_by: list[str] | None) -> list[Column]:
    if order_by:
        return [F.col(c) for c in order_by]
    if ROW_ID in df.columns:
        return [F.col(ROW_ID)]
    raise ValueError("keep-order dedup needs _row_id (ingest with row_id=True) or an explicit order_by")


def flag_duplicates(
    df: DataFrame,
    subset: list[str] | None = None,
    keep: str | bool = False,
    flag_col: str = "is_duplicate",
    order_by: list[str] | None = None,
) -> DataFrame:
    """pandas ``duplicated(keep=...)`` parity as a boolean column.

    keep=False  → every member of a >1 cluster flagged (reference detect_dupes.py:32)
    keep='first'→ all but the first occurrence flagged
    keep='last' → all but the last occurrence flagged
    """
    keys = subset or [c for c in df.columns if c != ROW_ID]
    if keep is False:
        w = Window.partitionBy(*keys)
        return df.withColumn(flag_col, F.count(F.lit(1)).over(w) > 1)
    order = _order_cols(df, order_by)
    if keep == "last":
        order = [c.desc() for c in order]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(flag_col, F.row_number().over(w) > 1)


def drop_duplicates_keep_order(
    df: DataFrame,
    subset: list[str] | None = None,
    keep: str = "first",
    order_by: list[str] | None = None,
) -> DataFrame:
    """``drop_duplicates(keep='first'|'last')`` parity (handle_dupes.py:25-28)."""
    flagged = flag_duplicates(df, subset, keep, "__dup", order_by)
    return flagged.filter(~F.col("__dup")).drop("__dup")


def duplicate_clusters(df: DataFrame, subset: list[str], min_size: int = 2) -> DataFrame:
    """Cluster-size report (reference dashboard_data_prep.py:64-67): one row per
    duplicated key with its member count, largest first."""
    return (
        df.groupBy(*subset)
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") >= min_size)
        .orderBy(F.desc("cluster_size"), *[F.asc(c) for c in subset])
    )
