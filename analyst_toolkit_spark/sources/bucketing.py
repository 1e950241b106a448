"""Bucketed storage for co-located joins and aggregations.

At 100 TB the dominant cost of a repeated join/groupBy on the same key is the
shuffle. Writing both sides bucketed by the join key (hash-partitioned files +
catalog metadata) lets Spark plan a shuffle-free sort-merge join: each task
reads matching buckets from both tables. This module wraps the saveAsTable
bucketing API (bucketing metadata lives in the session catalog — plain
``.parquet(path)`` writes cannot carry it).

Verified by plan shape in tests/test_bucketing.py: the bucketed-join physical
plan contains NO Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table. Sorting
    within buckets makes the downstream sort-merge join skip its sort too."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the same keys/bucket-count — planned
    without a shuffle on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
