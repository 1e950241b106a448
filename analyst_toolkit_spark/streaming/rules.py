"""Structured Streaming re-expression of the QA rule engine.

The reference is batch-only (SURVEY.md §2.9); this module runs the same
validation/profile operators over micro-batches:

- ``validate_stream``: attaches violation flags in-stream (pure expressions →
  works in append mode with no state).
- ``windowed_profile``: watermarked tumbling-window aggregate profile
  (nulls/count/mean per window) — the streaming analogue of M01.
- ``foreach_batch_runner``: runs ANY batch operator per micro-batch via
  foreachBatch — the general seam for modules that need exact global stats.

Tested with the file/rate sources available locally; on a cluster the same
code binds to Kafka et al. by swapping the reader.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from analyst_toolkit_spark.operators.validation import ValidationConfig, compile_rules


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (TZ-aware); naive-parquet sources read as
    TIMESTAMP_NTZ (e.g. the events table). Cast at the streaming seam — the
    wall-clock instant is interpreted in the session timezone, which is the
    standard Spark semantic for NTZ→TZ promotion."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def validate_stream(stream_df: DataFrame, cfg: ValidationConfig) -> DataFrame:
    """Append one boolean flag column per rule + a row-level any-violation flag.
    Stateless — safe for append-mode sinks and watermark-free pipelines."""
    preds = compile_rules(stream_df, cfg)
    out = stream_df
    any_pred = F.lit(False)
    for name, p in preds.items():
        flag = "viol_" + name.replace(":", "_")
        out = out.withColumn(flag, F.coalesce(p, F.lit(False)))
        any_pred = any_pred | F.col(flag)
    return out.withColumn("any_violation", any_pred)


def windowed_profile(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window profile aggregate: count, nulls, mean, min,
    max per window. Late rows beyond the watermark are dropped (documented
    streaming semantics, not a bug)."""
    return (
        ensure_event_time(stream_df, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col(value_col).isNull().cast("long")).alias("nulls"),
            F.round(F.avg(value_col), 6).alias("mean"),
            F.min(value_col).alias("min"),
            F.max(value_col).alias("max"),
        )
        .select(F.col("win.start").alias("window_start"), F.col("win.end").alias("window_end"),
                "rows", "nulls", "mean", "min", "max")
    )


def foreach_batch_runner(
    stream_df: DataFrame,
    batch_op: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Run an arbitrary batch operator per micro-batch (the generic seam for
    exact-statistics modules). Returns the started StreamingQuery."""
    writer = stream_df.writeStream.foreachBatch(batch_op).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
