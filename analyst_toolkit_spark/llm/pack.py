"""Sequence packing for LLM training pipelines.

Training-data prep ends by packing documents into fixed-token-budget
training sequences ("concat-and-chunk"): walk the corpus in a deterministic
order, accumulate token counts, and start a new sequence whenever the budget
would overflow. The assignment for a document is a pure function of the
GLOBAL running token total before it — which is the hard part on a cluster:
Spark's window over a global ORDER BY collapses to a single task.

This module implements the classic two-phase distributed prefix sum instead:

1. ``repartitionByRange`` on the order column — the range partitioner gives
   ascending, non-overlapping key ranges to ascending partition ids, so
   partition id order IS global order.
2. One tiny driver-side pass over the per-partition token totals (N numbers
   for N partitions) turns them into per-partition offsets.
3. A per-partition window cumsum plus the broadcast offset yields the exact
   global running total — every pass is parallel; the only serial work is
   summing N partial totals on the driver.

The result is deterministic, independent of input partitioning, and equal to
a single-node cumsum (the DuckDB oracle runs the plain windowed SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from analyst_toolkit_spark.llm.text import token_count  # packing counts tokens the same way the text metrics do

_PID = "__pack_pid"
_OFF = "__pack_off"
_CUM = "_cum_tokens"


def with_global_cumsum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = _CUM,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order_col`` order,
    WITHOUT a single-partition global window.

    ``order_col`` must be unique (document ids are): the range partitioner
    may split runs of equal keys across partitions, which would make the
    per-partition cumsum order-ambiguous.
    """
    spark = df.sparkSession
    if num_partitions is None:
        try:
            num_partitions = spark.sparkContext.defaultParallelism
        except Exception:
            num_partitions = 32
    ranged = df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
        _PID, F.spark_partition_id()
    )
    # phase 1+2: per-partition totals -> driver prefix offsets (N scalars)
    totals = {
        r[_PID]: r["t"]
        for r in ranged.groupBy(_PID).agg(F.sum(F.col(value_col)).alias("t")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid] or 0
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], f"{_PID} int, {_OFF} long"
    )
    # phase 3: local cumsum + offset == exact global cumsum
    w = (
        Window.partitionBy(_PID)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.sum(F.col(value_col)).over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )




def pack_sequences(
    df: DataFrame,
    budget: int,
    key: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document to a training sequence under a token budget
    (concat-and-chunk semantics): documents are taken in ``id_col`` order and
    ``seq_id = floor(running_total_before_doc / budget)`` — a document that
    straddles a boundary opens the next sequence's budget, exactly like the
    streaming concat-then-split packers used in LLM data prep.

    Output: input columns + ``n_tokens``, ``_cum_tokens`` (global running
    total INCLUDING the doc), ``seq_id``. Deterministic and
    partitioning-independent; the whole assignment reproduces as one
    windowed SQL expression, so it is fully oracle-checkable.
    """
    toks = F.col(tokens_col) if tokens_col else token_count(key)
    with_tokens = df.withColumn("n_tokens", toks.cast("long"))
    cum = with_global_cumsum(with_tokens, "n_tokens", id_col)
    return cum.withColumn(
        "seq_id", F.floor((F.col(_CUM) - F.col("n_tokens")) / F.lit(int(budget)))
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Packing census: sequences, fill factor, docs/sequence — the numbers a
    data-prep run reports after packing."""
    per_seq = packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("seq_tokens")
    )
    return per_seq.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("docs").cast("long").alias("total_docs"),
        F.sum("seq_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("seq_tokens") / F.lit(float(budget)), 6).alias("avg_fill"),
        F.max("docs").cast("long").alias("max_docs_per_seq"),
    )
