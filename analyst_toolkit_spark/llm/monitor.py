"""Corpus-to-corpus drift monitoring for training-data pipelines.

A crawl-over-crawl (or shard-over-shard) pipeline needs cheap, distributed
answers to "did the data change under me?" BEFORE retraining tokenizers or
re-running curation: vocabulary churn, token-distribution shift, and
embedding-space shift. The numeric-column analogue lives in
operators/drift.py (PSI over binned numerics, reference parity with the
toolkit's m09 drift module); this module covers the text/embedding side.

Distance choices are deliberate: TOTAL VARIATION distance (0.5 * L1 between
the two unigram distributions) instead of KL/Jensen-Shannon — same ordering
for thresholding, but pure rational arithmetic (integer counts and
divisions), so results hash-match a SQL oracle bit-for-bit; ``ln()`` differs
in the last ulp across engines (same reasoning as llm/lm.py's log-free
score and llm/text.token_rarity's surprisal proxy).

Plan shapes (the 100 TB posture):
- token drift: one fact-scale groupBy per corpus (map-side combined), then
  a vocabulary-sized full-outer join and a single-row aggregate.
- embedding drift: posexplode to (dim, value) — dim keys are few, so the
  per-dim average shuffles almost nothing after partial aggregation; the
  centroid join is dim-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from analyst_toolkit_spark.llm.text import _VOCAB_TOKEN_RE


def _token_counts(df: DataFrame, key: str) -> DataFrame:
    toks = F.regexp_extract_all(F.lower(F.col(key)), F.lit(_VOCAB_TOKEN_RE), F.lit(0))
    return (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def token_distribution_drift(
    df_a: DataFrame, df_b: DataFrame, key: str = "text"
) -> DataFrame:
    """One-row unigram drift summary between corpus A (reference) and corpus
    B (candidate): token totals, vocabulary sizes, churn (tokens appearing
    only in one side), and the total-variation distance between the two
    relative-frequency distributions (0 = identical, 1 = disjoint)."""
    ca = _token_counts(df_a, key).withColumnRenamed("c", "ca")
    cb = _token_counts(df_b, key).withColumnRenamed("c", "cb")
    # r15 optimization round (guide §1.2): the totals agg AND the drift agg
    # both read the full-outer join — without a cut each re-runs BOTH
    # corpus-scale tokenize+groupBy subtrees (4 corpus scans for 2 logical
    # reads, plan-verified). The cut is vocabulary-sized (tok + 2 longs) —
    # sublinear in the corpus at any scale, hence unconditional; the trade
    # (r15 ADVICE, the dedup._materialize_nocodegen stance) is that
    # localCheckpoint truncates lineage, so an executor loss mid-job rewinds
    # to this cut's materialization rather than replaying upstream lineage.
    j = ca.join(cb, "tok", "full_outer").localCheckpoint(eager=False)
    totals = j.agg(
        F.sum("ca").alias("__ta"), F.sum("cb").alias("__tb")
    )
    return (
        j.crossJoin(F.broadcast(totals))
        .agg(
            F.max("__ta").cast("long").alias("tokens_a"),
            F.max("__tb").cast("long").alias("tokens_b"),
            F.sum(F.col("ca").isNotNull().cast("long")).alias("vocab_a"),
            F.sum(F.col("cb").isNotNull().cast("long")).alias("vocab_b"),
            F.sum((F.col("ca").isNotNull() & F.col("cb").isNotNull()).cast("long")).alias(
                "shared_vocab"
            ),
            F.sum((F.col("ca").isNull()).cast("long")).alias("new_vocab"),
            F.sum((F.col("cb").isNull()).cast("long")).alias("lost_vocab"),
            (
                0.5
                * F.sum(
                    F.abs(
                        F.coalesce(F.col("ca"), F.lit(0)) / F.col("__ta")
                        - F.coalesce(F.col("cb"), F.lit(0)) / F.col("__tb")
                    )
                )
            ).alias("tv_distance"),
        )
    )


def token_drift_terms(
    df_a: DataFrame, df_b: DataFrame, key: str = "text", top_n: int = 20
) -> DataFrame:
    """The biggest per-token movers between the two corpora — the diagnostic
    view behind :func:`token_distribution_drift`'s single number. Returns the
    ``top_n`` tokens by absolute relative-frequency change, with both
    frequencies. Ordered (delta desc, token asc) so ties are deterministic."""
    ca = _token_counts(df_a, key).withColumnRenamed("c", "ca")
    cb = _token_counts(df_b, key).withColumnRenamed("c", "cb")
    # vocabulary-sized cut: totals + movers both read it (see
    # token_distribution_drift — same 4-scans-for-2 shape, and the same
    # executor-loss/lineage trade note, r15 ADVICE)
    j = ca.join(cb, "tok", "full_outer").localCheckpoint(eager=False)
    totals = j.agg(F.sum("ca").alias("__ta"), F.sum("cb").alias("__tb"))
    freqs = j.crossJoin(F.broadcast(totals)).select(
        "tok",
        (F.coalesce(F.col("ca"), F.lit(0)) / F.col("__ta")).alias("freq_a"),
        (F.coalesce(F.col("cb"), F.lit(0)) / F.col("__tb")).alias("freq_b"),
    )
    delta = F.abs(F.col("freq_b") - F.col("freq_a"))
    return (
        freqs.withColumn("abs_delta", delta)
        .orderBy(F.desc("abs_delta"), F.asc("tok"))
        .limit(top_n)
    )


def embedding_centroid_drift(
    df_a: DataFrame, df_b: DataFrame, col: str = "embedding"
) -> DataFrame:
    """One-row embedding-space drift summary: dimensionality, L2 distance
    between the two corpus centroids, and each corpus's mean vector norm.
    Centroids come from a posexplode + per-dimension average — after
    map-side partial aggregation the shuffle carries ~dims rows per
    partition, nothing fact-scale."""

    def centroid(df: DataFrame, suffix: str) -> DataFrame:
        return (
            df.select(F.posexplode(F.col(col)).alias("pos", "v"))
            .groupBy("pos")
            .agg(F.avg(F.col("v").cast("double")).alias(f"c_{suffix}"))
        )

    def mean_norm(df: DataFrame, alias: str) -> DataFrame:
        norm2 = F.aggregate(
            F.col(col), F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")
        )
        return df.agg(F.avg(F.sqrt(norm2)).alias(alias))

    joined = centroid(df_a, "a").join(centroid(df_b, "b"), "pos")
    shift = joined.agg(
        F.count(F.lit(1)).cast("int").alias("dims"),
        F.sqrt(F.sum(F.pow(F.col("c_a") - F.col("c_b"), 2))).alias("centroid_shift"),
    )
    return (
        shift.crossJoin(F.broadcast(mean_norm(df_a, "mean_norm_a")))
        .crossJoin(F.broadcast(mean_norm(df_b, "mean_norm_b")))
    )
