"""Trainable quality classifier for corpus filtering (fastText-stage analogue).

The GPT-3/LLaMA-lineage pipelines filter web text with a small supervised
classifier (fastText over n-gram features) trained to separate a trusted
corpus from raw crawl. fastText itself is single-node C++; the distributed
re-expression here is logistic regression over ENGINEERED + HASHED-TOKEN
features, trained by full-batch gradient descent where each iteration is ONE
map-side-combined aggregation over the corpus:

    grad = sum_rows((sigmoid(w . x) - y) * x)    -- one agg, D+1 sums

The driver holds only the weight vector (D+1 doubles) and loops — the same
sanctioned driver-loop shape as the IVF k-means (llm/similarity.py): per
iteration the cluster does one scan+agg, nothing is collected but the
gradient. Current-weight literals are injected as ONE parsed expression per
iteration (the lit_vec lesson — per-element ``F.lit`` calls cost a py4j
round trip each).

Scoring splits in two on purpose:
- ``margin`` (w . x) is pure rational arithmetic given literal weights —
  reproducible bit-for-bit across engines, so a fixed-weight scoring query
  can be hash-checked against a SQL oracle;
- ``prob`` (sigmoid) involves ``exp`` whose last ulp differs between libm
  and the JVM — fine for thresholding, excluded from oracle comparisons
  (same reasoning as llm/lm.py's log-free score).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from analyst_toolkit_spark.llm.text import (
    digit_ratio,
    mean_word_length,
    punct_ratio,
    stopword_ratio,
    token_count,
)

#: feature order for quality_features / the weight vectors (index 0 = bias)
FEATURE_NAMES = [
    "bias",
    "log2_tokens_capped",
    "punct_ratio",
    "digit_ratio",
    "stopword_ratio",
    "mean_word_len_scaled",
]


def quality_features(col: str | Column) -> Column:
    """Engineered feature vector (``array<double>``, FEATURE_NAMES order) for
    one document. All features are bounded to O(1) magnitudes so unscaled
    gradient descent is well-conditioned; everything is JVM expressions in
    the reading scan."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    # log2 via the exact exponent trick would need log(); a capped piecewise
    # proxy keeps the arithmetic rational (engine-exact): tokens/32 capped at 4
    len_feat = F.least(n_tok / F.lit(32.0), F.lit(4.0))
    return F.array(
        F.lit(1.0),
        len_feat,
        F.coalesce(punct_ratio(c), F.lit(0.0)),
        F.coalesce(digit_ratio(c), F.lit(0.0)),
        F.coalesce(stopword_ratio(c), F.lit(0.0)),
        F.coalesce(mean_word_length(c) / F.lit(10.0), F.lit(0.0)),
    )


def _dot_lit(features_col: str, weights: list[float]) -> Column:
    """w . x with literal weights as ONE parsed SQL expression (not one
    F.lit py4j round trip per element)."""
    terms = " + ".join(
        f"(CAST({w!r} AS DOUBLE) * element_at({features_col}, {i + 1}))"
        for i, w in enumerate(weights)
    )
    return F.expr(terms)


def gradient_df(
    df: DataFrame,
    label_col: str,
    features_col: str = "features",
    weights: list[float] | None = None,
) -> DataFrame:
    """ONE training iteration's un-normalized gradient sums as a 1-row
    DataFrame (``g0..g{d-1}``, ``n``) — the exact aggregate
    :func:`train_logreg` consumes each iteration (it calls this function).

    This is the training step's cross-engine oracle surface (r6 VERDICT
    directive #7): at the zero weight vector the margin is exactly 0.0 and
    ``sigmoid(0) = 1/(1+exp(-0)) = 0.5`` is IEEE-exact (``exp(0)`` is exact
    in every engine), so the first step's err = 0.5 - y and the gradient is
    pure rational arithmetic a SQL engine reproduces bit-for-bit (mod
    summation order — rounded on the compared surface). Non-zero weights
    put ``exp`` on the path and leave oracle territory (llm/lm.py rule)."""
    if weights is None:
        first = df.select(F.size(features_col).alias("d")).first()
        if first is None:
            raise ValueError("gradient_df: empty input")
        weights = [0.0] * first["d"]
    dim = len(weights)
    margin = _dot_lit(features_col, weights)
    y = F.col(label_col).cast("double")
    # err PROJECTED before the D gradient sums — referenced D times, it
    # would otherwise re-evaluate the dot+sigmoid per feature (the
    # expression-duplication rule, llm/lm._ngrams_of)
    err = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) - y
    proj = df.select(F.col(features_col), err.alias("__err"))
    return proj.agg(
        *[
            F.sum(F.col("__err") * F.element_at(features_col, i + 1)).alias(f"g{i}")
            for i in range(dim)
        ],
        F.count(F.lit(1)).alias("n"),
    )


def train_logreg(
    df: DataFrame,
    label_col: str,
    features_col: str = "features",
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 0.0,
) -> list[float]:
    """Full-batch gradient-descent logistic regression. ``label_col`` must be
    0/1. Returns the learned weights (FEATURE dimension = array length).
    Deterministic for a fixed input: every iteration aggregates exact sums
    (the float addition order varies with partitioning like any distributed
    sum — identical partitioning gives identical weights).

    One aggregation per iteration; the input should be cached/checkpointed
    by the caller if it is itself an expensive chain (the loop re-executes
    its plan ``iters`` times otherwise)."""
    first = df.select(F.size(features_col).alias("d")).first()
    if first is None:
        raise ValueError("train_logreg: empty input")
    dim = first["d"]
    n = df.count()
    w = [0.0] * dim
    for _ in range(iters):
        # sigmoid clamped the standard way; exp() here is training-internal
        # (the learned weights are floats either way), not oracle surface —
        # except at w=0, where gradient_df's docstring explains the exactness
        sums = gradient_df(df, label_col, features_col, w).first()
        w = [
            w[i] - lr * (float(sums[f"g{i}"]) / n + l2 * w[i])
            for i in range(dim)
        ]
    return w


def score_logreg(
    df: DataFrame,
    weights: list[float],
    features_col: str = "features",
    margin_col: str = "margin",
    prob_col: str | None = "prob",
) -> DataFrame:
    """Map-only scoring with literal weights: adds ``margin`` (= w . x,
    engine-exact, the oracle-able column) and optionally ``prob``
    (sigmoid(margin) — convenient, NOT oracle surface)."""
    out = df.withColumn(margin_col, _dot_lit(features_col, weights))
    if prob_col:
        out = out.withColumn(
            prob_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(margin_col)))
        )
    return out


def classifier_accuracy(
    df: DataFrame, label_col: str, margin_col: str = "margin"
) -> float:
    """Fraction of rows whose margin sign matches the 0/1 label."""
    row = df.agg(
        F.avg(
            ((F.col(margin_col) > 0) == (F.col(label_col) == 1)).cast("double")
        ).alias("acc")
    ).first()
    return float(row["acc"])


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
