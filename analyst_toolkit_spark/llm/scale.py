"""Scale gates for the similarity/dedup operators.

All-pairs similarity (cosine self-join, n-gram Jaccard self-join) is O(n²) —
the right *baseline* at test scale and a guaranteed melt-down at 100 TB. The
bucketed variants (hyperplane LSH, MinHash banding) are the scale shape but
trade recall. ``pair_strategy`` picks per input size so callers get exact
semantics while exact is affordable and the bucketed plan beyond that,
mirroring ``functions.stats.quantile_strategy``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from analyst_toolkit_spark.functions.stats import plan_size_bytes

#: Above this optimizer-estimated input size, "auto" pair operators switch
#: from the exact all-pairs plan to the bucketed (LSH/banded) plan. All-pairs
#: work grows with the SQUARE of input size, so this gate is much lower than
#: the quantile gates. Override with $SPARK_GRAFT_ALLPAIRS_BYTES.
ALLPAIRS_THRESHOLD_BYTES = int(os.environ.get("SPARK_GRAFT_ALLPAIRS_BYTES", str(64 << 20)))


def pair_strategy(df: DataFrame, threshold_bytes: int | None = None) -> str:
    """``"exact"`` (all-pairs affordable) or ``"bucketed"`` (LSH shape).

    Unknown plan size (in-memory relations without stats) stays ``"exact"`` —
    real lake tables always carry footer/catalog stats, so unknown means a
    small local relation, and exact is the semantics-preserving default.
    """
    thr = ALLPAIRS_THRESHOLD_BYTES if threshold_bytes is None else threshold_bytes
    size = plan_size_bytes(df)
    return "bucketed" if 0 <= thr <= size else "exact"
