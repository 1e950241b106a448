"""Stream-stream interval (event-time range) join.

The seventh canonical Structured Streaming shape (the other six — stateless
validate, windowed profile, watermarked dedup, custom state, session windows,
stream-static probe — live in rules.py / sessions.py / llm/incremental.py):
two live streams joined on a key WITHIN an event-time window, e.g. click →
purchase attribution. Beyond the reference surface (batch-only, SURVEY §2.9).

Spark executes this natively: both sides are buffered in watermark-bounded
state and matched as micro-batches arrive; the event-time range condition
tells the engine exactly when a buffered row can never match again and is
evicted. The SAME plan works over batch frames (where it is an ordinary
range-predicate join, AQE-optimized) — which is what makes the operator
oracle-able: the streaming result over any batch split equals the batch join
as long as no row arrives later than the watermark.

Scale posture (100 TB/day): state per side ≈ rate × (watermark + window) ×
row width, partitioned by the join key across executors. Keep the watermark
as tight as late data allows; an unbounded watermark (used in deterministic
tests) means unbounded state and is NOT a production setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from analyst_toolkit_spark.streaming.rules import ensure_event_time


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    window: str = "1 hour",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each LEFT row to the RIGHT rows of the same ``key`` whose
    ``right_ts`` falls in ``[left_ts - window, left_ts]`` — the attribution
    shape (right = cause candidates, left = effect). Returns all columns of
    both sides with the key once.

    Column names apart from ``key`` must be disjoint (pre-project each side;
    a stream-stream join cannot disambiguate after the fact), and the two
    timestamp columns must be named differently so both survive into the
    output. Pass watermarks on BOTH sides for streaming inputs — Spark
    requires them to bound join state and (for outer joins) to emit
    null-padded rows. For outer joins the key column is coalesced across
    sides, so right-/full-unmatched rows carry the right key instead of
    NULL (r10 ADVICE: dropping r[key] alone NULLed them)."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be named differently")
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    l = ensure_event_time(left, left_ts)
    r = ensure_event_time(right, right_ts)
    if left_watermark:
        l = l.withWatermark(left_ts, left_watermark)
    if right_watermark:
        r = r.withWatermark(right_ts, right_watermark)
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "right", "right_outer", "rightouter",
        "full", "full_outer", "fullouter", "outer",
    }
    if how.lower() not in allowed:
        raise ValueError(f"interval_join: unsupported how={how!r}")
    # alias both sides: when they derive from ONE stream (a self-join split
    # by predicate) bare frame-column refs are ambiguous after the join
    la, ra = l.alias("__ij_l"), r.alias("__ij_r")
    cond = (
        (F.col(f"__ij_l.{key}") == F.col(f"__ij_r.{key}"))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {window}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    joined = la.join(ra, cond, how)
    # one key column, never NULL on unmatched rows of either side
    cols = [F.coalesce(F.col(f"__ij_l.{key}"), F.col(f"__ij_r.{key}")).alias(key)]
    cols += [F.col(f"__ij_l.{c}") for c in l.columns if c != key]
    cols += [F.col(f"__ij_r.{c}") for c in r.columns if c != key]
    return joined.select(*cols)
