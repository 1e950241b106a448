"""Temporal & interval joins — as-of join and range join, Spark-first.

Neither exists as a built-in Spark operator (Catalyst plans a non-equi
condition as a nested-loop join), so these are the composition shapes a
100 TB pipeline actually wants:

- **as-of join** (for each left row, the latest right row at-or-before its
  timestamp, per key): union the two sides, one window pass per key that
  forward-fills the most recent right values, keep the left rows. ONE
  shuffle on the key column, no per-key iteration, no nested loop — the
  classic log-structured as-of used by time-series stores. Equivalent
  semantics to pandas ``merge_asof`` / DuckDB ``ASOF JOIN``.
- **range join** (left value ∈ [right.lo, right.hi]): broadcast non-equi
  join while the interval side is small (the overwhelmingly common shape —
  band/bucket dimension tables), binned equi-join when both sides are big:
  explode each interval into the fixed-width bins it covers, equi-join on
  the bin id, post-filter the exact bounds. Turns O(|L|·|R|) nested-loop
  into a co-partitioned hash join.

The reference engine has no temporal-join surface (it is a single-frame QA
tool); these close the gap for the training-data-pipeline workloads named in
SURVEY.md §6 (event attribution, feature as-of lookup, banded stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from analyst_toolkit_spark.functions.stats import plan_size_bytes

#: Right sides whose optimizer-estimated size is at or below this are
#: broadcast in range_join's "auto" mode (Spark's own default broadcast
#: threshold is 10 MB; non-equi nested-loop broadcast stays cheap well past
#: that for band tables, but keep the same order of magnitude).
RANGE_BROADCAST_BYTES = 32 << 20

_SIDE = "__asof_side"
_MATCH_TS = "__asof_match_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | str | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for every left row, the single right row with the greatest
    ``on`` value <= the left's (``direction="backward"``; ``"forward"`` takes
    the smallest >=; ``"nearest"`` the closer of the two by absolute
    distance, ties to the backward match). pandas ``merge_asof`` / DuckDB
    ``ASOF JOIN`` semantics, including ``allow_exact_matches`` and
    ``tolerance``.

    Plan shape (the 100 TB path): tag both sides, union, ONE window over
    (by, on) that forward-fills the latest right values with
    ``last(..., ignorenulls=True)``, then keep left rows. A single hash
    shuffle on ``by`` — same cost as any keyed agg over the union; no
    nested-loop, no per-key collect. Heavily skewed keys can salt upstream
    like any windowed op.

    ``tolerance`` (e.g. ``"INTERVAL 1 HOUR"`` or an expression) nulls the
    match when the matched right timestamp is farther than the tolerance
    from the left timestamp.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, by, right_cols, tolerance, allow_exact_matches, suffix
        )
    by = [by] if isinstance(by, str) else list(by or [])
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    l_tag = left.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_cols],
        *[F.col(c) for c in left.columns if c not in by and c != on],
    )
    r_tag = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by and c != on],
    )
    unioned = l_tag.unionByName(r_tag)

    # Ordering encodes the tie rule: with exact matches allowed the right row
    # at an equal timestamp must sort BEFORE the left row (side 0 < 1) so the
    # fill sees it; disallowed, after it. forward = the same scan mirrored.
    asc = direction == "backward"
    ts_key = F.col(on).asc() if asc else F.col(on).desc()
    side_first = allow_exact_matches  # right first at ties
    side_key = F.col(_SIDE).asc() if side_first else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(ts_key, side_key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = unioned.withColumn(
        _MATCH_TS, F.last(F.when(F.col(_SIDE) == 0, F.col(on)), ignorenulls=True).over(w)
    )
    for c in right_cols:
        filled = filled.withColumn(
            out_names[c],
            F.last(F.when(F.col(_SIDE) == 0, F.col(out_names[c])), ignorenulls=True).over(w),
        )

    result = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        within = (
            (F.col(on) - F.col(_MATCH_TS)) <= tol
            if asc
            else (F.col(_MATCH_TS) - F.col(on)) <= tol
        )
        for c in right_cols:
            result = result.withColumn(
                out_names[c], F.when(within, F.col(out_names[c]))
            )
        result = result.withColumn(_MATCH_TS, F.when(within, F.col(_MATCH_TS)))

    ordered = (
        by
        + [on]
        + [c for c in left.columns if c not in by and c != on]
        + [out_names[c] for c in right_cols]
    )
    return result.select(*ordered)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by,
    right_cols: list[str] | None,
    tolerance,
    allow_exact_matches: bool,
    suffix: str,
) -> DataFrame:
    """``direction="nearest"``: the closer of the backward and forward
    matches by absolute distance; ties go to the backward match (pandas
    merge_asof tie rule, asserted against pandas in tests).

    Plan shape: the SAME single union as backward/forward, with TWO window
    passes — ascending (backward fill) and descending (forward fill) — over
    one hash partitioning on ``by``: Spark reuses the exchange and only adds
    the second sort. Still zero join nodes."""
    by = [by] if isinstance(by, str) else list(by or [])
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    l_tag = left.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_cols],
        *[F.col(c) for c in left.columns if c not in by and c != on],
    )
    r_tag = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by and c != on],
    )
    unioned = l_tag.unionByName(r_tag)

    def _w(asc: bool):
        ts_key = F.col(on).asc() if asc else F.col(on).desc()
        side_key = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
        return (
            Window.partitionBy(*[F.col(c) for c in by])
            .orderBy(ts_key, side_key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    wb, wf = _w(True), _w(False)
    right_ts = F.when(F.col(_SIDE) == 0, F.col(on))
    filled = unioned.withColumn("__ts_b", F.last(right_ts, ignorenulls=True).over(wb)).withColumn(
        "__ts_f", F.last(right_ts, ignorenulls=True).over(wf)
    )
    for c in right_cols:
        src = F.when(F.col(_SIDE) == 0, F.col(out_names[c]))
        filled = filled.withColumn(f"__b_{c}", F.last(src, ignorenulls=True).over(wb)).withColumn(
            f"__f_{c}", F.last(src, ignorenulls=True).over(wf)
        )

    res = filled.filter(F.col(_SIDE) == 1)
    ts_b, ts_f = F.col("__ts_b"), F.col("__ts_f")
    dist_b, dist_f = F.col(on) - ts_b, ts_f - F.col(on)  # both >= 0 where defined
    use_b = ts_b.isNotNull() & (ts_f.isNull() | (dist_b <= dist_f))
    dist = F.when(use_b, dist_b).otherwise(dist_f)
    within = F.lit(True)
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        within = dist <= tol
    for c in right_cols:
        res = res.withColumn(
            out_names[c], F.when(within, F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")))
        )
    ordered = (
        by
        + [on]
        + [c for c in left.columns if c not in by and c != on]
        + [out_names[c] for c in right_cols]
    )
    return res.select(*ordered)


def range_strategy(right: DataFrame, threshold_bytes: int | None = None) -> str:
    """``"broadcast"`` (small interval side → non-equi broadcast join) or
    ``"binned"`` (both sides big → exploded-bin equi-join). Unknown plan size
    means a local relation without stats — broadcast, same reasoning as
    llm/scale.pair_strategy."""
    thr = RANGE_BROADCAST_BYTES if threshold_bytes is None else threshold_bytes
    size = plan_size_bytes(right)
    return "binned" if 0 <= thr <= size else "broadcast"


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    by: list[str] | None = None,
    how: str = "inner",
    mode: str = "auto",
    bin_width: float | None = None,
) -> DataFrame:
    """Interval join: left rows matched to right rows where
    ``lo_col <= value_col <= hi_col`` (plus optional ``by`` equality keys).

    ``mode="auto"`` routes by the interval side's optimizer-estimated size
    (``range_strategy``): broadcast non-equi join while it fits, else the
    binned equi-join — each interval explodes into the fixed-width bins it
    covers (``sequence``), the left value maps to one bin, and the join runs
    as a plain hash join on (bin, *by) with an exact-bounds post-filter.
    ``bin_width`` defaults to the average interval width (one tiny agg on the
    interval side), which bounds the per-interval fan-out near 2 bins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by = list(by or [])
    # right-side by-keys ride under internal names so the output carries one
    # unambiguous copy (the left's)
    r_renamed = right
    for k in by:
        r_renamed = r_renamed.withColumnRenamed(k, f"__r_{k}")
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
    for k in by:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    strategy = range_strategy(right) if mode == "auto" else mode
    if strategy == "broadcast":
        joined = left.join(F.broadcast(r_renamed), cond, how)
        return joined.drop(*[f"__r_{k}" for k in by])

    # binned path — both sides big
    if bin_width is None:
        w_row = right.agg(F.avg(F.col(hi_col) - F.col(lo_col)).alias("w")).first()
        bin_width = float(w_row["w"] or 1.0) or 1.0
    # how='left' unmatched recovery anti-joins on a synthetic unique id, NOT on
    # the left columns: plain column equality is not null-safe, so a matched
    # left row with a null in any payload column would fail to match itself
    # and be re-emitted with null right columns (duplicate output row).
    # The id MUST be read from one materialization: mIId depends on runtime
    # partition layout, and l_src feeds TWO subtrees (the bin join and the
    # anti-join recovery). Recomputed independently after an upstream shuffle,
    # the subtrees could assign different ids — duplicating matched rows or
    # dropping unmatched ones. localCheckpoint(eager) pins one assignment;
    # the materialization cost is the price of a stable synthetic key (the
    # null-safe-on-all-columns alternative shuffles the full row width twice).
    lid = "__range_lid"
    l_src = (
        left.withColumn(lid, F.monotonically_increasing_id()).localCheckpoint(eager=True)
        if how == "left"
        else left
    )
    binned_r = r_renamed.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    binned_l = l_src.withColumn("__bin", F.floor(F.col(value_col) / F.lit(bin_width)).cast("long"))
    jcond = F.col("__bin") == F.col("__r_bin")
    for k in by:
        jcond = jcond & (F.col(k) == F.col(f"__r_{k}"))
    binned_r = binned_r.withColumnRenamed("__bin", "__r_bin")
    joined = (
        binned_l.join(binned_r, jcond, "inner")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col)))
        .drop("__bin", "__r_bin", *[f"__r_{k}" for k in by])
    )
    if how == "left":
        # left rows with no interval: anti-join on the unique id (null-safe by
        # construction), re-emit with null right cols
        matched_ids = joined.select(lid).distinct()
        unmatched = l_src.join(matched_ids, [lid], "left_anti")
        for c in right.columns:
            if c not in by:
                unmatched = unmatched.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
        joined = joined.unionByName(unmatched).drop(lid)
    return joined
