#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (round 3 — two changes over the r1/r2 protocol, both for honesty):

1. **Materialization is a noop WRITE, not count().** count() on a query whose
   result is a small exploded agg lets Catalyst prune the expensive aggregate
   expressions out of the plan entirely (the row count doesn't need the
   values), so count-based timings under-measured any strategy whose work
   sits in prunable expressions while fully charging strategies that do
   eager driver-side work. This was the entire "profile_lineitem regression"
   of round 2: the driver quantile tier is ~3x FASTER than the builtin
   aggregate once both are forced to produce every value.
   ``df.write.format("noop")`` executes the complete plan and discards the
   rows — what a real consumer pays, minus sink I/O.

2. **n>=3 runs per query, median + spread recorded** (VERDICT r2 item 7), so
   sub-0.3 s host-contention wobbles stop reading as regressions. "queries"
   carries the medians (the comparable number).

Round 4 fix: the r3 printed line also carried the full per-query "spread"
dict, which pushed it past the driver's tail-capture window — BENCH_r03.json
recorded ``"parsed": null``. The printed line is now kept compact (medians
only); spread/min/max detail goes to ``BENCH_DETAIL.json`` next to this file.

Round 7 fix (VERDICT r6 item 8): each query now gets ONE untimed warm-up
execution before its timed samples. The r6 profile_lineitem spread
[0.878, 2.606] was the first sample paying per-plan one-time costs (codegen
compile + the shared quartile memo that the outlier family reuses) that the
median never reflected — with n=3 the median was already the warm number, so
recorded medians stay comparable round-over-round; only the spread stops
charging session-order-dependent cold costs to whichever query runs first.
Cold-start cost is still measured where it is the story: the url_dedup
non-headline line records its first (codegen-compile) run explicitly.

Round 9 (VERDICT r8 #1): host-speed anchor. BENCH_r08 read 1.40x of r7
purely from VM load (judge-adjudicated); a fixed-work in-memory anchor now
runs before AND after the suite and the printed line carries ``anchor_sec``,
``anchor_ratio`` (load vs the per-slot quiet calibrations), and
``value_normalized``. Round 12 (r11 VERDICT #1): the normalization is now
SYMMETRIC — value_normalized = value / ratio always, so fast hosts stop
flattering the headline the way slow hosts used to inflate it; the 1.25
dead-band only labels the host quiet (``anchor_quiet``). See the ANCHOR_REF
block below for the measurements behind median-of-5 and pre+post slots.

Round 13 (r12 VERDICT #6): the micro anchor alone under-corrected suite-level
contention (r12: anchor "quiet" at 0.929 while sub-second parquet queries
drifted +40-50%), so a SUITE-LEVEL calibration probe — three fixed headline
queries timed pre+post against pinned quiet-host refs — now folds into
``anchor_ratio``; both components are recorded in the printed line so weather
is adjudicable from the artifact alone. Slot-disagreement rule (measured
incident this round): when the pre and post slot ratios disagree beyond
STORM_BAND the weather moved mid-run, and the correction takes the slot
closer to quiet instead of the average — a storm confined to one slot must
never normalize the whole suite (over-correction flatters; see the
``anchor_storm`` flag).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HEADLINE = [
    "profile_lineitem",
    "profile_customer",
    "dup_count_lineitem",
    "corr_lineitem",
    "validation_summary_orders",
    "dedup_keep_first_lineitem",
    "outlier_iqr_lineitem",
    "outlier_clip_lineitem",
    "impute_mean_customer",
    "impute_mode_customer",
    "normalize_text_customer",
    "datetime_parse_orders",
    "row_diff_orders",
    "value_audit_orders",
    "null_audit_orders",
    "data_dictionary_customer",
    "histogram_price",
    "boxplot_lineitem",
    "pipeline_orders",
    "pricing_summary",
    "join_region_revenue",
    "window_running_total",
    "events_daily",
    "events_sessions",
    "events_json_props",
    "asof_join_events",
    "range_join_bands",
    "text_stats_documents",
    "exact_dup_docs",
    "fingerprint_dup_docs",
    "minhash_pairs_docs",
    "quality_docs",
    "embedding_topk",
    "embedding_knn",
    "embedding_ivf_topk",
]


def _materialize(df) -> None:
    """Execute the full plan, every column produced, rows discarded."""
    df.write.mode("overwrite").format("noop").save()


# Host-speed anchor (r8 VERDICT #1): BENCH_r08 read 1.40x of r7 purely from
# VM load (judge-adjudicated — same code measured 7.57 s vs 10.63 s for an
# 8-query subset on quiet vs loaded host). The anchor is a FIXED-WORK
# in-memory plan — no parquet, no data-scale dependence: range(20M, 32
# parts) -> integer arithmetic -> 9973-key hash agg -> noop write. It
# exercises codegen + hash-agg + a small shuffle, the same machinery the
# suite spends its time in, so suite time scales ~linearly with it under
# CPU contention. ANCHOR_REF pins the quiet-host r9 measurement;
# value_normalized = value * ANCHOR_REF / anchor_sec is the
# round-over-round comparable number when hosts drift.
ANCHOR_REF = 0.52  # seconds: median-of-5, early-session, quiet r9 host (pre slot).
ANCHOR_REF_POST = 0.40  # same work in the post slot: by end of suite the JVM is
#                         fully JIT-warmed and the identical plan runs ~25%
#                         faster on a quiet host — each slot needs its own
#                         quiet calibration or the average mixes baselines
#                         (measured: quiet post-slot anchors 0.34-0.44 s).
#: The anchor is a LOAD detector, not a precision clock. Calibration on the
#: r9 host: quiet median-of-5 ~0.46-0.61 s; under a 32-thread pytest
#: 0.8-1.0 s; during a mid-round noisy-neighbor episode 1.59 s (while the
#: suite inflated uniformly 17.5 -> 21.9 s — the same weather that made the
#: driver's BENCH_r08 read 1.40x of r7). Two protocol consequences, both
#: learned from measurements this round:
#:   1. MEDIAN, not min — the VM's contention is intermittent, and a
#:      best-of-5 CPU burst dodges it (observed: min 0.445 during a run
#:      whose suite was 25% inflated). The suite experiences average
#:      weather; the anchor must too.
#:   2. The anchor runs BEFORE and AFTER the suite and averages — weather
#:      shifts within minutes here, and a single pre-run sample can
#:      misrepresent a 6-minute run (pre/post disagreement is itself a
#:      weather-change flag, recorded in BENCH_DETAIL).
#: Normalizing inside the quiet noise band would ADD noise, so the
#: correction engages only beyond the dead-band; on a quiet host
#: value_normalized EQUALS value and round comparisons are untouched.
ANCHOR_DEADBAND = 1.25  # |log ratio| band inside which the host is labeled quiet
#: r12 (r11 VERDICT #1): value_normalized = value / anchor_ratio ALWAYS —
#: symmetric in both directions, so a fast host no longer flatters the
#: committed headline (the r11 record: 17.358 s raw at ratio 0.81 was
#: honestly ~21.4 s anchor-adjusted). The dead-band now only sets the
#: ``anchor_quiet`` flag; it no longer suppresses the correction.

#: r13 (r12 VERDICT #6 / "What's wrong" #3): the in-memory micro anchor
#: demonstrably UNDER-corrects suite-level contention — BENCH_r12's anchor
#: read "quiet" (0.929) during a run whose sub-second parquet queries drifted
#: +40-50%. The micro anchor exercises codegen + hash-agg, but the drifted
#: paths' cost is task-scheduling + parquet-scan + shuffle-fetch latency over
#: many small tasks, which a single 32-partition in-memory plan barely
#: touches. The fix is a SUITE-LEVEL calibration probe: three fixed headline
#: queries (parquet scan + window + session gap-and-island — exactly the
#: shapes that drifted in r12) are timed pre and post suite against pinned
#: quiet-host refs, and ``anchor_ratio`` is now the geometric mean of the
#: micro ratio and the probe ratio. Both components are still recorded
#: (``anchor_ratio_micro`` / ``anchor_ratio_cal``) so round-over-round noise
#: is adjudicable from the artifact alone — a micro/cal disagreement IS the
#: "anchor missed the weather" flag that previously needed a manual rerun.
CAL_QUERIES = ("pricing_summary", "window_running_total", "events_sessions")

#: Bench protocol version, carried in the artifact so cross-round headline
#: comparisons are adjudicable from the record alone (r13 ADVICE): the r13
#: protocol moved the calibration slot BEFORE the timed suite (4 executions
#: each of three headline-shaped probes), so r13+ headlines run JIT/footer
#: warmer than the r01-r12 artifacts — a protocol effect, not a code
#: speedup. History: r3 noop-write materialization; r7 per-plan warm-up;
#: r9 host anchor; r12 symmetric normalization; r13 suite-level calibration
#: probes + storm rule; r14 probes FROZEN bench-local + this field.
BENCH_PROTOCOL = "r14-frozen-cal"
#: Per-query [pre-slot, post-slot] quiet-host medians — mean of TWO full
#: r13 quiet-host bench sessions (micro ratios 0.88 and 1.02, bracketing
#: quiet; sf0.1, local[32]); per-slot refs because the post slot is
#: JIT-warmer, same reasoning as ANCHOR_REF vs ANCHOR_REF_POST. Single
#: readings wobble ~±20% between quiet sessions, so each ref averages two
#: sessions and the ratio geomeans 3 queries x 2 slots.
CAL_REF = {
    "pricing_summary": [0.455, 0.303],
    "window_running_total": [0.312, 0.183],
    "events_sessions": [0.504, 0.531],
}


STORM_BAND = 1.35  # pre/post slot-ratio disagreement beyond this = weather moved mid-run


def combine_anchor_ratios(
    anchor_pre: float,
    anchor_post: float,
    cal_pre: dict,
    cal_post: dict,
) -> dict:
    """Pure ratio-combination logic (unit-tested in tests/test_bench_anchor.py).

    Each slot folds its micro reading and its suite-probe geomean against
    that slot's own quiet refs; slots agreeing within STORM_BAND average
    geometrically, disagreeing slots take the one CLOSER TO QUIET (a storm
    confined to one slot must never normalize the whole suite — measured
    incident r13: pre-slot-only storm would have over-corrected 21.9 s
    down to 10.9 s, the flattering direction r11 banned).
    """
    import math

    def _geomean(vals):
        return math.exp(sum(math.log(v) for v in vals) / len(vals))

    cal_pre_ratio = _geomean([cal_pre[n] / CAL_REF[n][0] for n in CAL_QUERIES])
    cal_post_ratio = _geomean([cal_post[n] / CAL_REF[n][1] for n in CAL_QUERIES])
    ratio_pre = math.sqrt((anchor_pre / ANCHOR_REF) * cal_pre_ratio)
    ratio_post = math.sqrt((anchor_post / ANCHOR_REF_POST) * cal_post_ratio)
    storm = max(ratio_pre, ratio_post) / min(ratio_pre, ratio_post) > STORM_BAND
    if storm:
        ratio = min(ratio_pre, ratio_post, key=lambda r: abs(math.log(r)))
    else:
        ratio = math.sqrt(ratio_pre * ratio_post)
    return {
        "ratio": round(ratio, 3),
        "ratio_pre": round(ratio_pre, 3),
        "ratio_post": round(ratio_post, 3),
        "ratio_micro": round((anchor_pre / ANCHOR_REF + anchor_post / ANCHOR_REF_POST) / 2, 3),
        "ratio_cal": round(math.sqrt(cal_pre_ratio * cal_post_ratio), 3),
        "storm": storm,
    }


# -- FROZEN calibration probes (r13 VERDICT "What's wrong" #1) ----------------
# CAL_REF pins QUIET-HOST timings of these three plans. If the probes ran the
# live registry code, a future code regression in pricing_summary /
# window_running_total / events_sessions would read as host load and be
# divided out of the headline — the exact flattering-direction hazard the
# storm rule exists to prevent. So the probes below are BENCH-LOCAL snapshots
# of the three registry plans at their r13 semantics, written against pyspark
# ONLY (no analyst_toolkit_spark import, no registry call — asserted by
# tests/test_bench_anchor.py): a regression anywhere in the engine cannot
# move them. REF-REFRESH RULE: these functions are never edited alongside
# the registry; if a probe plan must ever change (new Spark version, new
# testdata), re-measure CAL_REF on a quiet host in the same change and bump
# BENCH_PROTOCOL. The registry twins are sync-checked (results equal at
# sf0.001) so a deliberate registry change fails loudly instead of silently
# diverging from the pinned refs.
# All three tables carry only µs timestamps at every sf (checked r14), so a
# plain parquet read is byte-identical to the registry's load_table path.


def _cal_pricing_summary(spark, sf_dir):
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _cal_window_running_total(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).filter(
        F.col("o_custkey") % 100 == 0
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def _cal_events_sessions(spark, sf_dir):
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        df.groupBy(F.col("user_id"), F.session_window(F.col("ts"), "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


_CAL_PROBES = {
    "pricing_summary": _cal_pricing_summary,
    "window_running_total": _cal_window_running_total,
    "events_sessions": _cal_events_sessions,
}


def _cal_sec(spark, sf_dir) -> dict[str, float]:
    """Suite-level calibration slot: median-of-3 of the three FROZEN probe
    plans (each warmed once untimed, same per-plan protocol as the
    headline). Frozen = bench-local code, never the live registry — see the
    _CAL_PROBES block above for why and for the ref-refresh rule."""
    out: dict[str, float] = {}
    for name in CAL_QUERIES:
        fn = _CAL_PROBES[name]
        _materialize(fn(spark, sf_dir))  # warm-up, untimed
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 3)
    return out


def _anchor_sec(spark) -> float:
    from pyspark.sql import functions as F

    def _plan():
        return (
            spark.range(0, 20_000_000, 1, 32)
            .select(
                (F.col("id") % 9973).alias("k"),
                ((F.col("id") * 2654435761) % 4294967296).alias("h"),
            )
            .groupBy("k")
            .agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("n"), F.avg("h").alias("a"))
        )

    _materialize(_plan())  # warm-up, untimed
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        _materialize(_plan())
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    runs = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    import __spark_entry__ as entry_mod
    from analyst_toolkit_spark.session import get_spark

    spark = get_spark("analyst_toolkit_spark_bench")
    # r10 VERDICT #7: BENCH_r10's captured tail carried a truncated
    # DAGScheduler accumulator stack (a benign post-completion accumulator
    # update logged at ERROR by the JVM; rc=0, suite complete, JSON intact).
    # The bench record must stay machine-clean: silence JVM log4j for the
    # run — rc + the printed JSON line are the only channel a bench needs,
    # and genuine failures still surface as Python exceptions (rc != 0).
    spark.sparkContext.setLogLevel("OFF")
    print("# jvm log level OFF for the bench run (tail hygiene, r10 VERDICT #7)", file=sys.stderr)
    qs = entry_mod.queries()

    # warm the JVM + parquet footers once (excluded from timings)
    _materialize(qs["pricing_summary"](spark, sf_dir))

    anchor_pre = _anchor_sec(spark)
    print(f"# host anchor (pre): {anchor_pre:.3f}s (ref {ANCHOR_REF})", file=sys.stderr)
    cal_pre = _cal_sec(spark, sf_dir)
    print(f"# suite calibration (pre): {cal_pre}", file=sys.stderr)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        _materialize(fn(spark, sf_dir))  # per-plan warm-up, untimed (r7 protocol)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _materialize(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]
        print(f"# {name}: median={timings[name]:.3f}s spread={spread[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)

    # Non-headline tracked operators (VERDICT r5 item 5): the heaviest work
    # the engine does — incremental index write/probe (both tiers) and the
    # full curation chain — lives outside the frozen 35-query HEADLINE so
    # round-over-round comparisons stay stable, but a regression there must
    # still be visible to the driver. Recorded in BENCH_DETAIL.json only;
    # excluded from the headline total and the compact printed line.
    import tempfile

    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import incremental as L_inc

    # Python-boundary warm (r15 optimization round — measurement fix,
    # disclosed in OPTIMIZATION_r15.md with the old numbers kept): the
    # headline loop warms JIT/parquet footers with an untimed run per plan,
    # but the session's FIRST Python-seam job additionally pays the
    # one-time Python worker-pool spawn + per-worker numpy/pandas import +
    # Arrow serializer classload — measured 10.8 s cold vs 1.6 s warm for
    # media_data_card_docs on a quiet host, landing entirely on whichever
    # Python row happens to run first (every other bench row is pure JVM).
    # Warm the pool once, untimed, exactly as the JVM gets warmed above, so
    # per-row medians measure the operators. All-JVM rows are unaffected.
    def _py_pool_warm(batches):
        # the same heavyweight imports the Python-seam rows' generators pay
        # per worker: numpy/pandas plus the toolkit package itself
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        from analyst_toolkit_spark.llm import multimodal  # noqa: F401

        for pdf in batches:
            yield pdf

    t0 = time.perf_counter()
    _materialize(
        spark.range(0, 32, 1, 32).mapInPandas(_py_pool_warm, "id long")
    )
    print(
        f"# python worker pool warm (untimed): {time.perf_counter() - t0:.3f}s",
        file=sys.stderr,
    )

    nh_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_NH_RUNS", "2")))
    non_headline: dict[str, float] = {}
    nh_spread: dict[str, list[float]] = {}

    def _nh(name, fn):
        samples = []
        for _ in range(nh_runs):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        non_headline[name] = round(statistics.median(samples), 3)
        nh_spread[name] = [round(min(samples), 3), round(max(samples), 3)]
        print(
            f"# [non-headline] {name}: median={non_headline[name]:.3f}s spread={nh_spread[name]}",
            file=sys.stderr,
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _nh(
        "dedup_index_write_exact_near",
        lambda: L_inc.dedup_index_write(docs, tempfile.mkdtemp(prefix="bench_idx_"), layers=("exact", "near")),
    )
    probe_idx = tempfile.mkdtemp(prefix="bench_idx_probe_")
    L_inc.dedup_index_write(docs, probe_idx, layers=("exact", "near"))  # untimed setup
    tiny = docs.limit(3).localCheckpoint(eager=True)  # point-lookup tier (isin pushdown)
    _nh("dedup_index_probe_point", lambda: _materialize(L_inc.exact_probe(spark, probe_idx, tiny)))
    # full corpus as the batch: > PROBE_ISIN_MAX distinct fps -> join tier
    _nh("dedup_index_probe_join", lambda: _materialize(L_inc.exact_probe(spark, probe_idx, docs)))
    _nh("dedup_index_near_probe", lambda: _materialize(L_inc.near_probe(spark, probe_idx, tiny)))
    if "curate_docs" in qs:
        _nh("curate_chain_8stage", lambda: _materialize(qs["curate_docs"](spark, sf_dir)))
    # late-r6 heavy text operators (exact-substring spans + char-LM scoring):
    # count() prunes the span subtree entirely (PLANS.md note), so these are
    # only honest under the same noop-write materialization
    for nh_name in ("repeated_spans_docs", "remove_spans_docs", "charlm_quality_docs"):
        if nh_name in qs:
            _nh(nh_name, lambda fn=qs[nh_name]: _materialize(fn(spark, sf_dir)))
    # r7 additions (VERDICT r6 item 4): the bipartite bucket-clustering twins
    # are now among the heaviest operators the engine runs (~10 s at sf0.1)
    # and url_dedup's one-shot janino compile is its dominant cost — track
    # all three here so a regression is visible round-over-round. url_dedup
    # records the COLD (first-compile) run explicitly, then warm medians.
    if "url_dedup_docs" in qs:
        t0 = time.perf_counter()
        _materialize(qs["url_dedup_docs"](spark, sf_dir))
        non_headline["url_dedup_docs_cold"] = round(time.perf_counter() - t0, 3)
        print(
            f"# [non-headline] url_dedup_docs_cold: {non_headline['url_dedup_docs_cold']:.3f}s",
            file=sys.stderr,
        )
        _nh("url_dedup_docs_warm", lambda: _materialize(qs["url_dedup_docs"](spark, sf_dir)))
    for nh_name in ("dedup_bucket_components_docs", "minhash_md5_components_docs"):
        if nh_name in qs:
            _nh(nh_name, lambda fn=qs[nh_name]: _materialize(fn(spark, sf_dir)))
    # r8 (VERDICT r7 item 4): the near-dedup auto-gate's own end-to-end cost
    # (one shared banding cut + census + the chosen path), in BOTH regimes —
    # the default cap takes the pair path at sf0.1; cap=0 forces the linear
    # bucket path — so the gate's overhead is visible outside the curate chain.
    from analyst_toolkit_spark.llm import dedup as L_dedup

    def _auto_gate(cap):
        comps, strategy = L_dedup.near_dedup_components(docs, pair_cap=cap)
        _materialize(comps)

    _nh("near_dedup_auto_pairs", lambda: _auto_gate(None))
    _nh("near_dedup_auto_buckets_forced", lambda: _auto_gate(0))
    # late-r8 selection/sketch/semantic-dedup operators: corpus-pass costs
    # (DSIR single tokenize + cut, KMV distinct-shingle stream, LSH pairs +
    # eager CC fixpoint) tracked so the single-pass guarantees stay honest.
    for nh_name in ("dsir_weights_docs", "source_overlap_kmv_docs", "semantic_dedup_embeddings"):
        if nh_name in qs:
            _nh(nh_name, lambda fn=qs[nh_name]: _materialize(fn(spark, sf_dir)))
    # r9 additions: the deterministic md5 curate chain (two bucket
    # clusterings + span surgery — the heaviest new composition) and BM25
    # (one filtered explode + TakeOrdered — should stay sub-second)
    for nh_name in ("curate_md5_docs", "bm25_topk_docs"):
        if nh_name in qs:
            _nh(nh_name, lambda fn=qs[nh_name]: _materialize(fn(spark, sf_dir)))
    # r11 additions: the containment-policy curate chain (exact dedup +
    # Broder subset-drop — the heaviest new composition) and the skew-safe
    # grouped top-k (its two-phase shape must stay ~grouped_ntile-priced)
    for nh_name in ("curate_containment_docs", "quality_topk_per_source_docs"):
        if nh_name in qs:
            _nh(nh_name, lambda fn=qs[nh_name]: _materialize(fn(spark, sf_dir)))
    # r12 additions: the semantic-curate composition (exact dedup + embedding
    # LSH + CC + survivor election over the doc⋈embedding corpus — the
    # heaviest new chain) and the multimodal data card (header-parse seam)
    for nh_name in ("curate_semantic_docs", "media_data_card_docs"):
        if nh_name in qs:
            _nh(nh_name, lambda fn=qs[nh_name]: _materialize(fn(spark, sf_dir)))
    # late-r12 additions: the zero-shuffle decontamination scan (its cost is
    # the per-row literal fold — any shuffle regression shows as a jump), the
    # semantic-decon curate composition, and the shard-manifest prefix sum
    for nh_name in (
        "semantic_decontaminate_embeddings",
        "curate_semantic_decon_docs",
        "training_shards_docs",
        "semantic_index_probe",
    ):
        if nh_name in qs:
            _nh(nh_name, lambda fn=qs[nh_name]: _materialize(fn(spark, sf_dir)))
    # r13 additions: the seeded global permutation (its one range exchange +
    # prefix sum must stay ~shard_assign-priced) and the fractional-epoch
    # upsampler (map-only — any shuffle regression shows as a jump)
    for nh_name in ("global_shuffle_docs", "epoch_mix_docs"):
        if nh_name in qs:
            _nh(nh_name, lambda fn=qs[nh_name]: _materialize(fn(spark, sf_dir)))

    cal_post = _cal_sec(spark, sf_dir)
    print(f"# suite calibration (post): {cal_post}", file=sys.stderr)
    anchor_post = _anchor_sec(spark)
    print(f"# host anchor (post): {anchor_post:.3f}s (ref {ANCHOR_REF_POST})", file=sys.stderr)
    # load ratio = mean of each slot's ratio to ITS quiet calibration; the
    # pre/post disagreement is the weather-changed-mid-run flag
    anchor = round((anchor_pre + anchor_post) / 2, 3)
    # Per-SLOT combined ratios + the storm rule — see combine_anchor_ratios
    # (pure, unit-tested). The micro anchor detects pure-CPU contention with
    # zero data dependence; the suite probe detects the scheduling / scan /
    # shuffle weather the micro anchor missed in r12.
    combined = combine_anchor_ratios(anchor_pre, anchor_post, cal_pre, cal_post)
    ratio = combined["ratio"]
    ratio_micro = combined["ratio_micro"]
    ratio_cal = combined["ratio_cal"]
    ratio_pre = combined["ratio_pre"]
    ratio_post = combined["ratio_post"]
    storm = combined["storm"]
    # r11 VERDICT #1: normalize SYMMETRICALLY — a host running faster than
    # the anchor calibration flatters the raw headline exactly as much as a
    # slow host inflates it, so value_normalized divides by the ratio in
    # BOTH directions (17.358 s raw at ratio 0.81 is honestly ~21.4 s
    # anchor-adjusted). The dead-band no longer gates the correction — it
    # only labels the host "quiet" so round-over-round readers know when the
    # raw and normalized numbers are expected to agree within noise.
    quiet = max(ratio, 1.0 / ratio if ratio > 0 else float("inf")) <= ANCHOR_DEADBAND
    normalized = round(total / ratio, 3)
    detail = {
        "metric": "module_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "anchor_sec": anchor,
        "anchor_pre": anchor_pre,
        "anchor_post": anchor_post,
        "anchor_ref": [ANCHOR_REF, ANCHOR_REF_POST],
        "anchor_ratio": ratio,
        "anchor_ratio_micro": ratio_micro,
        "anchor_ratio_cal": ratio_cal,
        "anchor_ratio_pre": round(ratio_pre, 3),
        "anchor_ratio_post": round(ratio_post, 3),
        "anchor_storm": storm,
        "cal_pre": cal_pre,
        "cal_post": cal_post,
        "cal_ref": CAL_REF,
        "bench_protocol": BENCH_PROTOCOL,
        "anchor_quiet": quiet,
        "value_normalized": normalized,
        "queries": timings,
        "spread": spread,
        "non_headline": non_headline,
        "non_headline_spread": nh_spread,
        "non_headline_runs": nh_runs,
        "runs": runs,
        "materialize": "noop-write",
        "sf": sf,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass  # read-only checkout: the printed line still carries the medians
    # ONE compact line for the driver: keep it well under the tail-capture
    # window (the r3 line with "spread" inline exceeded it and parsed as null).
    print(
        json.dumps(
            {
                "metric": "module_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "anchor_sec": anchor,
                "anchor_ratio": ratio,
                "anchor_ratio_micro": ratio_micro,
                "anchor_ratio_cal": ratio_cal,
                "anchor_storm": storm,
                "protocol": BENCH_PROTOCOL,
                "value_normalized": normalized,
                "queries": timings,
                "runs": runs,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
