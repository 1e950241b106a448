"""r15 optimization round (session 4) — dedup_representatives_by A/B.

OLD form (HEAD before this change): winner election from a (id, score)
projection, then a membership semi-join that RE-EVALUATES the caller's
score expression over every surviving row.
NEW form: one lineage-cut (id, score) frame feeds the election, the
unclustered anti-join, and the returned rows' score column.

Asserts output identity (full rows, sorted), then interleaves timing on
the q_dedup_best_quality_docs shape (md5 bucket components + the 4-regex
quality_score projection).

Run: python examples/prof_r15_reps.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402


def old_representatives_by(df, components, score_col, id_col="doc_id"):
    """Verbatim copy of the pre-change implementation (git db46031)."""
    idt = dict(df.dtypes)[id_col]
    member = components.join(
        df.select(F.col(id_col).alias("__mid"), F.col(score_col).alias("__s")),
        components["node"].cast(idt) == F.col("__mid"),
    )
    winner = member.groupBy("component").agg(
        F.max(
            F.struct(F.col("__s"), (-F.col("node").cast("long")).alias("__negid"))
        ).alias("__w")
    ).select((-F.col("__w.__negid")).cast(idt).alias(id_col))
    clustered = components.select(F.col("node").cast(idt).alias(id_col))
    unclustered = df.select(id_col).join(clustered, id_col, "left_anti")
    keep = winner.unionByName(unclustered)
    return df.join(keep, id_col, "left_semi")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def _jobs(spark):
    return len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_reps")
    spark.sparkContext.setLogLevel("ERROR")

    from analyst_toolkit_spark.llm import dedup as D
    from analyst_toolkit_spark.llm import text as T

    docs = load_table(spark, sf_dir, "documents")
    comps = D.bucket_components(docs, k=8, bands=4, method="md5").localCheckpoint(
        eager=True
    )  # shared input: isolate the operator under test from the CC cost
    scored = docs.withColumn("__q", T.quality_score("text"))

    # ---- output identity (full rows) ------------------------------------
    a = sorted(
        tuple(r) for r in old_representatives_by(scored, comps, "__q").collect()
    )
    b = sorted(
        tuple(r) for r in D.dedup_representatives_by(scored, comps, "__q").collect()
    )
    assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows; first diff: " + str(
        next((x for x, y in zip(a, b) if x != y), None)
    )
    print(f"output identity OK: {len(a)} rows, full-width compare", flush=True)

    # ---- interleaved timing (same session = same weather) ----------------
    for tag, fn in [
        ("old", lambda: old_representatives_by(scored, comps, "__q")),
        ("new", lambda: D.dedup_representatives_by(scored, comps, "__q")),
    ]:
        noop(fn())  # compile warm-up
    results = {"old": [], "new": []}
    for _ in range(3):
        for tag, fn in [
            ("old", lambda: old_representatives_by(scored, comps, "__q")),
            ("new", lambda: D.dedup_representatives_by(scored, comps, "__q")),
        ]:
            spark.sparkContext.setJobDescription(f"reps/{tag}")
            j0 = _jobs(spark)
            t0 = time.perf_counter()
            noop(fn())
            dt = time.perf_counter() - t0
            results[tag].append(round(dt, 3))
            print(f"{tag}: {dt:.3f}s jobs={_jobs(spark)-j0}", flush=True)
    spark.sparkContext.setJobDescription(None)
    for tag, xs in results.items():
        print(f"{tag}: best={min(xs):.3f}s samples={xs}")
    spark.stop()


if __name__ == "__main__":
    main()
