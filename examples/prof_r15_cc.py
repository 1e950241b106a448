"""r15: empirical A/B of connected_components execution variants on the real
sf0.1 star-edge workload (guide §1.1 — empirical loop). Variants must produce
identical labels; timing + job counts decide."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402


def jobs(spark):
    return len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_cc")
    spark.sparkContext.setLogLevel("ERROR")
    from analyst_toolkit_spark.llm import dedup as D

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    banded = D._band_stream(docs, "text", "doc_id", 3, 64, 16)
    sent = D.sentinel_band_hash(spark, 64, 16)
    bf = banded.filter(F.col("band_hash") != F.lit(sent)).localCheckpoint(eager=True)
    bucket_key = F.xxhash64(F.col("band").cast("string"), F.col("band_hash").cast("string"))
    from pyspark.sql.window import Window
    tagged = bf.select(F.col("doc_id").cast("long").alias("__id"), bucket_key.alias("__bkt"))
    edges = (
        tagged.withColumn("__rep", F.min("__id").over(Window.partitionBy("__bkt")))
        .filter(F.col("__id") != F.col("__rep"))
        .select(F.col("__id").alias("id_a"), F.col("__rep").alias("id_b"))
    ).localCheckpoint(eager=True)
    print("edges:", edges.count(), flush=True)

    def run(tag, fn, n=3):
        outs = []
        for _ in range(n):
            j0, t0 = jobs(spark), time.perf_counter()
            res = fn()
            dt = time.perf_counter() - t0
            outs.append((round(dt, 3), jobs(spark) - j0, res))
        best = min(o[0] for o in outs)
        print(f"{tag:45s} best={best:7.3f}s jobs={outs[-1][1]}  {[o[0] for o in outs]}", flush=True)
        return outs[-1][2]

    # current implementation
    def cur():
        lab = D.connected_components(edges)
        return sorted(map(tuple, lab.collect()))

    # variant: scoped AQE-off session (global temp view handoff)
    def aqe_off():
        scoped = spark.newSession()
        scoped.conf.set("spark.sql.adaptive.enabled", "false")
        edges.createOrReplaceGlobalTempView("__cc_edges")
        try:
            lab = D.connected_components(scoped.table("global_temp.__cc_edges"))
            return sorted(map(tuple, lab.collect()))
        finally:
            spark.catalog.dropGlobalTempView("__cc_edges")

    # variant: 2 propagation+jump rounds per action (one cut+sum per TWO
    # rounds; identical fixpoint, ~half the driver actions). Local copy of
    # the library loop with the round body factored.
    def unroll2():
        sym = (
            edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
            .unionAll(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
            .distinct()
        )
        e = sym.repartition(F.col("dst")).cache()
        labels = (
            e.groupBy("src").agg(F.min("dst").alias("__m"))
            .select(F.col("src").alias("node"), F.least("src", F.col("__m")).alias("comp"))
            .localCheckpoint(eager=False)
        )
        _sum = F.sum(F.col("comp").cast("decimal(38,0)"))
        prev = labels.agg(_sum).first()[0]
        def round_(lab):
            prop = e.join(lab, e["dst"] == lab["node"], "inner").select(
                e["src"].alias("node"), F.col("comp")
            )
            l2 = lab.select(F.col("node").alias("j_node"), F.col("comp").alias("j_comp"))
            jump = lab.join(l2, lab["comp"] == l2["j_node"], "inner").select(
                lab["node"], l2["j_comp"].alias("comp")
            )
            return lab.unionAll(prop).unionAll(jump).groupBy("node").agg(F.min("comp").alias("comp"))
        for _ in range(13):
            labels = round_(round_(labels)).localCheckpoint(eager=False)
            cur_s = labels.agg(_sum).first()[0]
            if cur_s == prev:
                break
            prev = cur_s
        out = labels.select("node", F.col("comp").alias("component"))
        r = sorted(map(tuple, out.collect()))
        e.unpersist()
        return r

    a = run("connected_components (current, AQE on)", cur)
    b = run("connected_components (scoped AQE off)", aqe_off)
    c = run("connected_components (2 rounds/action)", unroll2)
    print("labels identical:", a == b == c, "n:", len(a), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
