"""r15: stage attribution for the KMV sketch path (guide §1 — find WHERE
the time goes before changing anything). Stages: shingle explode, +md5,
+distinct, +slice window, +group window (= kmv_sketch), full overlap query.

Run: python examples/prof_r15_kmv.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.llm.dedup import shingles  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def jobs(spark):
    return len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None))


def run(spark, tag, fn, n=3):
    outs = []
    for _ in range(n):
        j0, t0 = jobs(spark), time.perf_counter()
        fn()
        outs.append((round(time.perf_counter() - t0, 3), jobs(spark) - j0))
    print(
        f"{tag:46s} best={min(o[0] for o in outs):7.3f}s jobs={outs[-1][1]}  {[o[0] for o in outs]}",
        flush=True,
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_kmv")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    docs.count()

    kk = 256
    sh = docs.select(F.col("source").alias("grp"), F.explode(shingles("text", 3)).alias("sh"))
    run(spark, "kmv/1 shingle explode only", lambda: noop(sh))
    hm = sh.select("grp", F.md5("sh").alias("h"))
    run(spark, "kmv/2 +md5 per occurrence", lambda: noop(hm))
    hd = hm.distinct()
    run(spark, "kmv/3 +distinct (grp,h)", lambda: noop(hd))
    w1 = Window.partitionBy("grp", F.substring("h", 1, 1)).orderBy("h")
    s1 = hd.withColumn("rn", F.row_number().over(w1)).filter(F.col("rn") <= kk).drop("rn")
    run(spark, "kmv/4 +slice window", lambda: noop(s1))
    w2 = Window.partitionBy("grp").orderBy("h")
    sk = (
        s1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= kk)
        .select(F.col("grp").alias("source"), "h", "rank")
    )
    run(spark, "kmv/5 full kmv_sketch", lambda: noop(sk))

    # variant: md5 AFTER the distinct on the raw shingle string — the
    # distinct shuffles ~20-char grams instead of 32-char hex, and each
    # duplicated (grp, gram) occurrence skips its md5
    hd2 = sh.distinct().select("grp", F.md5("sh").alias("h"))
    run(spark, "kmv/alt distinct-then-md5", lambda: noop(hd2))

    # variant: dense_rank over the occurrence stream (distinct + bottom-k in
    # ONE shuffle on (grp, slice)) then dropDuplicates
    wd = Window.partitionBy("grp", F.substring("h", 1, 1)).orderBy("h")
    s1d = (
        hm.withColumn("dr", F.dense_rank().over(wd))
        .filter(F.col("dr") <= kk)
        .drop("dr")
        .dropDuplicates(["grp", "h"])
    )
    run(spark, "kmv/alt dense_rank one-shuffle slice", lambda: noop(s1d))

    import __spark_entry__ as entry

    qs = entry.queries()
    run(spark, "entry/source_overlap_kmv_docs", lambda: noop(qs["source_overlap_kmv_docs"](spark, sf_dir)), n=2)
    run(spark, "entry/kmv_distinct_docs", lambda: noop(qs["kmv_distinct_docs"](spark, sf_dir)), n=2)
    spark.stop()


if __name__ == "__main__":
    main()
