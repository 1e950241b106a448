"""r15 optimization round (session 3) — same-session interleaved A/B for the
pca_fit single-pass fold (3 corpus actions -> 1) and the lsh_bucketed_pairs
unconditional cut (self-join re-evaluated the bucket frame twice). The OLD
forms are inlined verbatim so both run in one Spark session (one weather
regime); job counts per run are the weather-independent structural metric.

Run: python examples/prof_r15_pca.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402
from analyst_toolkit_spark.llm import similarity as S  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(spark, name, fn, n=3):
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    samples = []
    j0 = len(tracker.getJobIdsForGroup(None))
    for _ in range(n):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    jobs = (len(tracker.getJobIdsForGroup(None)) - j0) / n
    print(f"{name:52s} {min(samples):7.3f}s  jobs/run={jobs:.1f}  {samples}", flush=True)
    return min(samples)


def old_pca_fit(df, vec_col="embedding", k=8):
    """The pre-r15-opt pca_fit job structure: first + guard scan + moments
    job + sums job (driver eigh identical, so only the action shape matters
    for the A/B)."""
    df = df.filter(F.col(vec_col).isNotNull())
    first = df.select(F.size(vec_col).alias("d")).first()
    d = first["d"]
    bad = (
        df.filter((F.size(vec_col) != d) | F.exists(vec_col, lambda x: x.isNull()))
        .limit(1)
        .count()
    )
    assert not bad
    tri = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(d - 1)),
                lambda j: F.element_at(vec_col, i + 1).cast("double")
                * F.element_at(vec_col, j + 1).cast("double"),
            ),
        )
    )
    moments = (
        df.select(F.posexplode(tri).alias("slot", "v"))
        .groupBy("slot")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    sums = (
        df.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = sums[0]["n"]
    mean = np.zeros(d)
    for r in sums:
        mean[r["i"]] = r["s"] / n
    Smat = np.zeros((d, d))
    flat = {r["slot"]: r["s"] for r in moments}
    slot = 0
    for i in range(d):
        for j in range(i, d):
            Smat[i, j] = Smat[j, i] = flat[slot]
            slot += 1
    cov = Smat / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    return w, v


def old_lsh_pairs(df, dim, vec_col="embedding", id_col="vec_id", n_planes=6,
                  threshold=0.5, seed=42, bucket_vec_col=None):
    """Pre-r15-opt lsh_bucketed_pairs without the unconditional cut."""
    planes = S._hyperplanes(dim, n_planes, seed)
    d = df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        S.norm(F.col(vec_col)).alias("n"),
        S.hyperplane_bucket(F.col(bucket_vec_col or vec_col), planes).alias("bucket"),
    )
    a, b = d.alias("a"), d.alias("b")
    dot = S.dot_cols(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("cosine", F.round(dot / (F.col("a.n") * F.col("b.n")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"), "cosine")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_pca")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()

    for rnd in range(2):  # interleaved: old/new alternate inside one session
        timed(spark, f"[{rnd}] pca_fit OLD (4 actions)", lambda: old_pca_fit(emb))
        timed(spark, f"[{rnd}] pca_fit NEW (2 actions)", lambda: S.pca_fit(emb, k=8))
        timed(spark, f"[{rnd}] lsh_pairs OLD (no cut)", lambda: noop(
            old_lsh_pairs(emb, 64)
        ))
        timed(spark, f"[{rnd}] lsh_pairs NEW (cut)", lambda: noop(
            S.lsh_bucketed_pairs(emb, 64, n_planes=6, threshold=0.5)
        ))
        timed(spark, f"[{rnd}] semantic_dedup(pca) NEW full", lambda: noop(
            S.semantic_dedup(emb, 64, n_planes=6, threshold=0.5, pca_dims=8)
        ))

    spark.stop()


if __name__ == "__main__":
    main()
