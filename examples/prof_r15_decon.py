"""Same-session A/B for the semantic_decon_exposure norm projection edit.

OLD form: norm(vec) inlined in the per-bench-vector lambda (evaluated
|bench| times per corpus row). NEW form: norm projected once per row as
``__nv`` (checked against CollapseProject re-inlining via plan text).
"""
import os, sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.shuffle.partitions", "64")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E
from analyst_toolkit_spark.llm import similarity as L_sim
from analyst_toolkit_spark.llm.similarity import norm, _bench_literal

sf = "/root/testdata/sf0.1"


def build():
    emb = E.load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    bench = emb.filter(F.col("vec_id") < 10)
    planted = bench.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    corpus = emb.filter(F.col("vec_id") >= 10).unionByName(planted)
    return corpus, bench


def old_form(corpus, benchmark, threshold=0.999, vec_col="embedding", bench_id_col="vec_id"):
    rows = (
        benchmark.select(F.col(bench_id_col).alias("__bid"), F.col(vec_col).alias("__b"))
        .limit(10001)
        .collect()
    )
    blit, bench_dim = _bench_literal(rows, "__b")
    vec = F.col(vec_col).cast("array<double>")
    pairs = F.transform(
        blit,
        lambda b, i: F.struct(
            i.alias("i"),
            F.round(
                F.aggregate(
                    F.zip_with(vec, b["v"], lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / (b["n"] * norm(F.col(vec_col))),
                6,
            ).alias("cos"),
        ),
    )
    hits = F.filter(pairs, lambda s: s["cos"] >= F.lit(float(threshold)))
    guarded = (
        F.when(F.col(vec_col).isNull(), F.array().cast("array<struct<i:int,cos:double>>"))
        .when(
            F.size(vec) != F.lit(bench_dim),
            F.raise_error(F.lit("dim")).cast("array<struct<i:int,cos:double>>"),
        )
        .otherwise(hits.cast("array<struct<i:int,cos:double>>"))
    )
    exposed = (
        corpus.select(F.explode(guarded).alias("__h"))
        .groupBy(F.col("__h.i").alias("__i"))
        .agg(
            F.count(F.lit(1)).alias("n_contaminated"),
            F.max("__h.cos").alias("max_corpus_cosine"),
        )
    )
    bid_type = dict(benchmark.dtypes)[bench_id_col]
    ids = spark.createDataFrame(
        [(i, r["__bid"]) for i, r in enumerate(rows)],
        schema=f"__i int, {bench_id_col} {bid_type}",
    )
    return ids.join(exposed, "__i", "left").select(
        bench_id_col,
        F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
        F.col("max_corpus_cosine"),
    )


corpus, bench = build()


def timeit(fn, n=3):
    best = 1e9
    for _ in range(n):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return best


def run_new():
    L_sim.semantic_decon_exposure(corpus, bench, threshold=0.999).write.format(
        "noop"
    ).mode("overwrite").save()


def run_old():
    old_form(corpus, bench).write.format("noop").mode("overwrite").save()


# warm both, then interleave
run_new(); run_old()
spark.sparkContext.setJobDescription("decon_exposure_old")
t_old = timeit(run_old)
spark.sparkContext.setJobDescription("decon_exposure_new")
t_new = timeit(run_new)
spark.sparkContext.setJobDescription("decon_exposure_old2")
t_old2 = timeit(run_old)
spark.sparkContext.setJobDescription("decon_exposure_new2")
t_new2 = timeit(run_new)
print(f"OLD best: {min(t_old, t_old2):.3f}  NEW best: {min(t_new, t_new2):.3f}")

a = sorted(map(tuple, old_form(corpus, bench).collect()))
b = sorted(map(tuple, L_sim.semantic_decon_exposure(corpus, bench, threshold=0.999).collect()))
print("results equal:", a == b)
spark.stop()
