"""r15: decompose curate_semantic_decon_docs (the heaviest decon composition)
and A/B the literal-tier fold shape in one session.

Stages: corpus build (docs join emb + mirrors) -> exact dedup -> literal
semantic decon -> md5 projection. Each increment timed with job deltas.
"""

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


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def run(spark, tag, fn, n=3):
    outs = []
    for _ in range(n):
        j0, t0 = jobs(spark), time.perf_counter()
        res = fn()
        outs.append((round(time.perf_counter() - t0, 3), jobs(spark) - j0, res))
    print(
        f"{tag:52s} best={min(o[0] for o in outs):7.3f}s jobs={outs[-1][1]}  {[o[0] for o in outs]}",
        flush=True,
    )
    return outs[-1][2]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_decon2")
    spark.sparkContext.setLogLevel("ERROR")
    from analyst_toolkit_spark.llm import curate as L_cur
    from analyst_toolkit_spark.llm import similarity as S

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    docs.count()

    base = docs.join(emb, "doc_id")
    mirrors = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 3000).alias("doc_id"),
        F.concat(F.lit("EVALCOPY "), F.col("text")).alias("text"),
        "embedding",
    )
    corpus = base.unionByName(mirrors)
    bench = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 5 == 0
    ).select("embedding")

    run(spark, "decon/1 corpus build (join+mirrors)", lambda: noop(corpus))
    run(spark, "decon/2 + exact dedup", lambda: noop(
        L_cur.curate_corpus(corpus, exact_dedup=True)[0]))
    run(spark, "decon/3 + literal decon (FULL chain)", lambda: noop(
        L_cur.curate_corpus(
            corpus, exact_dedup=True, semantic_benchmark=bench,
            semantic_decon_threshold=0.999,
        )[0].select("doc_id", F.md5("text").alias("text_md5"))))
    cut = corpus.localCheckpoint(eager=True)
    run(spark, "decon/4 literal decon alone (cut corpus)", lambda: noop(
        S.semantic_decontaminate(cut, bench, threshold=0.999)))
    # benchmark collect cost alone
    run(spark, "decon/5 bench collect only", lambda: bench.limit(2049).collect())

    # ---- A/B: array-level cast in the fold (shipped) vs per-element cast
    # (REJECTED alternative): moving the double-widening inside the zip
    # lambda (the dot_cols shape) was hypothesized to save |bench| casted
    # array materializations per row, but an interleaved min-of-4 at a
    # 1000-vector benchmark measured it SLOWER (17.4s vs 19.7s) — one
    # vectorized array cast beats |dim| interpreted per-element Cast nodes.
    # The shipped literal tier keeps the array-level cast; the fold cost is
    # the |bench| x dim multiply-adds themselves, which are inherent to the
    # exact max-cosine contract (the LSH tier is the escape hatch at scale).
    def decon_old(corpus_df, benchmark, threshold=0.999, vec_col="embedding"):
        from analyst_toolkit_spark.llm.similarity import _bench_literal, norm

        rows = benchmark.select(F.col(vec_col).alias("__b")).limit(2049).collect()
        blit, bench_dim = _bench_literal(rows, "__b")
        vec = F.col(vec_col).cast("array<double>")
        max_scaled = F.aggregate(
            blit,
            F.lit(None).cast("double"),
            lambda acc, b: F.greatest(
                acc,
                F.aggregate(
                    F.zip_with(vec, b["v"], lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / b["n"],
            ),
        )
        maxcos = (
            F.when(F.col(vec_col).isNull(), F.lit(None).cast("double"))
            .when(
                F.size(vec) != F.lit(bench_dim),
                F.raise_error(F.lit("dim")).cast("double"),
            )
            .otherwise(F.round(max_scaled / norm(F.col(vec_col)), 6))
        )
        return corpus_df.withColumn("max_bench_cosine", maxcos).withColumn(
            "contaminated", F.col("max_bench_cosine") >= F.lit(threshold)
        )

    a = run(spark, "decon/6 fold inline twin (array-level cast)", lambda: sorted(
        (r["doc_id"], r["max_bench_cosine"], r["contaminated"])
        for r in decon_old(cut, bench).collect()))
    b = run(spark, "decon/7 fold module (same shape)", lambda: sorted(
        (r["doc_id"], r["max_bench_cosine"], r["contaminated"])
        for r in S.semantic_decontaminate(cut, bench, threshold=0.999).collect()))
    print("fold outputs identical:", a == b, len(a), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
