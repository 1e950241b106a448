"""r15 optimization round (session 4) — A/B for the token-statistics batch:
bigram_pmi, token_rarity, tfidf_top_terms, token_distribution_drift,
token_drift_terms, decon_exposure. OLD forms below are verbatim copies of
the pre-change implementations (git db46031): each re-evaluated a
corpus-scale aggregate subtree once per consumer. NEW forms share one
materialization per aggregate (vocabulary-sized cuts unconditional,
doc-term-sized cuts behind TOKEN_STAT_CUT_MAX_INPUT_BYTES).

Asserts output identity, then interleaves timing (same session = same
host weather).

Run: python examples/prof_r15_textstats.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402

_RE = r"[a-z0-9']+"


def jobs(spark):
    return len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


# ---- OLD forms (verbatim pre-change) ----------------------------------------


def old_bigram_pmi(df, k=30, min_count=5, key="text"):
    toks = F.regexp_extract_all(F.lower(F.col(key)), F.lit(_RE), F.lit(0))
    n = F.size(toks)
    pairs_col = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    pairs = df.select(F.explode(pairs_col).alias("p")).select("p.a", "p.b")
    uni = df.select(F.explode(toks).alias("t")).groupBy("t").agg(
        F.count(F.lit(1)).alias("__cu")
    )
    big = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("pair_count"))
    nb = big.agg(F.sum("pair_count").alias("__nb"))
    nu = uni.agg(F.sum("__cu").alias("__nu"))
    scored = (
        big.filter(F.col("pair_count") >= int(min_count))
        .join(uni.withColumnsRenamed({"t": "a", "__cu": "__ca"}), "a")
        .join(uni.withColumnsRenamed({"t": "b", "__cu": "__cb"}), "b")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select(
            F.col("a").alias("term_a"),
            F.col("b").alias("term_b"),
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("__nb"))
                    / ((F.col("__ca") / F.col("__nu")) * (F.col("__cb") / F.col("__nu")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b")).limit(int(k))


def old_token_rarity(df, key="text", id_col="doc_id"):
    toks = F.regexp_extract_all(F.lower(F.col(key)), F.lit(_RE), F.lit(0))
    stream = df.select(F.col(id_col), F.explode_outer(toks).alias("token"))
    counts = (
        stream.filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    total = counts.agg(F.sum("__cnt").cast("double").alias("__total"))
    joined = stream.join(counts, "token", "left").crossJoin(F.broadcast(total))
    return joined.groupBy(id_col).agg(
        F.count(F.col("token")).alias("n_tokens"),
        F.round(F.avg(F.col("__total") / F.col("__cnt")), 6).alias("avg_rarity"),
    )


def old_tfidf_top_terms(df, k=3, key="text", id_col="doc_id"):
    from pyspark.sql import Window

    toks = F.regexp_extract_all(F.lower(F.col(key)), F.lit(_RE), F.lit(0))
    stream = df.select(F.col(id_col), F.explode(toks).alias("__t"))
    tf = stream.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__tf"))
    df_t = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(df_t, "__t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("__t").alias("term"),
            F.round(
                F.col("__tf") * F.log(F.lit(1.0) + F.col("__n") / F.col("__df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(id_col, "rank", "term", "tfidf")
    )


def _old_token_counts(df, key):
    toks = F.regexp_extract_all(F.lower(F.col(key)), F.lit(_RE), F.lit(0))
    return (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def old_token_drift_terms(df_a, df_b, key="text", top_n=20):
    ca = _old_token_counts(df_a, key).withColumnRenamed("c", "ca")
    cb = _old_token_counts(df_b, key).withColumnRenamed("c", "cb")
    j = ca.join(cb, "tok", "full_outer")
    totals = j.agg(F.sum("ca").alias("__ta"), F.sum("cb").alias("__tb"))
    freqs = j.crossJoin(F.broadcast(totals)).select(
        "tok",
        (F.coalesce(F.col("ca"), F.lit(0)) / F.col("__ta")).alias("freq_a"),
        (F.coalesce(F.col("cb"), F.lit(0)) / F.col("__tb")).alias("freq_b"),
    )
    delta = F.abs(F.col("freq_b") - F.col("freq_a"))
    return (
        freqs.withColumn("abs_delta", delta)
        .orderBy(F.desc("abs_delta"), F.asc("tok"))
        .limit(top_n)
    )


def old_decon_exposure(docs, benchmark, key="text", id_col="doc_id",
                       bench_key="text", bench_id_col="doc_id", n=8, threshold=0.5):
    from analyst_toolkit_spark.functions.stats import maybe_broadcast
    from analyst_toolkit_spark.llm.dedup import shingles

    bgrams = benchmark.select(
        F.col(bench_id_col).alias("__bid"), F.explode(shingles(bench_key, n)).alias("gram")
    )
    bsizes = bgrams.groupBy("__bid").agg(F.count(F.lit(1)).alias("__bsz"))
    bench_ids = benchmark.select(F.col(bench_id_col).alias("__bid")).distinct()
    dgrams = docs.select(
        F.col(id_col).alias("__did"), F.explode(shingles(key, n)).alias("gram")
    )
    shared = (
        dgrams.join(maybe_broadcast(bgrams), "gram")
        .groupBy("__did", "__bid")
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    pairs = shared.join(maybe_broadcast(bsizes), "__bid").withColumn(
        "__cont", F.round(F.col("__shared") / F.col("__bsz").cast("double"), 6)
    )
    per_item = pairs.groupBy("__bid").agg(
        F.sum((F.col("__cont") >= F.lit(float(threshold))).cast("long")).alias(
            "n_contaminated"
        ),
        F.max("__cont").alias("max_containment"),
    )
    return (
        bench_ids.join(bsizes, "__bid", "left")
        .join(per_item, "__bid", "left")
        .select(
            F.col("__bid").alias(bench_id_col),
            F.coalesce(F.col("__bsz"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.col("max_containment"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_textstats")
    spark.sparkContext.setLogLevel("ERROR")
    from analyst_toolkit_spark.llm import monitor as M
    from analyst_toolkit_spark.llm import text as T

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()
    docs_a = docs.filter(F.col("doc_id") % 2 == 0)
    docs_b = docs.filter(F.col("doc_id") % 2 == 1)
    bench = docs.filter(F.col("doc_id") % 25 == 0)

    arms = [
        ("pmi", lambda: old_bigram_pmi(docs), lambda: T.bigram_pmi(docs)),
        ("rarity", lambda: old_token_rarity(docs), lambda: T.token_rarity(docs)),
        ("tfidf", lambda: old_tfidf_top_terms(docs), lambda: T.tfidf_top_terms(docs, k=3)),
        ("drift", lambda: old_token_drift_terms(docs_a, docs_b),
         lambda: M.token_drift_terms(docs_a, docs_b)),
        ("exposure", lambda: old_decon_exposure(docs, bench, n=8, threshold=0.8),
         lambda: T.decon_exposure(docs, bench, n=8, threshold=0.8)),
    ]

    for tag, old, new in arms:
        a = sorted(tuple(r) for r in old().collect())
        b = sorted(tuple(r) for r in new().collect())
        assert a == b, f"{tag} MISMATCH: {len(a)} vs {len(b)}"
        print(f"{tag} identity OK: {len(a)} rows", flush=True)

    for tag, old, new in arms:  # compile warm-up
        noop(old())
        noop(new())
    results: dict = {}
    for _ in range(3):
        for tag, old, new in arms:
            for sub, fn in (("old", old), ("new", new)):
                spark.sparkContext.setJobDescription(f"textstats/{tag}/{sub}")
                j0, t0 = jobs(spark), time.perf_counter()
                noop(fn())
                results.setdefault(f"{tag}/{sub}", []).append(
                    round(time.perf_counter() - t0, 3)
                )
                print(f"{tag}/{sub}: {results[f'{tag}/{sub}'][-1]:.3f}s jobs={jobs(spark)-j0}", flush=True)
    spark.sparkContext.setJobDescription(None)
    print()
    for tag, xs in results.items():
        print(f"{tag}: best={min(xs):.3f}s samples={xs}")
    spark.stop()


if __name__ == "__main__":
    main()
