"""r15: A/B the bm25 tokenize-pass count. Three forms of bm25_scores —
ORIG (no cuts: lens evaluated twice, tf's tokenize+explode twice = 4
tokenize passes), CUT2 (lens + tf lineage-cut = 2 passes), and BASE1 (one
projection computes dl AND the isin-filtered hit tokens behind one cut = 1
pass) — plus the join form with and without the lens/tf cuts. Each form's
output is collected and compared for identity.

Run: python examples/prof_r15_bm25.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402
from analyst_toolkit_spark.llm.text import _VOCAB_TOKEN_RE  # noqa: E402

TERMS = ["data", "model", "training", "quality", "the"]
K1, B = 1.2, 0.75


def jobs(spark):
    return len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None))


def run(spark, tag, fn, n=3):
    outs = []
    for _ in range(n):
        j0, t0 = jobs(spark), time.perf_counter()
        res = fn()
        outs.append((round(time.perf_counter() - t0, 3), jobs(spark) - j0, res))
    print(
        f"{tag:44s} best={min(o[0] for o in outs):7.3f}s jobs={outs[-1][1]}  {[o[0] for o in outs]}",
        flush=True,
    )
    return outs[-1][2]


def _finish(tf, lens, id_col):
    df_t = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    stats = lens.agg(F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "__t",
        F.log(
            F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
        ).alias("__idf"),
        "__avgdl",
    )
    scored = (
        tf.join(lens, id_col)
        .join(idf, "__t")
        .select(
            F.col(id_col),
            (
                F.col("__idf")
                * (F.col("__tf") * (K1 + 1))
                / (F.col("__tf") + K1 * (1 - B + B * F.col("__dl") / F.col("__avgdl")))
            ).alias("__s"),
        )
    )
    return scored.groupBy(id_col).agg(F.round(F.sum("__s"), 6).alias("score"))


def bm25_orig(df, terms, key="text", id_col="doc_id"):
    qt = [t.lower() for t in terms]
    toks = F.regexp_extract_all(F.lower(F.col(key)), F.lit(_VOCAB_TOKEN_RE), F.lit(0))
    lens = df.select(F.col(id_col), F.size(toks).alias("__dl"))
    hits = df.select(F.col(id_col), F.explode(toks).alias("__t")).filter(
        F.col("__t").isin(qt)
    )
    tf = hits.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__tf"))
    return _finish(tf, lens, id_col)


def bm25_cut2(df, terms, key="text", id_col="doc_id"):
    qt = [t.lower() for t in terms]
    toks = F.regexp_extract_all(F.lower(F.col(key)), F.lit(_VOCAB_TOKEN_RE), F.lit(0))
    lens = df.select(F.col(id_col), F.size(toks).alias("__dl")).localCheckpoint(eager=False)
    hits = df.select(F.col(id_col), F.explode(toks).alias("__t")).filter(
        F.col("__t").isin(qt)
    )
    tf = hits.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__tf")).localCheckpoint(
        eager=False
    )
    return _finish(tf, lens, id_col)


def bm25_base1(df, terms, key="text", id_col="doc_id"):
    qt = [t.lower() for t in terms]
    toks = F.regexp_extract_all(F.lower(F.col(key)), F.lit(_VOCAB_TOKEN_RE), F.lit(0))
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        F.filter(toks, lambda t: t.isin(qt)).alias("__ht"),
    ).localCheckpoint(eager=False)
    lens = base.select(id_col, "__dl")
    tf = (
        base.select(F.col(id_col), F.explode("__ht").alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .localCheckpoint(eager=False)
    )
    return _finish(tf, lens, id_col)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_bm25")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()

    def key(df):
        return sorted(map(tuple, df.collect()))

    a = run(spark, "bm25 ORIG (4 tokenize passes)", lambda: key(bm25_orig(docs, TERMS)))
    b = run(spark, "bm25 CUT2 (lens+tf cuts)", lambda: key(bm25_cut2(docs, TERMS)))
    c = run(spark, "bm25 BASE1 (one-pass base cut)", lambda: key(bm25_base1(docs, TERMS)))
    print("identical:", a == b == c, len(a), flush=True)

    # module form (whatever is currently shipped) vs the inline twins
    from analyst_toolkit_spark.llm import text as T

    d = run(spark, "bm25 MODULE (shipped)", lambda: key(T.bm25_scores(docs, TERMS)))
    print("module identical:", a == d, flush=True)

    # ---- join form: current module vs lens/tf-cut variant ----------------
    queries = spark.createDataFrame(
        [(i, [TERMS[i % len(TERMS)], TERMS[(i + 1) % len(TERMS)], "corpus"]) for i in range(40)],
        "query_id int, terms array<string>",
    ).localCheckpoint(eager=True)

    def keyq(df):
        return sorted(map(tuple, df.collect()))

    e = run(
        spark,
        "bm25_scores_join MODULE (40 queries)",
        lambda: keyq(T.bm25_scores_join(docs, queries)),
    )
    print("join rows:", len(e), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
