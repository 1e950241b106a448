"""r15: A/B the candidate-shingle lineage cuts in jaccard_verify and
verify_components (each joined one shingle frame from two sides; without a
cut each side re-evaluated the corpus scan + candidate semi-join + shingle
tokenization — two independent subtrees in the plan). OLD forms inline."""

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


def jaccard_verify_old(df, pairs, key="text", id_col="doc_id", n_shingle=3, threshold=0.8):
    from analyst_toolkit_spark.llm.dedup import shingles

    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sub = df.join(F.broadcast(ids), id_col, "left_semi")
    sh = sub.select(F.col(id_col), shingles(key, n_shingle).alias("sh"))
    return (
        pairs.join(sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def verify_components_old(df, components, key="text", id_col="doc_id", n_shingle=3, threshold=0.8):
    from analyst_toolkit_spark.llm.dedup import shingles

    ids = (
        components.select(F.col("node").alias(id_col))
        .union(components.select(F.col("component").alias(id_col)))
        .distinct()
    )
    sub = df.join(ids, id_col, "left_semi")
    sh = sub.select(F.col(id_col), shingles(key, n_shingle).alias("__sh"))
    member = components.join(sh, components["node"] == sh[id_col]).select(
        "node", "component", F.col("__sh").alias("__m_sh")
    )
    rep_sh = sh.select(F.col(id_col).alias("__rep_id"), F.col("__sh").alias("__r_sh"))
    joined = member.join(rep_sh, member["component"] == rep_sh["__rep_id"])
    inter = F.size(F.array_intersect("__m_sh", "__r_sh"))
    union = F.size(F.array_union("__m_sh", "__r_sh"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    return joined.select(
        "node",
        F.when((F.col("node") == F.col("component")) | (jac >= threshold), F.col("component"))
        .otherwise(F.col("node"))
        .alias("component"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_verify")
    spark.sparkContext.setLogLevel("ERROR")
    from analyst_toolkit_spark.llm import dedup as D

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()

    # fixed candidate set for the verify A/B (eager so both forms read it)
    cands = D.minhash_candidates(docs, "text", "doc_id").localCheckpoint(eager=True)
    print("candidate pairs:", cands.count(), flush=True)

    def key(df):
        return sorted(map(tuple, df.collect()))

    a = run(spark, "jaccard_verify OLD (two sh subtrees)", lambda: key(
        jaccard_verify_old(docs, cands, threshold=0.5)))
    b = run(spark, "jaccard_verify NEW (sh cut)", lambda: key(
        D.jaccard_verify(docs, cands, threshold=0.5)))
    print("identical:", a == b, len(a), flush=True)

    # end-to-end headline query shape (lazy pair pipeline, noop sink)
    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    run(spark, "minhash_dedup_pairs eager=False NEW e2e", lambda: noop(
        D.minhash_dedup_pairs(docs, threshold=0.5, eager=False)))

    comps = D.bucket_components(docs, k=8, bands=4, method="md5").localCheckpoint(eager=True)
    print("clustered nodes:", comps.count(), flush=True)
    c = run(spark, "verify_components OLD", lambda: key(
        verify_components_old(docs, comps, threshold=0.8)))
    d = run(spark, "verify_components NEW (sh cut)", lambda: key(
        D.verify_components(docs, comps, threshold=0.8)))
    print("identical:", c == d, len(c), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
