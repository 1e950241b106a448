"""r15 optimization round — A/B for connected_components' symmetrized-edge
build: old two-arm union (evaluates the caller's lazy pair plan TWICE) vs
new explode(array(struct,struct)) (one evaluation). Full-operator timing on
the real consumers whose pair inputs are lazy: bucket_components(md5) and
semantic_dedup. Labels must be identical.

Run: python examples/prof_r15_sym.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402
from analyst_toolkit_spark.llm import dedup as D  # noqa: E402
from analyst_toolkit_spark.llm import similarity as S  # noqa: E402

cc_new = D.connected_components


def cc_old_sym(pairs, id_a="id_a", id_b="id_b", max_iter=25, checkpoint_dir=None):
    """connected_components with the pre-r15 two-arm union sym build; the
    rest of the loop is the library's own code path (monkeypatch seam)."""
    assert checkpoint_dir is None
    sym = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # re-enter the library loop with pre-symmetrized edges: src->dst rows fed
    # as pairs produce the same sym (explode emits both directions; distinct
    # collapses) — but that would hide the cost under test. Instead inline
    # the loop body exactly as the library has it.
    edges = sym.repartition(F.col("dst")).cache()
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__mindst"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("__mindst")).alias("comp"),
        )
        .localCheckpoint(eager=False)
    )
    if dict(sym.dtypes)["src"] in ("string", "binary"):
        _label_sum = F.sum(F.xxhash64(F.col("comp")).cast("decimal(38,0)"))
    else:
        _label_sum = F.sum(F.col("comp").cast("decimal(38,0)"))
    prev_sum = labels.agg(_label_sum).first()[0]
    for _ in range(max_iter):
        prop = edges.join(labels, edges["dst"] == labels["node"], "inner").select(
            edges["src"].alias("node"), F.col("comp")
        )
        l2 = labels.select(F.col("node").alias("j_node"), F.col("comp").alias("j_comp"))
        jump = labels.join(l2, labels["comp"] == l2["j_node"], "inner").select(
            labels["node"], l2["j_comp"].alias("comp")
        )
        labels = (
            labels.unionAll(prop)
            .unionAll(jump)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(_label_sum).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def jobs(spark):
    return len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None))


def run(spark, tag, fn, n=3):
    outs = []
    for _ in range(n):
        j0, t0 = jobs(spark), time.perf_counter()
        res = fn()
        outs.append((round(time.perf_counter() - t0, 3), jobs(spark) - j0, res))
    best = min(o[0] for o in outs)
    print(f"{tag:50s} best={best:7.3f}s jobs={outs[-1][1]}  {[o[0] for o in outs]}", flush=True)
    return outs[-1][2]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_sym")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()

    def bucket_md5():
        lab = D.bucket_components(docs, key="text", id_col="doc_id", k=8, bands=4, method="md5")
        return sorted(map(tuple, lab.collect()))

    def sem_dedup():
        out = S.semantic_dedup(emb, 64, n_planes=6, threshold=0.5).select(
            "vec_id", "component", "is_rep"
        )
        return sorted(map(tuple, out.collect()))

    # interleave variants (one weather regime per adjacent pair); the
    # monkeypatch is picked up because similarity imports
    # connected_components inside the function body.
    results = {}
    for rep in range(3):
        for label, cc in (("NEW explode-sym", cc_new), ("OLD union-sym", cc_old_sym)):
            D.connected_components = cc
            results[(label, "bucket")] = run(
                spark, f"bucket_components md5 [{label}] rep{rep}", bucket_md5, n=1
            )
            results[(label, "sem")] = run(
                spark, f"semantic_dedup [{label}] rep{rep}", sem_dedup, n=1
            )
    D.connected_components = cc_new
    print(
        "labels identical:",
        results[("NEW explode-sym", "bucket")] == results[("OLD union-sym", "bucket")],
        results[("NEW explode-sym", "sem")] == results[("OLD union-sym", "sem")],
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
