"""r15 optimization round (session 3) — stage decomposition for the three
composition rows the checklist flagged as "no same-session decomposition was
run": corpus_data_card_neardup_docs, curate_semantic_near_docs,
semantic_dedup_pca_embeddings — plus the three build-then-probe index rows
(bm25_index_probe, ivf_append_probe, ivf_rebuild_probe) whose slices are
sequentially dependent. Noop sink, labeled jobs, job counts per run
(weather-independent structural metric).

Run: python examples/prof_r15_comp.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(spark, name, fn, n=2):
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
    print(f"{name:58s} {min(samples):7.3f}s  jobs/run={jobs:.1f}  {samples}", flush=True)
    return min(samples)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_comp")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    docs.count()
    emb.count()

    from analyst_toolkit_spark.llm import dedup as D
    from analyst_toolkit_spark.llm import similarity as SIM
    from analyst_toolkit_spark.llm import text as T

    # ---- corpus_data_card_neardup_docs ---------------------------------
    comps = D.bucket_components(docs, k=8, bands=4, method="md5")
    timed(spark, "cardnd/1 bucket_components(md5 k=8 b=4) alone", lambda: noop(comps))
    timed(spark, "cardnd/2 card WITHOUT components", lambda: noop(
        T.corpus_data_card(docs.withColumn("source", F.lit("s")), by="source", lang_col=None)
    ))
    timed(spark, "cardnd/3 full row", lambda: noop(
        qs["corpus_data_card_neardup_docs"](spark, sf_dir)
    ))

    # ---- semantic_dedup_pca_embeddings ---------------------------------
    model = SIM.pca_fit(emb, vec_col="embedding", k=8)
    timed(spark, "sdpca/1 pca_fit (driver moments, fresh)", lambda: SIM.pca_fit(
        emb, vec_col="embedding", k=8
    ))
    proj = SIM.pca_project(emb, model, vec_col="embedding", prefix="__p")
    timed(spark, "sdpca/2 pca_project map pass", lambda: noop(proj))
    timed(spark, "sdpca/3 full semantic_dedup(pca_dims=8)", lambda: noop(
        SIM.semantic_dedup(emb, 64, n_planes=6, threshold=0.5, pca_dims=8)
    ))
    timed(spark, "sdpca/4 full row", lambda: noop(
        qs["semantic_dedup_pca_embeddings"](spark, sf_dir)
    ))

    # ---- curate_semantic_near_docs --------------------------------------
    timed(spark, "csn/1 full row", lambda: noop(
        qs["curate_semantic_near_docs"](spark, sf_dir)
    ))

    # ---- build-then-probe rows ------------------------------------------
    for row in ("bm25_index_probe_docs", "ivf_append_probe_embeddings",
                "ivf_rebuild_probe_embeddings", "ivf_health_embeddings"):
        timed(spark, f"idx/{row}", lambda r=row: noop(qs[r](spark, sf_dir)))

    spark.stop()


if __name__ == "__main__":
    main()
