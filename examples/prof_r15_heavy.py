"""r15 optimization round — stage-level attribution for the heaviest
non-headline operators (guide §1: measure first, find WHERE the time goes
before touching anything). Noop-sink materialization, labeled jobs.

Run: python examples/prof_r15_heavy.py [sf_dir]
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


def _job_count(spark) -> int:
    """Total Spark jobs submitted so far — weather-independent structural
    metric (a removed action shows as a lower per-operator job delta no
    matter how loaded the host is)."""
    ids = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
    return len(ids)


def timed(spark, name, fn, n=2):
    samples = []
    jobs0 = _job_count(spark)
    for _ in range(n):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    jobs = (_job_count(spark) - jobs0) / n
    print(f"{name:55s} {min(samples):7.3f}s  jobs/run={jobs:.1f}  {samples}", flush=True)
    return min(samples)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_heavy")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()  # warm footers

    from analyst_toolkit_spark.llm import dedup as D

    # ---- minhash_md5_components decomposition --------------------------
    sh = docs.select("doc_id", D.shingles("text", 3).alias("sh"))
    timed(spark, "md5comp/1 shingles only", lambda: noop(sh))
    sig = sh.select("doc_id", D.minhash_signature_md5(F.col("sh"), 8).alias("sig"))
    timed(spark, "md5comp/2 shingles+md5 signature (k=8)", lambda: noop(sig))
    banded = D._band_stream(docs, "text", "doc_id", 3, 8, 4, method="md5")
    timed(spark, "md5comp/3 band stream (4 bands)", lambda: noop(banded))
    sent = D.sentinel_band_hash(spark, 8, 4, "md5")
    bf = banded.filter(F.col("band_hash") != F.lit(sent))

    timed(spark, "md5comp/4 full bucket_components (band+CC)", lambda: noop(
        D.bucket_components(docs, key="text", id_col="doc_id", k=8, bands=4, method="md5")
    ))

    # xxhash path for comparison
    timed(spark, "xxhash/bucket_components (k=64,b=16)", lambda: noop(
        D.bucket_components(docs, key="text", id_col="doc_id", k=64, bands=16)
    ))

    # ---- connected_components in isolation (pre-banded) -----------------
    bf_ck = bf.localCheckpoint(eager=True)
    bucket_key = F.xxhash64(F.col("band").cast("string"), F.col("band_hash").cast("string"))
    tagged = bf_ck.select(F.col("doc_id").cast("long").alias("__id"), bucket_key.alias("__bkt"))
    mins = tagged.groupBy("__bkt").agg(F.min("__id").alias("__rep"))
    edges = (
        tagged.join(mins, "__bkt").filter(F.col("__id") != F.col("__rep"))
        .select(F.col("__id").alias("id_a"), F.col("__rep").alias("id_b"))
    )
    timed(spark, "md5comp/5 star edges (from banded ckpt)", lambda: noop(edges))
    timed(spark, "md5comp/6 CC fixpoint (from banded ckpt)", lambda: noop(
        D.connected_components(edges)
    ))

    # ---- curate_md5 chain, stage-incremental ----------------------------
    from analyst_toolkit_spark.llm import curate as L_cur

    bench = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0).select("text")

    def chain(**kw):
        out, _ = L_cur.curate_corpus(docs, **kw)
        noop(out)

    timed(spark, "curate_md5/a exact_dedup only", lambda: chain(exact_dedup=True), n=2)
    timed(spark, "curate_md5/b +md5 near-dedup", lambda: chain(
        exact_dedup=True, near_dedup_threshold=0.8, near_dedup_engine="md5_buckets",
        near_dedup_k=8, near_dedup_bands=4,
    ), n=2)
    timed(spark, "curate_md5/c +span decon", lambda: chain(
        exact_dedup=True, near_dedup_threshold=0.8, near_dedup_engine="md5_buckets",
        near_dedup_k=8, near_dedup_bands=4, benchmark=bench, decontaminate_mode="spans",
    ), n=2)
    timed(spark, "curate_md5/d +leakage-safe split (FULL)", lambda: chain(
        exact_dedup=True, near_dedup_threshold=0.8, near_dedup_engine="md5_buckets",
        near_dedup_k=8, near_dedup_bands=4, benchmark=bench, decontaminate_mode="spans",
        splits={"train": 0.9, "val": 0.05, "test": 0.05}, split_mode="leakage_safe",
    ), n=2)

    # ---- curate_docs (auto chain), stage-incremental --------------------
    bench50 = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    timed(spark, "curate/a quality gate only", lambda: chain(
        min_quality=0.2, max_repetition=0.5, exact_dedup=False), n=2)
    timed(spark, "curate/b +exact dedup", lambda: chain(
        min_quality=0.2, max_repetition=0.5, exact_dedup=True), n=2)
    timed(spark, "curate/c +near dedup (auto)", lambda: chain(
        min_quality=0.2, max_repetition=0.5, exact_dedup=True, near_dedup_threshold=0.8), n=2)
    timed(spark, "curate/d +containment", lambda: chain(
        min_quality=0.2, max_repetition=0.5, exact_dedup=True, near_dedup_threshold=0.8,
        containment_drop_threshold=0.5), n=2)
    timed(spark, "curate/e +decontaminate", lambda: chain(
        min_quality=0.2, max_repetition=0.5, exact_dedup=True, near_dedup_threshold=0.8,
        containment_drop_threshold=0.5, benchmark=bench50), n=2)
    timed(spark, "curate/f +split+pack (FULL)", lambda: chain(
        min_quality=0.2, max_repetition=0.5, exact_dedup=True, near_dedup_threshold=0.8,
        containment_drop_threshold=0.5, benchmark=bench50,
        splits={"train": 0.9, "val": 0.05, "test": 0.05}, pack_budget=512), n=2)

    # ---- span-op decomposition ------------------------------------------
    grams = D.positioned_ngrams("text", 8)
    gdf = docs.select(F.col("doc_id"), F.posexplode(grams).alias("pos", "__gram")).select(
        "doc_id", "pos", F.xxhash64("__gram").alias("__gh")
    )
    timed(spark, "spans/1 positioned gram stream only", lambda: noop(gdf))
    dup = (
        gdf.groupBy("__gh").agg(F.countDistinct(F.col("doc_id")).alias("__nd"))
        .filter(F.col("__nd") >= 2).select("__gh")
    )
    timed(spark, "spans/2 census only", lambda: noop(dup))
    timed(spark, "spans/3 full repeated_spans", lambda: noop(
        D.repeated_spans(docs, n=8, min_docs=2)
    ))

    # ---- index write ----------------------------------------------------
    import tempfile

    from analyst_toolkit_spark.llm import incremental as L_inc

    timed(spark, "index/dedup_index_write exact+near", lambda: L_inc.dedup_index_write(
        docs, tempfile.mkdtemp(prefix="prof_idx_"), layers=("exact", "near")
    ))

    # ---- training_shards / spans / media card ---------------------------
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in (
        "training_shards_docs",
        "repeated_spans_docs",
        "remove_spans_docs",
        "media_data_card_docs",
        "curate_semantic_decon_docs",
        "curate_semantic_docs",
        "source_overlap_kmv_docs",
        "charlm_quality_docs",
    ):
        if name in qs:
            timed(spark, f"entry/{name}", lambda fn=qs[name]: noop(fn(spark, sf_dir)), n=2)

    spark.stop()


if __name__ == "__main__":
    main()
