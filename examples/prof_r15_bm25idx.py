"""r15 optimization round (session 3) — same-session interleaved A/B for the
_bm25_postings size-gated token-array cut (two regex tokenize passes per
index write/append -> one). The OLD form is inlined verbatim; both build the
same index layout into tmp dirs with the noop-free write as the timed action
(the write IS the operator's action). Job counts printed per run.

Run: python examples/prof_r15_bm25idx.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402
from analyst_toolkit_spark.llm import incremental as I  # noqa: E402


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


def old_postings(df, key, id_col, n_buckets):
    """Pre-r15-opt _bm25_postings: lens cut only — dl and tf each tokenize."""
    from analyst_toolkit_spark.llm.text import _VOCAB_TOKEN_RE

    toks = F.regexp_extract_all(F.lower(F.col(key)), F.lit(_VOCAB_TOKEN_RE), F.lit(0))
    lens = df.select(F.col(id_col), F.size(toks).alias("dl")).localCheckpoint(eager=False)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    postings = tf.join(lens, id_col).withColumn(
        "term_bucket", I._bm25_bucket(F.col("term"), n_buckets)
    )
    return postings, lens


def write_with(postings_fn, df, base):
    postings, lens = postings_fn(df, "text", "doc_id", 64)
    postings.repartition("term_bucket").write.mode("overwrite").partitionBy(
        "term_bucket"
    ).parquet(base + "/postings")
    stats = lens.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")).first()
    return int(stats["n"]), int(stats["s"] or 0)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_bm25idx")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    tmp = tempfile.mkdtemp(prefix="bm25_ab_")
    try:
        for rnd in range(2):
            a = timed(spark, f"[{rnd}] bm25 postings write OLD (2 passes)",
                      lambda: write_with(old_postings, docs, tmp + "/old"), n=3)
            b = timed(spark, f"[{rnd}] bm25 postings write NEW (token cut)",
                      lambda: write_with(I._bm25_postings, docs, tmp + "/new"), n=3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
