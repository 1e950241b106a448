"""r15 optimization round — same-session A/B for train_char_lm's window-form
rewrite (guide §1.2: don't compute the corpus-scale gram aggregation twice).
Old form: groupBy(gram) agg built TWICE (tri + pre subtrees) then a join.
New form: one groupBy(gram) agg + a prefix-partitioned window sum.

Run: python examples/prof_r15_charlm.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402
from analyst_toolkit_spark.llm import lm as L  # noqa: E402
from analyst_toolkit_spark.llm.lm import _ngrams_of  # noqa: E402
from analyst_toolkit_spark.llm.text import normalize_text  # noqa: E402


def train_char_lm_old(df, key="text", n=3):
    nrm = df.select(normalize_text(F.col(key)).alias("__nt"))
    tri = (
        nrm.select(F.explode(_ngrams_of(F.col("__nt"), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn("__prefix", F.substring("gram", 1, n - 1))
    )
    pre = tri.groupBy("__prefix").agg(F.sum("__c").alias("__pc"))
    return tri.join(pre, "__prefix").select(
        "gram", (F.col("__c") / F.col("__pc")).alias("prob")
    )


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def _job_count(spark) -> int:
    ids = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
    return len(ids)


def timed(spark, name, fn, n=3):
    samples = []
    jobs0 = _job_count(spark)
    for _ in range(n):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    jobs = (_job_count(spark) - jobs0) / n
    print(f"{name:45s} {min(samples):7.3f}s  jobs/run={jobs:.1f}  {samples}", flush=True)
    return min(samples)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_charlm")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm footers

    en = docs.filter(F.col("lang") == "en")

    def full_query(train_fn):
        model = train_fn(en)
        scored = L.charlm_score(docs, model, keep_cols=["lang"])
        return scored.groupBy("lang").agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("oov_grams").cast("long").alias("oov_grams"),
            F.round(F.avg("mean_prob"), 6).alias("mean_prob"),
        )

    # row identity (model + full query), before timing
    old_m = train_char_lm_old(en).orderBy("gram").collect()
    new_m = L.train_char_lm(en).orderBy("gram").collect()
    assert old_m == new_m, "model rows differ"
    old_q = sorted(full_query(train_char_lm_old).collect())
    new_q = sorted(full_query(L.train_char_lm).collect())
    assert old_q == new_q, "query rows differ"
    print(f"identity OK: {len(old_m)} model rows, {len(old_q)} query rows", flush=True)

    # interleaved A/B, full charlm_quality_docs shape
    for _ in range(2):
        timed(spark, "charlm full query OLD (join form)", lambda: noop(full_query(train_char_lm_old)))
        timed(spark, "charlm full query NEW (window form)", lambda: noop(full_query(L.train_char_lm)))
    # model build alone
    for _ in range(2):
        timed(spark, "train_char_lm OLD", lambda: noop(train_char_lm_old(en)))
        timed(spark, "train_char_lm NEW", lambda: noop(L.train_char_lm(en)))

    spark.stop()


if __name__ == "__main__":
    main()
