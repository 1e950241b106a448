"""r16: decompose the bench curate_chain_8stage (q_curate_docs config) into
per-stage incremental costs, and count banding/tokenize evaluations.

Cumulative-config attribution: run the chain with stages enabled one at a
time in bench order, best-of-N wall each; the delta is the stage's
incremental cost in situ (inherits real upstream frames + cuts).
"""
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.session import get_spark  # noqa: E402
from analyst_toolkit_spark.llm import curate as L_cur  # noqa: E402

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("N_RUNS", "2"))
spark = get_spark("prof_r16_chain")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
bench = docs.filter(F.col("doc_id") % 50 == 0).select("text")

FULL = dict(
    min_quality=0.2,
    max_repetition=0.5,
    exact_dedup=True,
    near_dedup_threshold=0.8,
    containment_drop_threshold=0.5,
    benchmark=bench,
    splits={"train": 0.9, "val": 0.05, "test": 0.05},
    pack_budget=512,
)

CUMULATIVE = [
    ("quality_gate", dict(min_quality=0.2, max_repetition=0.5, exact_dedup=False)),
    ("exact_dedup", dict(min_quality=0.2, max_repetition=0.5, exact_dedup=True)),
    ("near_dedup", dict(min_quality=0.2, max_repetition=0.5, exact_dedup=True,
                        near_dedup_threshold=0.8)),
    ("containment", dict(min_quality=0.2, max_repetition=0.5, exact_dedup=True,
                         near_dedup_threshold=0.8, containment_drop_threshold=0.5)),
    ("decontaminate", dict(min_quality=0.2, max_repetition=0.5, exact_dedup=True,
                           near_dedup_threshold=0.8, containment_drop_threshold=0.5,
                           benchmark=bench)),
    ("split+pack", FULL),
]

tracker = spark.sparkContext.statusTracker()


def run(cfg):
    # time construction + materialization: the dedup/containment stages run
    # eager fixpoints INSIDE curate_corpus, so the call itself is timed work
    ids0 = set(tracker.getJobIdsForGroup())
    t0 = time.time()
    out, _ = L_cur.curate_corpus(docs, **cfg)
    if "split" in out.columns and "seq_id" in out.columns:
        out = out.groupBy("split").agg(
            F.count(F.lit(1)).alias("docs"),
            F.countDistinct("seq_id").alias("n_seqs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
        )
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    return dt, len(set(tracker.getJobIdsForGroup()) - ids0)


# warm noop + python pool
docs.limit(10).write.format("noop").mode("overwrite").save()

prev = 0.0
for name, cfg in CUMULATIVE:
    best, jobs = min(run(cfg) for _ in range(N))
    print(f"{name:>14}: cumulative={best:6.2f}s  incremental={best - prev:6.2f}s  jobs={jobs}", flush=True)
    prev = best
