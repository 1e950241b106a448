"""r15: A/B the incremental-index changes in one session (one weather regime):

1. exact_probe — lazy lineage cut on the batch fingerprint frame (the tier
   collect, the large-tier prefix collect and the final join each evaluated
   the batch subtree as an independent job).
2. near_probe — lazy cut on the candidate pair frame (the index-sig semi-join
   key set and the verify join each re-ran the bands scan + candidate join).
3. dedup_index_write — the exact-layer write overlaps the near-layer writes
   on a driver thread (guide §2.6) instead of serializing after them.

OLD forms are reproduced inline below; equality of results/artifacts is
asserted alongside the timings.
"""

from __future__ import annotations

import os
import sys
import tempfile
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
        f"{tag:48s} best={min(o[0] for o in outs):7.3f}s jobs={outs[-1][1]}  {[o[0] for o in outs]}",
        flush=True,
    )
    return outs[-1][2]


# ---- OLD exact_probe (pre-r15-cut): no lineage cut on fps -------------------
def exact_probe_old(spark, path, batch, key="text", id_col="doc_id"):
    from analyst_toolkit_spark.functions.stats import plan_size_bytes
    from analyst_toolkit_spark.llm.incremental import (
        FP_PREFIX,
        PROBE_ISIN_MAX,
        _fingerprints,
        _read_meta,
    )

    meta = _read_meta(spark, path.rstrip("/"))
    width = int(meta.get("prefix_width", 2))
    idx_id = meta.get("id_col", id_col)
    fps = _fingerprints(batch, key, id_col, width)
    probe_rows = fps.select("fp", FP_PREFIX).distinct().limit(PROBE_ISIN_MAX + 1).collect()
    if len(probe_rows) <= PROBE_ISIN_MAX:
        fp_list = [r["fp"] for r in probe_rows]
        prefixes = sorted({r[FP_PREFIX] for r in probe_rows})
        pruned = (
            spark.read.parquet(path.rstrip("/") + "/fingerprints")
            .filter(F.col(FP_PREFIX).isin(prefixes))
            .filter(F.col("fp").isin(fp_list))
        )
        matches = pruned.groupBy("fp").agg(F.min(F.col(idx_id)).alias("matched_id"))
        return fps.join(F.broadcast(matches), "fp", "left").select(
            F.col(id_col), F.col("matched_id").isNotNull().alias("is_known_dup"), "matched_id"
        )
    prefixes = [r[0] for r in fps.select(FP_PREFIX).distinct().collect()]
    index = spark.read.parquet(path.rstrip("/") + "/fingerprints").filter(
        F.col(FP_PREFIX).isin(prefixes)
    )
    size = plan_size_bytes(batch)
    small = 0 <= size <= (64 << 20)
    probe_set = fps.select("fp").distinct()
    matches = (
        index.join(F.broadcast(probe_set) if small else probe_set, "fp", "left_semi")
        .groupBy("fp")
        .agg(F.min(F.col(idx_id)).alias("matched_id"))
    )
    return fps.join(F.broadcast(matches) if small else matches, "fp", "left").select(
        F.col(id_col), F.col("matched_id").isNotNull().alias("is_known_dup"), "matched_id"
    )


# ---- OLD near_probe (pre-r15-cut): no lineage cut on cands ------------------
def near_probe_old(spark, path, batch, key="text", id_col="doc_id", threshold=0.8):
    from analyst_toolkit_spark.llm.incremental import (
        _banded_sigs,
        _read_meta,
        sig_jaccard_estimate,
    )

    base = path.rstrip("/")
    meta = _read_meta(spark, base)
    k = int(meta.get("k", 64))
    bands = int(meta.get("bands", 8))
    n_shingle = int(meta.get("n_shingle", 3))
    idx_id = meta.get("id_col", id_col)
    b_sigs, b_banded = _banded_sigs(batch, key, id_col, n_shingle, k, bands)
    idx_banded = spark.read.parquet(base + "/bands")
    cands = (
        b_banded.withColumnRenamed(id_col, "batch_id")
        .join(idx_banded.withColumnRenamed(idx_id, "index_id"), ["band", "band_hash"])
        .select("batch_id", "index_id")
        .distinct()
    )
    idx_sigs = (
        spark.read.parquet(base + "/sigs")
        .withColumnsRenamed({idx_id: "index_id", "sig": "index_sig"})
        .join(F.broadcast(cands.select("index_id").distinct()), "index_id", "left_semi")
        .groupBy("index_id")
        .agg(F.first("index_sig").alias("index_sig"))
    )
    b_named = b_sigs.withColumnsRenamed({id_col: "batch_id", "sig": "batch_sig"})
    return (
        cands.join(b_named, "batch_id")
        .join(idx_sigs, "index_id")
        .withColumn(
            "est_jaccard",
            F.round(sig_jaccard_estimate(F.col("batch_sig"), F.col("index_sig"), k), 6),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("batch_id", "index_id", "est_jaccard")
    )


# ---- OLD dedup_index_write: sequential layer writes -------------------------
def index_write_old(df, path, key="text", id_col="doc_id", n_shingle=3, k=64, bands=8):
    from analyst_toolkit_spark.llm.incremental import (
        FP_PREFIX,
        _banded_sigs,
        _fingerprints,
        _write_meta,
    )

    base = path.rstrip("/")
    fps = (
        _fingerprints(df, key, id_col, 2)
        .repartition(F.col(FP_PREFIX))
        .sortWithinPartitions("fp")
    )
    fps.write.mode("overwrite").partitionBy(FP_PREFIX).parquet(base + "/fingerprints")
    sigs, banded = _banded_sigs(df, key, id_col, n_shingle, k, bands)
    sigs.write.mode("overwrite").parquet(base + "/sigs")
    banded.write.mode("overwrite").partitionBy("band").parquet(base + "/bands")
    _write_meta(
        df.sparkSession, base,
        {"prefix_width": 2, "k": k, "bands": bands, "n_shingle": n_shingle, "id_col": id_col},
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_index")
    spark.sparkContext.setLogLevel("ERROR")
    from analyst_toolkit_spark.llm import incremental as L_inc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()

    idx = tempfile.mkdtemp(prefix="prof_idx_")
    L_inc.dedup_index_write(docs, idx, layers=("exact", "near"))  # untimed setup

    # -- exact_probe, join tier (full corpus as batch) ------------------------
    def key(df):
        return sorted(map(tuple, df.collect()))

    a = run(spark, "exact_probe join-tier OLD (no cut)", lambda: key(
        exact_probe_old(spark, idx, docs)))
    b = run(spark, "exact_probe join-tier NEW (fps cut)", lambda: key(
        L_inc.exact_probe(spark, idx, docs)))
    print("exact_probe identical:", a == b, len(a), flush=True)

    # -- near_probe: small batch and corpus-sized batch -----------------------
    tiny = docs.limit(50).localCheckpoint(eager=True)
    c = run(spark, "near_probe tiny OLD (no cands cut)", lambda: key(
        near_probe_old(spark, idx, tiny)))
    d = run(spark, "near_probe tiny NEW (cands cut)", lambda: key(
        L_inc.near_probe(spark, idx, tiny)))
    print("near_probe tiny identical:", c == d, len(c), flush=True)
    e = run(spark, "near_probe corpus OLD", lambda: key(
        near_probe_old(spark, idx, docs)), n=2)
    f = run(spark, "near_probe corpus NEW", lambda: key(
        L_inc.near_probe(spark, idx, docs)), n=2)
    print("near_probe corpus identical:", e == f, len(e), flush=True)

    # -- index write: sequential vs overlapped --------------------------------
    run(spark, "index_write OLD (sequential layers)", lambda: index_write_old(
        docs, tempfile.mkdtemp(prefix="prof_idx_old_")), n=3)
    run(spark, "index_write NEW (overlapped exact)", lambda: L_inc.dedup_index_write(
        docs, tempfile.mkdtemp(prefix="prof_idx_new_"), layers=("exact", "near")), n=3)
    # artifact equality: one old dir vs one new dir, all three layers
    old_dir = tempfile.mkdtemp(prefix="prof_eq_old_")
    new_dir = tempfile.mkdtemp(prefix="prof_eq_new_")
    index_write_old(docs, old_dir)
    L_inc.dedup_index_write(docs, new_dir, layers=("exact", "near"))
    for sub in ("fingerprints", "sigs", "bands"):
        o = sorted(map(tuple, spark.read.parquet(f"{old_dir}/{sub}").collect()))
        n_ = sorted(map(tuple, spark.read.parquet(f"{new_dir}/{sub}").collect()))
        print(f"write layer {sub} identical:", o == n_, len(o), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
