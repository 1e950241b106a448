"""r16: bucket_components skew-safe min — plan + output-identity + A/B.

Checks:
1. Plan of the edges feeding CC shows partial aggregation (partial_min) and
   exactly ONE banding subtree (one `mh` signature-fold evaluation).
2. Output identity vs the r15 window form (inlined verbatim below).
3. Same-session interleaved wall A/B on the full operator.
"""
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.session import get_spark  # noqa: E402
from analyst_toolkit_spark.llm import dedup as D  # noqa: E402

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("prof_r16_bucket")
docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def window_form(df, key="text", id_col="doc_id", n_shingle=3, k=8, bands=4,
                max_iter=25, method="md5"):
    """r15 window form, verbatim (pre-change), for output identity."""
    from pyspark.sql.window import Window
    sent = D.sentinel_band_hash(df.sparkSession, k, bands, method)
    banded = D._band_stream(df, key, id_col, n_shingle, k, bands, method=method).filter(
        F.col("band_hash") != F.lit(sent)
    )
    bucket_key = F.xxhash64(F.col("band").cast("string"), F.col("band_hash").cast("string"))
    tagged = banded.select(F.col(id_col).cast("long").alias("__id"), bucket_key.alias("__bkt"))
    edges = (
        tagged.withColumn("__rep", F.min("__id").over(Window.partitionBy("__bkt")))
        .filter(F.col("__id") != F.col("__rep"))
        .select(F.col("__id").alias("id_a"), F.col("__rep").alias("id_b"))
    )
    return D.connected_components(edges, max_iter=max_iter).select("node", "component")


def run(fn):
    t0 = time.time()
    out = fn(docs, k=8, bands=4, method="md5")
    rows = sorted((r["node"], r["component"]) for r in out.collect())
    return time.time() - t0, rows


# output identity + interleaved A/B (best of 3 each)
t_new, rows_new = run(D.bucket_components)
t_old, rows_old = run(window_form)
assert rows_new == rows_old, "OUTPUT MISMATCH"
print(f"identity OK ({len(rows_new)} rows)")
times_new, times_old = [t_new], [t_old]
for _ in range(2):
    tn, _r = run(D.bucket_components)
    to, _r = run(window_form)
    times_new.append(tn)
    times_old.append(to)
print(f"new (groupBy+join over cut): {sorted(times_new)}")
print(f"old (window):                {sorted(times_old)}")
