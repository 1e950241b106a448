"""r16 session-2 profiling: where does curate_semantic_decon_docs (6.6 s) go?

Stage attribution for the literal semantic-decontamination tier plus a
bit-identity + wall A/B of an Arrow/numpy evaluation of the same max-cosine
fold (guide §4.2: hand whole batches to vectorized native code instead of
interpreted per-element HOF expressions).

Run on a quiet host: python examples/prof_r16_decon.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import __spark_entry__ as e  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark("prof_r16_decon")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn, n=3):
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    samples_r = [round(x, 3) for x in samples]
    print(f"{label}: med={sorted(samples)[len(samples)//2]:.3f} {samples_r}", flush=True)


mat(spark.range(100).toDF("id"))  # warm the noop sink

qs = e.queries()
t("curate_semantic_decon_docs FULL", lambda: mat(qs["curate_semantic_decon_docs"](spark, SF)))

# --- attribution: corpus construction + exact dedup WITHOUT the semantic stage
from analyst_toolkit_spark.llm import curate as L_cur  # noqa: E402
from __spark_entry__ import _semantic_corpus, load_table  # noqa: E402

corpus = _semantic_corpus(spark, SF, every=5, id_offset=3000, prefix="EVALCOPY ")
bench = load_table(spark, SF, "embeddings").filter(F.col("vec_id") % 5 == 0).select("embedding")
print("corpus partitions:", corpus.rdd.getNumPartitions(), "rows:", corpus.count(), flush=True)
print("bench rows:", bench.count(), flush=True)


def _dedup_only():
    out, _ = L_cur.curate_corpus(corpus, exact_dedup=True)
    mat(out.select("doc_id", F.md5("text").alias("text_md5")))


t("corpus+exact_dedup only", _dedup_only)

# --- the literal decon scan alone, over the raw corpus (no dedup)
from analyst_toolkit_spark.llm import similarity as S  # noqa: E402

t("semantic_decontaminate RAW corpus", lambda: mat(S.semantic_decontaminate(corpus, bench, threshold=0.999)))
t(
    "semantic_decontaminate RAW corpus repart32",
    lambda: mat(S.semantic_decontaminate(corpus.repartition(32), bench, threshold=0.999)),
)

# how many partitions does the decon input have inside the chain?
ded, _ = L_cur.curate_corpus(corpus, exact_dedup=True)
print("post-dedup partitions:", ded.rdd.getNumPartitions(), flush=True)

# --- Arrow/numpy prototype of the SAME fold, bit-identity checked ------------
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql.types import DoubleType  # noqa: E402

rows = bench.select(F.col("embedding").alias("__b")).collect()
B = np.array([[float(x) for x in r["__b"]] for r in rows], dtype=np.float64)  # (m, d)
import math  # noqa: E402

BN = np.array([math.sqrt(sum(v * v for v in row)) for row in B.tolist()], dtype=np.float64)
m, d = B.shape
print("bench matrix:", B.shape, flush=True)


def max_scaled_batch(vec_series: pd.Series) -> pd.Series:
    # dim-sequential accumulation == the JVM fold's left-to-right add order,
    # vectorized across (rows x bench): bit-identical dots by construction.
    vals = np.array([np.asarray(v, dtype=np.float64) for v in vec_series], dtype=np.float64)  # (n, d)
    acc = np.zeros((vals.shape[0], m), dtype=np.float64)
    for j in range(d):
        acc += np.multiply.outer(vals[:, j], B[:, j])
    scaled = acc / BN  # (n, m)
    return pd.Series(scaled.max(axis=1))


maxs_udf = F.pandas_udf(max_scaled_batch, DoubleType())

from analyst_toolkit_spark.llm.similarity import norm  # noqa: E402

vec = F.col("embedding").cast("array<double>")
py_frame = corpus.withColumn(
    "max_bench_cosine", F.round(maxs_udf(vec) / norm(F.col("embedding")), 6)
).withColumn("contaminated", F.col("max_bench_cosine") >= F.lit(0.999))

t("ARROW prototype decon RAW corpus", lambda: mat(py_frame))

# bit-identity check against the JVM fold
jvm = S.semantic_decontaminate(corpus, bench, threshold=0.999).select(
    "doc_id", F.col("max_bench_cosine").alias("jc"), F.col("contaminated").alias("jf")
)
pyf = py_frame.select("doc_id", F.col("max_bench_cosine").alias("pc"), F.col("contaminated").alias("pf"))
diff = (
    jvm.join(pyf, "doc_id", "full_outer")
    .filter(
        (~F.col("jc").eqNullSafe(F.col("pc"))) | (~F.col("jf").eqNullSafe(F.col("pf")))
    )
    .count()
)
print("bit-identity mismatches (rounded-6 column):", diff, flush=True)

# raw unrounded comparison: JVM max_scaled vs numpy max_scaled
from analyst_toolkit_spark.llm.similarity import _bench_literal  # noqa: E402

blit, bench_dim = _bench_literal([{"__b": r["__b"]} for r in rows], "__b")
jvm_raw = corpus.select(
    "doc_id",
    F.aggregate(
        blit,
        F.lit(None).cast("double"),
        lambda acc, b: F.greatest(
            acc,
            F.aggregate(F.zip_with(vec, b["v"], lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x) / b["n"],
        ),
    ).alias("jraw"),
)
py_raw = corpus.select("doc_id", maxs_udf(vec).alias("praw"))
rawdiff = (
    jvm_raw.join(py_raw, "doc_id")
    .filter(~F.col("jraw").eqNullSafe(F.col("praw")))
    .count()
)
print("bit-identity mismatches (UNROUNDED max_scaled):", rawdiff, flush=True)

# --- charlm decomposition ----------------------------------------------------
from analyst_toolkit_spark.llm import lm as L_lm  # noqa: E402

docs = load_table(spark, SF, "documents")
t("charlm FULL row", lambda: mat(qs["charlm_quality_docs"](spark, SF)))
t("charlm train only", lambda: mat(L_lm.train_char_lm(docs.filter(F.col("lang") == "en"))))
model = L_lm.train_char_lm(docs.filter(F.col("lang") == "en")).localCheckpoint()
t("charlm score only (model cut)", lambda: mat(L_lm.charlm_score(docs, model, keep_cols=["lang"])))
print("done", flush=True)
