"""r14 exposure-tier scale sweep: BOTH per-benchmark-item exposure views
(lexical containment + semantic LSH) against a growing corpus with a FIXED
benchmark — the production shape (eval suites are fixed; the corpus is the
100 TB side).

The claims under test:

- the r13 driver row decon_exposure_docs read 14.1 s at sf0.1 because its
  CONSTRUCTION ties the benchmark to corpus/25 (it grows with the corpus);
  with the benchmark FIXED, cost should scale ~linearly in the corpus with
  a benchmark-independent constant — the one corpus-scale exchange is the
  (doc, item) hit-pair stream;
- semantic_decon_exposure_lsh's cost is the bucket-join candidate stream:
  with a fixed benchmark, candidates grow linearly with the corpus, so
  wall should too (no quadratic bend — the census gate would catch one).

Corpus synthesized by stamped duplication (ids offset per copy), charged
to setup via localCheckpoint.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.llm import similarity as S  # noqa: E402
from analyst_toolkit_spark.llm import text as T  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402


def grow(base, id_col, copies):
    parts = [base]
    for i in range(1, copies):
        parts.append(base.withColumn(id_col, F.col(id_col) + i * 10_000_000))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True)


def _mat(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark("sweep_r14_exposure")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # FIXED benchmarks: 200 lexical items, 500 semantic items — never grow
    bench_lex = docs.filter(F.col("doc_id") % 25 == 0).limit(200).localCheckpoint(eager=True)
    bench_sem = emb.limit(500).localCheckpoint(eager=True)

    print("copies,docs_rows,lexical_sec,emb_rows,semantic_lsh_sec", flush=True)
    for copies in (1, 10, 100):
        d = grow(docs, "doc_id", copies)
        nd = d.count()
        t0 = time.perf_counter()
        _mat(T.decon_exposure(d, bench_lex, n=8, threshold=0.8))
        t_lex = time.perf_counter() - t0

        e = grow(emb, "vec_id", copies)
        ne = e.count()
        t0 = time.perf_counter()
        _mat(S.semantic_decon_exposure_lsh(e, bench_sem, dim=64, threshold=0.999))
        t_sem = time.perf_counter() - t0
        print(f"{copies},{nd},{t_lex:.2f},{ne},{t_sem:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
