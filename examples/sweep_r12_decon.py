"""r12 semantic-decontamination scale sweep: the literal-benchmark scan at
1x/10x/100x corpus against a FIXED 100-vector eval set.

The operator's 100 TB claim is structural — the benchmark rides the plan as
a literal and the scan has zero exchanges (plan-asserted in tests), so wall
clock must be LINEAR in corpus size with no shuffle knee. This sweep records
the measurement. Per-row cost is |bench| * dim multiply-adds inside one JVM
aggregate fold (no Python, no join); 100x the corpus is exactly 100x the map
work spread across the same executors.

Corpus: sf0.1 embeddings (2k vectors) replicated with jittered copies (the
ANN-sweep construction); benchmark: the 100 lowest vec_ids of the base.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.llm import similarity as S
from analyst_toolkit_spark.session import get_spark


def corpus(spark, copies: int):
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    parts = [
        base.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    ]
    for i in range(1, copies):
        parts.append(
            base.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x, j: x
                    + (F.xxhash64(F.col("vec_id") + i * 1_000_000, j) % 997).cast("double")
                    / 99700.0,
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    spark = get_spark("sweep_r12_decon")
    spark.sparkContext.setLogLevel("ERROR")
    bench = (
        load_table(spark, "/root/testdata/sf0.1", "embeddings")
        .orderBy("vec_id")
        .limit(100)
        .select(F.col("embedding").cast("array<double>").alias("embedding"))
    )
    # warm the noop sink + JIT once before timing
    corpus(spark, 1).write.format("noop").mode("overwrite").save()
    for copies in (1, 10, 100):
        c = corpus(spark, copies)
        t = time.time()
        out = S.semantic_decontaminate(c, bench, threshold=0.999)
        out.write.format("noop").mode("overwrite").save()
        wall = time.time() - t
        n = c.count()
        print(f"copies={copies:>3} rows={n:>7} wall={wall:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
