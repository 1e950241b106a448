"""r12 incremental-semantic-index scale sweep: probe cost vs corpus size.

The index's 100 TB claim is that a probe reads ONLY the bucket directories
the batch lands in — so for a FIXED batch, probe wall clock must track the
batch's share of the corpus (touched_buckets / 2^n_planes), not the corpus:

- fixed planes, growing corpus: per-bucket mass grows linearly, so probe
  time grows linearly BUT divided by the untouched-bucket fraction — at 8
  planes a 20-vector batch touches ≤ 20 of 256 directories (~1/13th of a
  rescan).
- planes raised with the corpus (+log2(growth), the same occupancy dial the
  SemDeDup stage documents): per-bucket mass stays flat, so probe time
  stays ~FLAT while the corpus grows 100×.

Index WRITE time is reported separately — it is the once-per-corpus cost
appends amortize.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.llm import incremental as I
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
    spark = get_spark("sweep_r12_semindex")
    spark.sparkContext.setLogLevel("ERROR")
    batch = (
        load_table(spark, "/root/testdata/sf0.1", "embeddings")
        .orderBy("vec_id")
        .limit(20)
        .select(
            (F.col("vec_id") + 9_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"), lambda x: x * 1.5
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    for copies, planes in ((1, 8), (10, 8), (100, 8), (100, 11)):
        c = corpus(spark, copies)
        path = tempfile.mkdtemp(prefix=f"semidx_{copies}x_{planes}p_")
        t = time.time()
        I.semantic_index_write(c, path, n_planes=planes)
        t_write = time.time() - t
        t = time.time()
        out = I.semantic_probe(spark, path, batch, threshold=0.999)
        matched = out.filter("is_known_dup").count()
        t_probe = time.time() - t
        print(
            f"copies={copies:>3} planes={planes:>2} rows={c.count():>7} "
            f"write={t_write:6.2f}s probe={t_probe:6.2f}s matched={matched}",
            flush=True,
        )


if __name__ == "__main__":
    main()
