"""r12 semantic-dedup scale sweep: 1x/10x embeddings through the curate-stage
machinery (LSH bucket join + exact verify + CC + election), with the two
scale dials measured:

- n_planes: bucket occupancy ~ n / 2^planes, so candidate volume ~ n^2 /
  2^planes — holding planes fixed while the corpus grows 10x grows the
  bucket join ~100x/2^0; raising planes by ~log2(10x) ≈ 3-4 holds
  per-bucket occupancy (and the join cost per row) roughly FLAT. That is
  the documented production dial, now enforced by the pair_cap census.
- pair_cap: the census refuses the quadratic join up front when the dial
  wasn't turned.

Corpus: sf0.1 embeddings (2k vectors) + jittered copies to 10x (20k), the
same construction as the ANN sweeps. Every vector keeps ~1 near-identical
partner (its jittered self), so true-pair volume stays linear — the honest
shape for dedup input.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.llm import similarity as S
from analyst_toolkit_spark.session import get_spark


def corpus(spark, copies: int):
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    parts = [base.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))]
    for i in range(1, copies):
        parts.append(
            base.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x, j: x + (F.xxhash64(F.col("vec_id") + i * 1_000_000, j) % 997).cast("double") / 99700.0,
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32).localCheckpoint(eager=True)


def main() -> None:
    spark = get_spark("sweep_r12_semantic")
    spark.sparkContext.setLogLevel("ERROR")

    for copies, planes in ((1, 8), (10, 8), (10, 12)):
        emb = corpus(spark, copies)
        n = emb.count()
        t = time.time()
        out = S.semantic_dedup(emb, 64, n_planes=planes, threshold=0.99)
        reps = out.filter("is_rep").count()
        print(
            f"[{n} vecs, planes={planes}] semantic_dedup: {time.time() - t:.1f}s, "
            f"survivors={reps}",
            flush=True,
        )

    # census gate: at 10x with the 1x plane budget the candidate volume is
    # ~2^4 times the per-plane-scaled one; a tight cap refuses it up front
    emb10 = corpus(spark, 10)
    t = time.time()
    try:
        S.semantic_dedup(emb10, 64, n_planes=8, threshold=0.99, pair_cap=100_000)
        print("census gate: UNEXPECTEDLY passed", flush=True)
    except ValueError as exc:
        print(f"census gate refused in {time.time() - t:.1f}s: {str(exc)[:110]}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
