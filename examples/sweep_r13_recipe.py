"""r13 recipe-assembly scale sweep: global_shuffle + epoch_mix at 1/10/100x.

The 100 TB claims under test:

- global_shuffle's only global structure is the two-phase distributed
  prefix sum over the md5 sort key. The key is uniform by construction,
  so the one range exchange is balanced with NO skew handling and wall
  clock must scale ~linearly with rows (a super-linear bend would mean a
  funnel — a single-partition window or a driver sort — crept in).
- epoch_mix is map-only (literal CASE rate -> sequence+explode): wall
  clock must scale ~linearly with INPUT rows, with output = the recipe
  multiple of the input and zero shuffles at any scale.

Docs are synthesized by stamped duplication of the sf0.1 documents table
(ids offset per copy so uniqueness holds — the corpus-growth construction
every sweep here uses).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.llm import pack as P
from analyst_toolkit_spark.llm import text as T
from analyst_toolkit_spark.session import get_spark


def corpus(spark, copies: int):
    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "source"
    )
    parts = [base]
    for i in range(1, copies):
        parts.append(
            base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"), "text", "source"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True)  # charge synthesis to setup, not the op


def _mat(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark("sweep_r13_recipe")
    spark.sparkContext.setLogLevel("ERROR")
    for copies in (1, 10, 100):
        docs = corpus(spark, copies)
        n = docs.count()

        t0 = time.perf_counter()
        _mat(P.global_shuffle(docs, salt="sweep"))
        t_shuf = time.perf_counter() - t0

        t0 = time.perf_counter()
        _mat(T.epoch_mix(docs, 2.5))
        t_epoch = time.perf_counter() - t0

        print(
            f"copies={copies:3d} rows={n:7d} global_shuffle={t_shuf:7.2f}s "
            f"epoch_mix(2.5)={t_epoch:7.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
