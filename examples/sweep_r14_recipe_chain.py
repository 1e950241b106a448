"""r14 FULL recipe-chain scale sweep (r13 VERDICT #7): the complete curate
tail — fractional-epoch upsample -> seeded global shuffle -> sequence packing
in permuted order -> shard assignment + manifest — composed END-TO-END at
1/10/100x, where sweep_r13_recipe.py measured epoch_mix and global_shuffle
only in isolation.

The 100 TB claims under test:

- wall clock scales ~linearly with rows through the WHOLE tail (a
  super-linear bend means a funnel — a single-partition window, a driver
  sort, or a re-scan — crept into the composition);
- the composed tail stays exchange-BOUNDED under growth: the number of
  Exchange operators in the executed plan is a constant of the plan shape,
  never a function of data size (pinned by printing the count per scale —
  the r13 one-visible-exchange claim, now measured on the full chain).

Docs synthesized by stamped duplication of the sf0.1 documents table (ids
offset per copy), charged to setup via localCheckpoint — the standard
corpus-growth construction every sweep here uses.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.llm import pack as P  # noqa: E402
from analyst_toolkit_spark.llm import text as T  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402


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
    return out.localCheckpoint(eager=True)


def _mat(df):
    df.write.mode("overwrite").format("noop").save()


def recipe_tail(docs):
    """epochs -> shuffle -> pack -> shard, exactly the curate_corpus stage
    order (llm/curate.py): upsample 1.5 epochs, permute on (id, epoch),
    pack the permuted stream, assign 8 shards + manifest."""
    up = T.epoch_mix(docs, 1.5)
    shuf = P.global_shuffle(up, id_col=["doc_id", "epoch"], salt="sweep14")
    packed = P.pack_sequences(
        shuf, 512, key="text", id_col="doc_id", order_col="shuffle_pos"
    )
    sharded = P.shard_assign(packed, 8, id_col="shuffle_pos")
    return sharded


def main() -> None:
    spark = get_spark("sweep_r14_recipe_chain")
    spark.sparkContext.setLogLevel("ERROR")
    print("copies,rows,tail_sec,manifest_sec,exchanges", flush=True)
    for copies in (1, 10, 100):
        docs = corpus(spark, copies)
        n = docs.count()

        t0 = time.perf_counter()
        sharded = recipe_tail(docs)
        _mat(sharded)
        t_tail = time.perf_counter() - t0

        # exchange count of the composed plan: must be scale-INVARIANT
        plan = recipe_tail(docs)._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange")

        t0 = time.perf_counter()
        _mat(P.shard_manifest(recipe_tail(docs), id_col="shuffle_pos"))
        t_manifest = time.perf_counter() - t0

        print(f"{copies},{n},{t_tail:.2f},{t_manifest:.2f},{n_ex}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
