"""r15: A/B the positioned-gram-stream lineage cut inside repeated_spans
(the census and the hit semi-join currently re-derive the gram stream —
tokenize + 8 slices + zip-concat + hash — independently)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402


def jobs(spark):
    return len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_spans")
    spark.sparkContext.setLogLevel("ERROR")
    from analyst_toolkit_spark.llm import dedup as D

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()

    def run(tag, fn, n=3):
        outs = []
        for _ in range(n):
            j0, t0 = jobs(spark), time.perf_counter()
            res = fn()
            outs.append((round(time.perf_counter() - t0, 3), jobs(spark) - j0, res))
        print(f"{tag:50s} best={min(o[0] for o in outs):7.3f}s jobs={outs[-1][1]}  {[o[0] for o in outs]}", flush=True)
        return outs[-1][2]

    def spans_cut(df, id_col="doc_id", text_col="text", n=8, min_docs=2):
        grams = D.positioned_ngrams(text_col, n)
        gdf = df.select(F.col(id_col), F.posexplode(grams).alias("pos", "__gram")).select(
            id_col, "pos", F.xxhash64("__gram").alias("__gh")
        ).localCheckpoint(eager=False)
        dup = (
            gdf.groupBy("__gh")
            .agg(F.countDistinct(F.col(id_col)).alias("__nd"))
            .filter(F.col("__nd") >= min_docs)
            .select("__gh")
        )
        hits = gdf.join(dup, "__gh", "left_semi").select(id_col, "pos")
        return D._span_islands(hits, id_col, n)

    a = run("repeated_spans current (recompute)", lambda: sorted(
        map(tuple, D.repeated_spans(docs, n=8, min_docs=2).collect())))
    b = run("repeated_spans w/ gdf lazy cut", lambda: sorted(
        map(tuple, spans_cut(docs).collect())))
    print("identical:", a == b, len(a), flush=True)

    c = run("remove_spans current", lambda: D.remove_repeated_spans(docs, n=8, min_docs=2)
            .agg(F.sum("kept_tokens"), F.sum("removed_tokens")).collect())
    d = run("remove_spans w/ gdf cut", lambda: D._cut_spans(docs, spans_cut(docs))
            .agg(F.sum("kept_tokens"), F.sum("removed_tokens")).collect())
    print("identical:", c == d, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
