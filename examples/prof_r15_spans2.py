"""r15 optimization round (session 4) — shared-token-frame cut for the span
REMOVAL operators. remove_repeated_spans / remove_contaminated_spans each
ran the regex tokenizer over the corpus TWICE (the detection gram stream
and the token surgery); one size-gated (id, __toks) lazy cut now feeds
both. OLD forms below are verbatim copies of the pre-change composition
(gram-stream cut only, surgery re-tokenizes). Asserts output identity,
then interleaves timing.

Run: python examples/prof_r15_spans2.py [sf_dir]
"""

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


def old_cut_spans(df, spans, id_col="doc_id", text_col="text"):
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("__spans")
    )
    toks = F.coalesce(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9']+"), F.lit(0)),
        F.array().cast("array<string>"),
    )
    base = df.select(F.col(id_col), toks.alias("__toks")).join(per_doc, id_col, "left")
    in_span = lambda tok, i: F.exists(  # noqa: E731
        F.col("__spans"), lambda s: (i >= s["start_tok"]) & (i <= s["end_tok"])
    )
    kept = F.when(F.col("__spans").isNull(), F.col("__toks")).otherwise(
        F.filter("__toks", lambda tok, i: ~in_span(tok, i))
    )
    out = base.select(F.col(id_col), F.col("__toks"), kept.alias("__kept"))
    return out.select(
        F.col(id_col),
        F.array_join("__kept", " ").alias("clean_text"),
        F.size("__kept").alias("kept_tokens"),
        (F.size("__toks") - F.size("__kept")).alias("removed_tokens"),
    )


def old_repeated_spans(D, df, n=8, min_docs=2, id_col="doc_id", text_col="text"):
    grams = D.positioned_ngrams(text_col, n)
    gdf = (
        df.select(F.col(id_col), F.posexplode(grams).alias("pos", "__gram"))
        .select(id_col, "pos", F.xxhash64("__gram").alias("__gh"))
        .localCheckpoint(eager=False)
    )
    dup = (
        gdf.groupBy("__gh")
        .agg(F.countDistinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__gh")
    )
    hits = gdf.join(dup, "__gh", "left_semi").select(id_col, "pos")
    return D._span_islands(hits, id_col, n)


def old_contaminated_spans(D, df, benchmark, n=8, id_col="doc_id", text_col="text"):
    bench_grams = (
        benchmark.select(F.explode(D.shingles("text", n)).alias("__g"))
        .select(F.xxhash64("__g").alias("__gh"))
        .distinct()
    )
    grams = D.positioned_ngrams(text_col, n)
    gdf = df.select(F.col(id_col), F.posexplode(grams).alias("pos", "__gram")).select(
        id_col, "pos", F.xxhash64("__gram").alias("__gh")
    )
    hits = gdf.join(bench_grams, "__gh", "left_semi").select(id_col, "pos")
    return D._span_islands(hits, id_col, n)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_r15_spans2")
    spark.sparkContext.setLogLevel("ERROR")
    from analyst_toolkit_spark.llm import dedup as D

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()
    bench = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("text")
    )

    # ---- output identity --------------------------------------------------
    old_rep = old_cut_spans(docs, old_repeated_spans(D, docs))
    new_rep = D.remove_repeated_spans(docs, n=8, min_docs=2)
    a = sorted(tuple(r) for r in old_rep.collect())
    b = sorted(tuple(r) for r in new_rep.collect())
    assert a == b, f"repeated MISMATCH {len(a)} vs {len(b)}"
    print(f"remove_repeated_spans identity OK: {len(a)} rows", flush=True)

    old_con = old_cut_spans(docs, old_contaminated_spans(D, docs, bench))
    new_con = D.remove_contaminated_spans(docs, bench, n=8)
    a = sorted(tuple(r) for r in old_con.collect())
    b = sorted(tuple(r) for r in new_con.collect())
    assert a == b, f"contaminated MISMATCH {len(a)} vs {len(b)}"
    print(f"remove_contaminated_spans identity OK: {len(a)} rows", flush=True)

    # ---- interleaved timing ----------------------------------------------
    arms = [
        ("rep/old", lambda: old_cut_spans(docs, old_repeated_spans(D, docs))),
        ("rep/new", lambda: D.remove_repeated_spans(docs, n=8, min_docs=2)),
        ("con/old", lambda: old_cut_spans(docs, old_contaminated_spans(D, docs, bench))),
        ("con/new", lambda: D.remove_contaminated_spans(docs, bench, n=8)),
    ]
    for tag, fn in arms:
        noop(fn())  # compile warm-up
    results = {tag: [] for tag, _ in arms}
    for _ in range(3):
        for tag, fn in arms:
            spark.sparkContext.setJobDescription(f"spans2/{tag}")
            j0, t0 = jobs(spark), time.perf_counter()
            noop(fn())
            results[tag].append(round(time.perf_counter() - t0, 3))
            print(f"{tag}: {results[tag][-1]:.3f}s jobs={jobs(spark)-j0}", flush=True)
    spark.sparkContext.setJobDescription(None)
    for tag, xs in results.items():
        print(f"{tag}: best={min(xs):.3f}s samples={xs}")
    spark.stop()


if __name__ == "__main__":
    main()
