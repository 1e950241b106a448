#!/usr/bin/env python
"""r10 scale experiment (r9 VERDICT #3 + new-r10 ops): 1x / 10x / 100x of
sf0.1.

Documents (shifted-copy corpus, per-copy suffix token):
  - tfidf_top_terms (k=3)          — doc-partitioned window, ~linear
  - bigram_pmi (k=30)              — linear zip_with bigrams + bounded aggs
  - token_entropy (by=source)      — one word-count shuffle + totals join
  - line_dedup (sep=' the ')       — NEW r10: labels-only census + doc agg

Events (shifted-copy USERS — per-user density constant, user count scales,
the 100 TB shape for user-keyed windows):
  - events_trailing_avg            — µs-exact rangeBetween, user-partitioned
  - events_session_paths           — session_window + one path agg
  - interval_join (4 h attribution)— NEW r10: the stream-stream join's
    batch-equivalent plan (state bound ∝ rate x window)

Images (synthetic PNG corpus, m<=10 — pure-Python codec, cost ∝ blobs):
  - image_perceptual_hash + hamming pairs (dHash)

Usage: python examples/sweep_r10ops_100x.py [multipliers...]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

IMAGE_MAX_MULT = 10
IMAGE_BASE_BLOBS = 1200


def main() -> None:
    import __spark_entry__ as entry
    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import multimodal as M
    from analyst_toolkit_spark.llm import text as T
    from analyst_toolkit_spark.session import get_spark
    from analyst_toolkit_spark.streaming.joins import interval_join

    spark = get_spark("sweep_r10ops")
    spark.range(1).write.format("noop").mode("overwrite").save()
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    ev_base = load_table(spark, "/root/testdata/sf0.1", "events")
    n_base, ev_n_base = base.count(), ev_base.count()
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 100]
    print(f"base docs: {n_base}, base events: {ev_n_base}; multipliers: {mults}", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for m in mults:
        parts = [base]
        ev_parts = [ev_base]
        for i in range(1, m):
            parts.append(
                base.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
            ev_parts.append(
                ev_base.select(
                    (F.col("event_id") + i * 10_000_000).alias("event_id"),
                    "ts",
                    (F.col("user_id") + i * 100_000).alias("user_id"),
                    "event_type",
                    "value",
                    "props",
                )
            )
        corpus, events = parts[0], ev_parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        for p in ev_parts[1:]:
            events = events.unionByName(p)
        corpus = corpus.repartition(32).localCheckpoint(eager=True)
        n = corpus.count()

        for label, build in (
            ("tfidf_top_terms", lambda: T.tfidf_top_terms(corpus, k=3)),
            ("bigram_pmi", lambda: T.bigram_pmi(corpus, k=30, min_count=5)),
            ("token_entropy", lambda: T.token_entropy(corpus, by="source")),
            ("line_dedup", lambda: T.line_dedup(corpus, sep=" the ", min_docs=3)),
        ):
            t = time.time()
            noop(build())
            print(f"[{m}x {n} docs] {label}: {time.time() - t:.1f}s", flush=True)

        ev_dir = tempfile.mkdtemp(prefix="sweep_ev_")
        try:
            events.repartition(32).write.mode("overwrite").parquet(f"{ev_dir}/events.parquet")
            ev_count = m * ev_n_base
            t = time.time()
            noop(entry.q_events_trailing_avg(spark, ev_dir))
            print(f"[{m}x {ev_count} events] events_trailing_avg: {time.time() - t:.1f}s", flush=True)
            t = time.time()
            noop(entry.q_events_session_paths(spark, ev_dir))
            print(f"[{m}x {ev_count} events] events_session_paths: {time.time() - t:.1f}s", flush=True)

            ev = load_table(spark, ev_dir, "events")
            purch = ev.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
            )
            clicks = ev.filter(F.col("event_type").isin("click", "view")).select(
                "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
            )
            t = time.time()
            noop(interval_join(purch, clicks, key="user_id", left_ts="pts",
                               right_ts="cts", window="4 hours"))
            print(f"[{m}x {ev_count} events] interval_join_4h: {time.time() - t:.1f}s", flush=True)
        finally:
            shutil.rmtree(ev_dir, ignore_errors=True)

        if m <= IMAGE_MAX_MULT:
            n_blobs = IMAGE_BASE_BLOBS * m
            ids = spark.range(n_blobs).select(F.col("id").alias("doc_id"))

            def gen(batches):
                import pandas as pd

                from analyst_toolkit_spark.llm.multimodal import encode_png

                mask = (1 << 32) - 1
                for pdf in batches:
                    blobs = []
                    for did in pdf["doc_id"]:
                        g = int(did) % 300  # 300 distinct patterns -> real dup clusters
                        px = bytearray()
                        for y in range(32):
                            for x in range(32):
                                h = (x * 2654435761 + y * 2246822519 + g * 3266489917) & mask
                                h ^= h >> 13
                                px += bytes((h & 0xC8, (h >> 8) & 0xC8, (h >> 16) & 0xC8))
                        blobs.append(bytes(encode_png(32, 32, 3, bytes(px))))
                    yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

            imgs = ids.repartition(32).mapInPandas(gen, schema="doc_id long, content binary")
            imgs = imgs.localCheckpoint(eager=True)  # time hashing, not generation
            t = time.time()
            noop(M.image_near_pairs(imgs, max_hamming=4))
            print(f"[{m}x {n_blobs} blobs] image_near_pairs: {time.time() - t:.1f}s", flush=True)


if __name__ == "__main__":
    main()
