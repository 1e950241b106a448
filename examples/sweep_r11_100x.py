#!/usr/bin/env python
"""r11 scale experiments (r10 VERDICT #4/#5 + the Bayardo #2 sweep row):

Part A — 1x/10x/100x of sf0.1 documents for the three post-sweep late-r10
operators plus the r11 prefix-filter cosine join:
- dedup_lines_within_doc (doc-keyed window + reassembly; sep=' the ' like
  the line_dedup row — the synthetic docs carry no newlines)
- grouped_ntile (group-reset prefix sum; by source, 10 bands)
- corpus_data_card boilerplate arm (labels-only line census)
- tfidf_cosine_pairs with PREFIX FILTERING over VOCAB-SHIFTED copies
  (every token of copy i prefixed c{i}x, so each copy reproduces the base
  corpus's df distribution with a disjoint vocabulary — true pair count
  and candidate volume both scale LINEARLY in m; the r10 uniquified-copy
  construction is wrong for the exact algorithm: a shared per-copy splice
  token dominates every norm and makes the TRUE output quadratic, which
  is precisely what the census gate exists to refuse).

Part B — ANN recall/timing grade at 10x embeddings (20k vectors):
raw/SQ8/PQ ivf_probe tiers (nprobe 4/16) vs brute-force cosine top-10,
5 deterministic queries; copies carry per-(id, dim) xxhash jitter so they
are near- but not exact duplicates of the base vectors.

Usage: python examples/sweep_r11_100x.py [multipliers...]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def main() -> None:
    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import pack as P
    from analyst_toolkit_spark.llm import similarity as S
    from analyst_toolkit_spark.llm import text as T
    from analyst_toolkit_spark.session import get_spark

    spark = get_spark("sweep_r11")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).write.format("noop").mode("overwrite").save()
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 100]
    print(f"base docs: {n_base}; multipliers: {mults}", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for m in mults:
        parts = [base]
        for i in range(1, m):
            parts.append(
                base.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                    # vocab shift: copy i's tokens are c{i}x<token> — same df
                    # histogram as the base corpus, disjoint across copies
                    F.regexp_replace("text", r"([A-Za-z0-9']+)", f"c{i}x$1").alias("text"),
                    "lang", "source", "n_chars",
                )
            )
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        corpus = corpus.repartition(32).localCheckpoint(eager=True)
        n = corpus.count()

        t = time.time()
        noop(T.dedup_lines_within_doc(corpus, sep=" the "))
        print(f"[{m}x {n} docs] dedup_lines_within_doc: {time.time() - t:.1f}s", flush=True)

        t = time.time()
        noop(P.grouped_ntile(corpus.withColumn("q", T.quality_score("text")),
                             10, ["q", "doc_id"], "source"))
        print(f"[{m}x {n} docs] grouped_ntile: {time.time() - t:.1f}s", flush=True)

        t = time.time()
        noop(T.corpus_data_card(corpus, by="source", boilerplate_sep=" the ",
                                boilerplate_min_docs=30))
        print(f"[{m}x {n} docs] data_card_boilerplate: {time.time() - t:.1f}s", flush=True)

        if m <= 10:
            t = time.time()
            out = T.tfidf_cosine_pairs(corpus, threshold=0.9, pair_cap=10**10)
            pairs = out.count()
            print(f"[{m}x {n} docs] tfidf_cosine_pairs(prefix-filter): "
                  f"{time.time() - t:.1f}s, {pairs} pairs", flush=True)
        else:
            # the synthetic corpus is adversarially DENSE for lexical
            # similarity (~40-term vocab -> ~12.4M candidate pairs at 1x,
            # candidate-mass linear in m under the vocab shift); the default
            # pair_cap census refuses far below this volume. 1x/10x measure
            # the linearity; 100x would only re-measure the same slope for
            # ~1 h of wall clock.
            print(f"[{m}x {n} docs] tfidf_cosine_pairs: skipped "
                  "(candidate-mass linear, measured at 1x/10x; census-gated "
                  "by default)", flush=True)

    # ---- Part B: ANN recall/timing at 10x embeddings --------------------
    emb_base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    eparts = [emb_base.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))]
    for i in range(1, 10):
        eparts.append(
            emb_base.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x, j: x + (F.xxhash64(F.col("vec_id") + i * 1_000_000, j) % 997).cast("double") / 9970.0,
                ).alias("embedding"),
            )
        )
    emb = eparts[0]
    for p in eparts[1:]:
        emb = emb.unionByName(p)
    emb = emb.repartition(32).localCheckpoint(eager=True)
    en = emb.count()
    print(f"embeddings 10x: {en} vectors", flush=True)

    t = time.time()
    assigned, centroids = S.ivf_build(emb, nlist=16)
    print(f"[ann {en}] ivf_build(nlist=16): {time.time() - t:.1f}s", flush=True)
    idx = {}
    for tier in ("raw", "sq8", "pq"):
        t = time.time()
        idx[tier] = tempfile.mkdtemp(prefix=f"sweep_ivf_{tier}_")
        S.ivf_write(assigned, centroids, idx[tier], quantize=tier)
        print(f"[ann {en}] ivf_write({tier}): {time.time() - t:.1f}s", flush=True)

    # queries = midpoints of base-vector pairs, NOT corpus members — their
    # true top-10 straddles two clusters, so partial-probe recall is a real
    # measurement (corpus-member queries trivially find their own jittered
    # copies inside one cell)
    base_vecs = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 10).orderBy("vec_id").collect()
    ]
    queries = [
        [(a + b) / 2.0 for a, b in zip(base_vecs[2 * i], base_vecs[2 * i + 1])]
        for i in range(5)
    ]
    t = time.time()
    exact = [
        {r["vec_id"] for r in S.cosine_topk(emb, q, k=10).collect()} for q in queries
    ]
    brute_s = time.time() - t
    print(f"[ann {en}] brute_force_topk x5: {brute_s:.1f}s", flush=True)
    for tier in ("raw", "sq8", "pq"):
        t = time.time()
        recs = []
        for q, ex in zip(queries, exact):
            got = {r["vec_id"] for r in S.ivf_probe(spark, idx[tier], q, k=10, nprobe=4).collect()}
            recs.append(len(got & ex) / 10.0)
        print(f"[ann {en}] ivf_probe({tier}, nprobe=4/16) x5: {time.time() - t:.1f}s, "
              f"recall@10 mean={sum(recs) / len(recs):.2f} min={min(recs):.2f}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
