#!/usr/bin/env python
"""r10b scale experiment: containment / zipf / PCA / distributed k-means at
1x / 10x / 100x of sf0.1.

- containment_pairs: copies are UNIQUIFIED (a copy-unique token spliced
  between every original token) so no gram repeats across copies — this
  sweeps the LINEAR path. The quadratic path (duplicated corpora) is the
  one the new Σnd(nd−1) census gate intentionally REFUSES (raise, dedup
  first) — pinned by test_containment_pair_cap_census.
- zipf_fit over the shifted-copy corpus (copytag tokens widen the vocab).
- pca_fit + pca_project and kmeans_refine over the embeddings table
  replicated with offset vec_ids (timing is what matters; one (slot)-keyed
  moment shuffle resp. one (cluster, dim) shuffle per iteration).

Usage: python examples/sweep_r10b_100x.py [multipliers...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def main() -> None:
    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import dedup as D
    from analyst_toolkit_spark.llm import similarity as S
    from analyst_toolkit_spark.llm import text as T
    from analyst_toolkit_spark.session import get_spark

    spark = get_spark("sweep_r10b")
    spark.range(1).write.format("noop").mode("overwrite").save()
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    emb_base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n_base, e_base = base.count(), emb_base.count()
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 100]
    print(f"base docs: {n_base}, base embeddings: {e_base}; multipliers: {mults}", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for m in mults:
        parts, eparts = [base], [emb_base]
        for i in range(1, m):
            parts.append(
                base.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                    # unique token spliced between every original token —
                    # no gram survives across copies (linear containment)
                    F.regexp_replace("text", " ", f" u{i} ").alias("text"),
                    "lang", "source", "n_chars",
                )
            )
            eparts.append(
                emb_base.select(
                    (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                    "embedding", "label",
                )
            )
        corpus, emb = parts[0], eparts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        for p in eparts[1:]:
            emb = emb.unionByName(p)
        corpus = corpus.repartition(32).localCheckpoint(eager=True)
        emb = emb.repartition(32).localCheckpoint(eager=True)
        n, en = corpus.count(), emb.count()

        t = time.time()
        # pair_cap raised deliberately: the sweep measures the linear-path
        # CAPABILITY; the default cap is the production POLICY (and fires
        # correctly here — base-corpus gram collisions scale ~linearly with
        # m and cross 5M between 1x and 10x)
        noop(D.containment_pairs(corpus, n=8, threshold=0.3, pair_cap=10**10))
        print(f"[{m}x {n} docs] containment_pairs: {time.time() - t:.1f}s", flush=True)

        t = time.time()
        noop(T.tfidf_cosine_pairs(corpus, threshold=0.9, pair_cap=10**10))
        print(f"[{m}x {n} docs] tfidf_cosine_pairs: {time.time() - t:.1f}s", flush=True)

        t = time.time()
        noop(T.zipf_fit(corpus, top_n=100))
        print(f"[{m}x {n} docs] zipf_fit: {time.time() - t:.1f}s", flush=True)

        t = time.time()
        model = S.pca_fit(emb, k=4)
        noop(S.pca_project(emb, model))
        print(f"[{m}x {en} vecs] pca_fit+project: {time.time() - t:.1f}s", flush=True)

        t = time.time()
        S.kmeans_refine(emb, S._kmeans_driver(
            [r["embedding"] for r in emb.limit(4096).collect()], 8, 8, 42
        ), iters=3)
        print(f"[{m}x {en} vecs] kmeans_refine_3it: {time.time() - t:.1f}s", flush=True)


if __name__ == "__main__":
    main()
