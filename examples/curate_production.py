#!/usr/bin/env python
"""The production curation recipe, end to end — every major stage of
`llm/curate.curate_corpus` in the order a real pre-training pipeline runs
them, with the data card read before and after. Runnable documentation:

  python examples/curate_production.py [sf_dir]     (default sf0.01)

Stage order (and why):
  1. line-level boilerplate dedup  — nav bars / cookie banners inflate
     repetition and deflate quality, so cleaning precedes scoring
     (RefinedWeb §3.2 order)
  2. heuristic quality gate        — cheap, map-only; cuts the obvious junk
     before anything that shuffles
  3. classifier gate               — pinned-weight logreg margin, map-only
  4. exact dedup                   — normalized fingerprint, keep min id
  5. near dedup                    — MinHash-LSH → components → survivor
     (auto gate: pair path vs linear bucket path by candidate census)
  6. semantic dedup (r12)          — embedding-space SemDeDup: paraphrases
     whose token shingles differ collapse on original-space cosine; runs
     when the frame carries an embedding column (joined below)
  7. containment subset-drop (r11) — A ⊂ B ⇒ drop the subset, keep the
     superset; runs post-near-dedup where the pair census is cheap
  8. span decontamination          — cut benchmark-overlapping token runs,
     keep the untainted remainder
  8b. semantic decontamination (r12) — drop docs whose EMBEDDING cosine
     reaches an eval vector: the paraphrased eval item no n-gram survives
     to flag; zero-shuffle literal-benchmark scan
  9. leakage-safe split            — near-dup clusters never straddle
     train/val/test
 10. epoch upsampling (r13)        — fractional recipe epochs AFTER the
     split, so every copy inherits its doc's split
 11. seeded global shuffle (r13)   — deterministic md5(id, epoch | salt)
     permutation; the training stream loses all crawl/id locality
 12. token-budget packing          — per-split prefix-sum sequence
     assembly, walking the PERMUTED order
 13. shard export                  — the train split written as
     token-balanced `shard=K/` dirs + manifest (write_training_shards)

At 100 TB: every self-referencing stage runs behind a lineage cut (set
``checkpoint_dir`` to an object-store path for durable, resumable cuts),
census gates refuse quadratic candidate volumes instead of attempting
them, and the only driver-side data is the stage report.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import classify as C
    from analyst_toolkit_spark.llm.curate import CurationConfig, curate_corpus
    from analyst_toolkit_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curate_production")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    # the corpus carries precomputed embeddings (vec_id keys doc_id) — the
    # semantic stage arms itself from the column's presence
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    docs = docs.join(emb, "doc_id", "left")
    # benchmark to decontaminate against: every 25th doc stands in for the
    # eval set a real pipeline guards
    benchmark = docs.filter(F.col("doc_id") % 25 == 0).select("text")
    # the SAME eval set's embeddings arm the semantic decontamination net —
    # the paraphrase-contamination the n-gram spans can't see
    bench_emb = docs.filter(F.col("doc_id") % 25 == 0).select("embedding")

    cfg = CurationConfig(
        key="text",
        id_col="doc_id",
        redact_pii=True,                 # stage 0: scrub before anything
        line_dedup_min_docs=30,          # stage 1 (sep="\n" default; the
        line_dedup_sep=" the ",          # synthetic corpus has no newlines)
        min_quality=0.2,                 # stage 2
        max_repetition=0.5,
        classifier_weights=[0.0] * len(C.FEATURE_NAMES),  # stage 3 (neutral
        classifier_threshold=-1.0,       # weights: gate wired, nothing cut)
        exact_dedup=True,                # stage 4
        near_dedup_threshold=0.8,        # stage 5 (auto engine)
        near_dedup_keep="best_quality",  # survivor = cleanest member
        semantic_dedup_threshold=0.9,    # stage 6 (r12): embedding SemDeDup
        semantic_pca_dims=8,             # bucket in the top-variance subspace
        semantic_pair_cap=5_000_000,     # census gate before the bucket join
        containment_drop_threshold=0.5,  # stage 7 (r11)
        benchmark=benchmark,             # stage 8
        decontaminate_mode="spans",
        semantic_benchmark=bench_emb,    # stage 8b (r12): embedding-level
        semantic_decon_threshold=0.999,  # decon — zero-shuffle literal scan
        splits={"train": 0.9, "val": 0.05, "test": 0.05},
        split_mode="leakage_safe",       # stage 8
        epochs=1.25,                     # stage 9 (r13): recipe upsampling —
        # every doc once, an md5-gated quarter twice; pass a per-source dict
        # ({"wiki": 2.5, "web": 0.6}) for a real mixing recipe (unlisted
        # sources drop); copies inherit the doc's split
        shuffle_salt="prod-run-1",       # stage 10 (r13): seeded global
        # permutation; packing walks the locality-free permuted stream
        pack_budget=512,                 # stage 11
        report_counts=True,              # per-stage row census (opt-in scans)
        report_data_card=True,           # before/after per-source card
    )
    curated, report = curate_corpus(docs, cfg)

    print("\n=== stage report ===")
    for stage, info in report.items():
        line = {k: v for k, v in info.items() if k != "data_card"}
        print(f"{stage}: {line}")
    print("\n=== input data card ===")
    for row in report["input"]["data_card"]:
        print(row)
    print("\n=== output data card ===")
    for row in report["output"]["data_card"]:
        print(row)
    print("\n=== curated sample ===")
    curated.select("doc_id", "epoch", "split", "shuffle_pos", "seq_id", "n_tokens").show(10)

    # ship it: the train split as token-balanced shards + manifest — what a
    # training job actually reads (one shard dir per loader worker).
    # id_col="shuffle_pos", NOT doc_id: epoch copies duplicate doc_id, and
    # the balanced-mode prefix sum needs a UNIQUE walk key — the shuffle
    # position is unique by construction AND makes each shard a contiguous
    # token-balanced slice of the PERMUTED stream (shards stay
    # locality-free, the whole point of the shuffle).
    import tempfile

    from analyst_toolkit_spark.llm.pack import write_training_shards

    out_dir = tempfile.mkdtemp(prefix="train_shards_")
    manifest = write_training_shards(
        curated.filter(F.col("split") == "train").drop("embedding"),
        out_dir,
        n_shards=8,
        tokens_col="n_tokens",
        id_col="shuffle_pos",
    )
    print(f"\n=== train shards ({out_dir}) ===")
    manifest.orderBy("shard").show()
    spark.stop()


if __name__ == "__main__":
    main()
