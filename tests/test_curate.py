"""End-to-end corpus curation chain (llm/curate.py)."""

import pytest
from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.llm import curate as C
from analyst_toolkit_spark.llm import text as T


def test_curate_full_chain(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    out, report = C.curate_corpus(
        docs,
        min_quality=0.2,
        max_repetition=0.5,
        languages=["en", "und"],
        exact_dedup=True,
        near_dedup_threshold=0.8,
        benchmark=bench,
        sample_weight=None,
        splits={"train": 0.9, "val": 0.05, "test": 0.05},
        pack_budget=512,
        report_counts=True,
    )
    stages = list(report)
    assert stages == [
        "input", "quality_gate", "exact_dedup", "near_dedup",
        "decontaminate", "split", "pack", "output",
    ]
    # counts are monotone non-increasing through the filtering stages
    counts = [report[s]["rows"] for s in ("input", "quality_gate", "exact_dedup", "near_dedup", "decontaminate")]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # the benchmark members themselves were filtered out by decontamination
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    bench_ids = {r["doc_id"] for r in docs.filter(F.col("doc_id") % 50 == 0).collect()}
    surviving_bench = kept & bench_ids
    assert not surviving_bench
    # output schema carries the split and packing columns
    assert {"split", "seq_id", "n_tokens"} <= set(out.columns)
    assert report["output"]["rows"] == out.count() > 0


def test_curate_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cfg = dict(min_quality=0.2, exact_dedup=True, splits={"train": 0.8, "val": 0.2})
    a, _ = C.curate_corpus(docs, **cfg)
    b, _ = C.curate_corpus(docs.repartition(11), **cfg)
    rows_a = {(r["doc_id"], r["split"]) for r in a.select("doc_id", "split").collect()}
    rows_b = {(r["doc_id"], r["split"]) for r in b.select("doc_id", "split").collect()}
    assert rows_a == rows_b


def test_curate_stages_optional(spark):
    docs = spark.createDataFrame(
        [(1, "hello world document with plenty of ordinary words in it")], ["doc_id", "text"]
    )
    out, report = C.curate_corpus(docs, exact_dedup=False)
    assert list(report) == ["input", "output"]
    assert out.count() == 1 and out.columns == ["doc_id", "text"]


def test_curate_html_stage(spark):
    docs = spark.createDataFrame(
        [(1, "<p>clean me <script>x()</script>now</p>")], ["doc_id", "text"]
    )
    out, report = C.curate_corpus(docs, strip_html=True, exact_dedup=False)
    assert out.first()["text"] == "clean me now"
    assert "clean" in report


def test_curate_checkpoint_dir_durable_and_identical(spark, sf_dir, tmp_path):
    """checkpoint_dir swaps executor-local lineage cuts for durable parquet
    round-trips: identical output, severed lineage (the plan reads the
    checkpoint files, not the raw corpus scan)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cfg = dict(
        min_quality=0.2,
        exact_dedup=True,
        near_dedup_threshold=0.8,
        splits={"train": 0.8, "val": 0.2},
    )
    local, _ = C.curate_corpus(docs, **cfg)
    ckpt = str(tmp_path / "curate_ckpt")
    durable, _ = C.curate_corpus(docs, checkpoint_dir=ckpt, **cfg)
    a = {(r["doc_id"], r["split"]) for r in local.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in durable.select("doc_id", "split").collect()}
    assert a == b and a
    # lineage severed: the durable plan scans the checkpoint dir, not the corpus
    files = durable.inputFiles()
    assert files and all("curate_ckpt" in f for f in files)
    import os

    assert any(d.startswith("stage_") for d in os.listdir(ckpt))


def test_curate_pack_never_mixes_splits(spark, sf_dir):
    """Packing runs per split: no packed sequence may span train/val/test
    (eval docs inside a training sequence = contamination)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out, report = C.curate_corpus(
        docs,
        exact_dedup=True,
        splits={"train": 0.7, "val": 0.15, "test": 0.15},
        pack_budget=64,  # small budget -> many sequences -> real mixing risk
    )
    assert report["pack"]["per_split"] is True
    mixed = (
        out.groupBy("seq_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert mixed == 0


@pytest.mark.slow  # r16 tier split (default tier: test_curate_full_chain + per-gate operator tests)
def test_curate_new_gates_classifier_span_charlm(spark):
    """The three late-r6 stages compose in one chain: the pinned-weight
    classifier gate drops digit spam, span removal cuts shared boilerplate,
    and a char-LM gate (trained on a CLEAN reference, the CCNet shape) drops
    out-of-distribution gibberish."""
    boiler = "subscribe to our newsletter for daily updates and offers"
    spam = "11#22 33!44 55$66 77%88 99&00 !!@@ 1122334455 66778899 00112233 445566"
    gibberish = "zqxj wvkp qzzx jjqv xkwz pqvj zzkx qwwv jxkp zvqz xwjk pqqz"

    def body(i):
        # per-doc distinct wording: no 4-token run repeats across docs
        # except the injected boilerplate tail
        return " ".join(f"w{i}b{j} m{(i * 7 + j) % 13}e{j}" for j in range(8))

    rows = (
        [(i, f"{body(i)} {boiler}") for i in range(10)]
        + [(100 + i, f"{spam} {i}") for i in range(3)]
        + [(200, f"{gibberish} {boiler}")]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    from analyst_toolkit_spark.llm import classify as CL

    feat = docs.select(
        "doc_id", CL.quality_features("text").alias("features"),
        (~F.col("doc_id").between(100, 199)).cast("int").alias("label"),
    ).localCheckpoint(eager=True)
    w = CL.train_logreg(feat, "label", iters=50, lr=1.0)

    reference = docs.filter(F.col("doc_id") < 10).select("doc_id", "text")
    out, report = C.curate_corpus(
        docs,
        exact_dedup=True,
        classifier_weights=w,
        span_dedup_n=4,
        min_lm_prob=0.05,
        lm_reference=reference,
        report_counts=True,
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert not any(100 <= d <= 199 for d in got), "classifier gate dropped all spam"
    # the shared boilerplate tail is cut from every surviving doc
    assert got and all("subscribe to our newsletter" not in t for t in got.values())
    # gibberish is OOV under the clean-reference char LM (its boilerplate,
    # the only in-distribution part, was cut by span removal first)
    assert 200 not in got
    # clean docs survive every gate, with their distinct bodies intact
    assert set(range(10)) == set(got)
    assert all(f"w{i}b0" in got[i] for i in range(10))
    assert report["classifier_gate"]["rows"] == 11          # 10 clean + gibberish
    assert report["span_removal"]["n"] == 4
    assert report["charlm_gate"]["reference"] == "external"


def test_curate_leakage_safe_split(spark, sf_dir):
    """split_mode='leakage_safe': a near-dup copy kept by the chain (no
    near-dedup stage configured) must land in the SAME split as its source;
    hash mode scatters at least one such pair at this corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(300)
    copies = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" nearcopy")).alias("text"),
    )
    corpus = docs.unionByName(copies)
    out, report = C.curate_corpus(
        corpus,
        exact_dedup=False,
        splits={"train": 0.8, "val": 0.2},
        split_mode="leakage_safe",
        split_cluster_threshold=0.7,
        checkpoint=False,
    )
    assert report["split"]["mode"] == "leakage_safe"
    assert report["split"]["cluster_strategy"]
    m = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    pairs = [(d, d + 100000) for d in m if d < 100000 and d + 100000 in m]
    assert pairs
    assert all(m[a] == m[b] for a, b in pairs), "near-dup pair straddles splits"
    # the plain hash split demonstrably scatters at least one of these pairs
    hashed = {r["doc_id"]: r["split"] for r in T.hash_split(corpus).select("doc_id", "split").collect()}
    assert any(hashed[a] != hashed[b] for a, b in pairs)
    # unknown mode rejected
    with pytest.raises(ValueError):
        C.curate_corpus(corpus, splits={"train": 1.0}, split_mode="bogus")


def test_curate_report_data_card(spark, sf_dir):
    """report_data_card=True: input + output per-source cards land in the
    report; curation can only shrink per-source doc counts; a missing
    grouping column raises."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    ).limit(400)
    out, report = C.curate_corpus(
        docs,
        min_quality=0.3,
        exact_dedup=True,
        report_data_card=True,
        checkpoint=False,
    )
    cin = {r["source"]: r for r in report["input"]["data_card"]}
    cout = {r["source"]: r for r in report["output"]["data_card"]}
    assert cin and set(cout) <= set(cin)
    assert all(set(r) == {"source", "docs", "total_tokens", "avg_quality", "dup_docs", "lang_match_docs"} for r in report["input"]["data_card"])
    for s, r in cout.items():
        assert r["docs"] <= cin[s]["docs"]
        assert r["total_tokens"] <= cin[s]["total_tokens"]
    assert sum(r["docs"] for r in cout.values()) == out.count()
    with pytest.raises(ValueError):
        C.curate_corpus(docs.drop("source"), report_data_card=True)


def test_curate_dsir_stage(spark, sf_dir):
    """The DSIR selection stage keeps exactly the docs dsir_logweights marks
    above the weight floor, records its config in the report, and composes
    with the downstream dedup stages."""
    from analyst_toolkit_spark.llm import select as SEL

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    target = docs.filter(F.col("lang") == "en")
    out, report = C.curate_corpus(
        docs,
        dsir_target=target,
        dsir_alpha=0.1,  # the q_dsir_weights_docs calibration note: 0.5's
        # smoothing mass selects ~nothing on the tiny test corpus
        exact_dedup=True,
        report_counts=True,
    )
    assert list(report) == ["input", "dsir_select", "exact_dedup", "output"]
    assert report["dsir_select"] == {
        "buckets": 1024, "alpha": 0.1, "min_weight": 0.0,
        "rows": report["dsir_select"]["rows"],
    }
    # ground truth: the standalone operator's selected set, then exact dedup
    w = SEL.dsir_logweights(docs, target, alpha=0.1)
    selected = {r["doc_id"] for r in w.filter(F.col("selected")).collect()}
    assert report["dsir_select"]["rows"] == len(selected)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept <= selected
    # the selected pool skews toward the target language (the operator's job)
    langs = dict(
        docs.join(spark.createDataFrame([(i,) for i in selected], ["doc_id"]), "doc_id")
        .groupBy("lang").count().collect()
    )
    frac_en_selected = langs.get("en", 0) / max(1, sum(langs.values()))
    total = dict(docs.groupBy("lang").count().collect())
    frac_en_corpus = total["en"] / sum(total.values())
    assert frac_en_selected > frac_en_corpus


def test_curate_md5_buckets_engine(spark, sf_dir):
    """near_dedup_engine='md5_buckets' (r8 VERDICT #3): the deterministic
    cross-engine chain — near-dedup survivors equal a manual
    bucket_components + dedup_from_components composition, the report
    records the engine for BOTH the dedup stage and the leakage_safe split
    clustering, and the best_quality survivor election threads through."""
    from analyst_toolkit_spark.llm import dedup as D

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(300)
    out, report = C.curate_corpus(
        docs,
        exact_dedup=True,
        near_dedup_threshold=0.8,
        near_dedup_engine="md5_buckets",
        near_dedup_k=8,
        near_dedup_bands=4,
        splits={"train": 0.8, "val": 0.2},
        split_mode="leakage_safe",
        checkpoint=False,
    )
    assert report["near_dedup"]["method"] == "md5_buckets"
    assert report["split"]["cluster_strategy"] == "md5_buckets"
    got = {r["doc_id"] for r in out.select("doc_id").collect()}

    # manual composition of the same stages (exact dedup -> md5 CC -> min-id)
    fp = T.fingerprint(F.col("text")).alias("__fp")
    keep = (
        docs.select("doc_id", fp).groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    ).select("doc_id")
    d1 = docs.join(keep, "doc_id", "left_semi")
    comps = D.bucket_components(d1, k=8, bands=4, method="md5")
    d2 = D.dedup_from_components(d1, comps)
    assert got == {r["doc_id"] for r in d2.select("doc_id").collect()}

    # best_quality election flows through the md5 engine too
    out_q, report_q = C.curate_corpus(
        docs,
        exact_dedup=False,
        near_dedup_threshold=0.8,
        near_dedup_engine="md5_buckets",
        near_dedup_keep="best_quality",
        checkpoint=False,
    )
    assert report_q["near_dedup"]["keep"] == "best_quality"
    scored = docs.withColumn("__q", T.quality_score(F.col("text")))
    comps_all = D.bucket_components(docs, k=8, bands=4, method="md5")
    best = D.dedup_representatives_by(scored, comps_all, "__q")
    assert {r["doc_id"] for r in out_q.select("doc_id").collect()} == {
        r["doc_id"] for r in best.select("doc_id").collect()
    }
    assert "__ndq" not in out_q.columns
    with pytest.raises(ValueError):
        C.curate_corpus(docs, near_dedup_threshold=0.8, near_dedup_engine="md5bucket")


def test_curate_output_card_reuses_split_clustering(spark, sf_dir):
    """With split_mode='leakage_safe' + report_data_card, the OUTPUT card
    reuses the split stage's cluster labels: near_dup_docs appears per
    source (bounded by docs) with no second clustering; the input card and
    non-leakage-safe runs keep the exact-only schema."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    ).limit(300)
    copies = docs.limit(40).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" nearcopy")).alias("text"),
        "lang",
        "source",
    )
    out, report = C.curate_corpus(
        docs.unionByName(copies),
        splits={"train": 0.8, "val": 0.2},
        split_mode="leakage_safe",
        split_cluster_threshold=0.7,
        report_data_card=True,
        checkpoint=False,
    )
    card_in = report["input"]["data_card"]
    card_out = report["output"]["data_card"]
    assert all("near_dup_docs" not in r for r in card_in)
    assert all("near_dup_docs" in r for r in card_out)
    assert sum(r["near_dup_docs"] for r in card_out) > 0  # the copies cluster
    assert all(0 <= r["near_dup_docs"] <= r["docs"] for r in card_out)
    # hash mode: no clustering exists -> output card stays exact-only
    _, report_h = C.curate_corpus(
        docs, splits={"train": 1.0}, split_mode="hash",
        report_data_card=True, checkpoint=False,
    )
    assert all("near_dup_docs" not in r for r in report_h["output"]["data_card"])


def test_curate_line_dedup_stage(spark):
    """r10: the line-level boilerplate stage cuts corpus-repeated lines
    BEFORE quality gating, drops fully-boilerplate docs, and records the
    config; other columns survive the rewrite."""
    docs = spark.createDataFrame(
        [
            (1, "unique alpha words\ncookie banner\nbody one text", "a"),
            (2, "cookie banner\nbody two text goes here", "a"),
            (3, "cookie banner\nbody three text present", "b"),
            (4, "cookie banner", "b"),
        ],
        ["doc_id", "text", "source"],
    )
    out, report = C.curate_corpus(
        docs, line_dedup_min_docs=3, exact_dedup=False, checkpoint=False
    )
    rows = {r["doc_id"]: (r["text"], r["source"]) for r in out.collect()}
    assert rows == {
        1: ("unique alpha words\nbody one text", "a"),
        2: ("body two text goes here", "a"),
        3: ("body three text present", "b"),
    }  # doc 4 was ONLY boilerplate -> dropped
    assert report["line_dedup"] == {"sep": "\n", "min_docs": 3}


def test_curate_chunk_dedup_stage(spark):
    """r15 (r14 VERDICT #5): the CDC chunk-level boilerplate stage. With
    min_size == max_size the chunker degenerates to fixed 32-char strides,
    so a 64-char banner prepended to half the docs is exactly chunks 0-1 of
    those docs: "cut" removes the banner and keeps the doc bodies intact
    (stride alignment preserved — the banner is a multiple of the chunk
    size); "drop" removes every bannered doc; a banner-only doc drops in
    both modes; other columns survive the rewrite; a bad mode raises."""
    banner = ("COOKIE NOTICE accept all terms " + "!" * 64)[:64]
    bodies = {
        i: f"body text for document {i} " * 4
        for i in range(1, 7)
    }
    rows = [
        (i, (banner + bodies[i]) if i % 2 == 0 else bodies[i], "s")
        for i in range(1, 7)
    ] + [(7, banner, "s")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out, report = C.curate_corpus(
        docs, chunk_dedup_min_docs=3, chunk_min_size=32, chunk_max_size=32,
        exact_dedup=False, checkpoint=False,
    )
    got = {r["doc_id"]: (r["text"], r["source"]) for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}  # banner-only doc 7 dropped
    for i in range(1, 7):
        assert got[i] == (bodies[i], "s"), i  # banner cut, body byte-intact
    assert report["chunk_dedup"]["mode"] == "cut"
    out2, _ = C.curate_corpus(
        docs, chunk_dedup_min_docs=3, chunk_min_size=32, chunk_max_size=32,
        chunk_dedup_mode="drop", exact_dedup=False, checkpoint=False,
    )
    assert {r["doc_id"] for r in out2.collect()} == {1, 3, 5}
    with pytest.raises(ValueError, match="chunk_dedup_mode"):
        C.curate_corpus(docs, chunk_dedup_min_docs=3, chunk_dedup_mode="zap")


def test_curate_redact_pii_stage(spark):
    """redact_pii scrubs BEFORE dedup, so two docs equal up to a PII value
    become exact duplicates and collapse; the per-tag count columns never
    leak into the chain schema."""
    from analyst_toolkit_spark.llm.curate import curate_corpus

    rows = [
        (1, "contact alice@example.com for the dataset terms today"),
        (2, "contact bob@example.org for the dataset terms today"),
        (3, "entirely different body with no personal data inside"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out, rep = curate_corpus(df, redact_pii=True, exact_dedup=True)
    assert rep["redact_pii"] == {"patterns": ["email", "phone", "url"]}
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1, 3}  # 2 deduped against 1 post-scrub (min id kept)
    assert "<EMAIL>" in got[1] and "alice" not in got[1]
    assert not any(c.startswith("n_") for c in out.columns)
    # disabled by default: all three survive, text untouched
    out2, rep2 = curate_corpus(df, exact_dedup=True)
    assert "redact_pii" not in rep2 and out2.count() == 3


def test_curate_epochs_and_shuffle_stages(spark, sf_dir):
    """r13 recipe-assembly tail: epochs after split (copies inherit the
    doc's split), seeded global shuffle, and packing walks the permuted
    order — deterministic end to end."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    out, report = C.curate_corpus(
        docs,
        exact_dedup=True,
        splits={"train": 0.9, "val": 0.1},
        epochs=1.5,
        shuffle_salt="run-a",
        pack_budget=256,
    )
    assert list(report) == [
        "input", "exact_dedup", "split", "epochs", "global_shuffle", "pack", "output",
    ]
    rows = out.collect()
    # epoch copies exist, every copy of a doc shares the doc's split
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_doc.values())
    assert {r["epoch"] for r in rows} == {0, 1}
    # shuffle_pos is a permutation of 0..N-1 over the expanded corpus
    pos = sorted(r["shuffle_pos"] for r in rows)
    assert pos == list(range(len(rows)))
    # packing walked the PERMUTED order per split: within a split,
    # ascending shuffle_pos must give non-decreasing cumulative tokens
    for split in ("train", "val"):
        sp = sorted((r for r in rows if r["split"] == split), key=lambda r: r["shuffle_pos"])
        cums = [r["_cum_tokens"] for r in sp]
        assert cums == sorted(cums)
        assert all(r["seq_id"].startswith(f"{split}/") for r in sp)
    # deterministic under re-run and input repartitioning
    out2, _ = C.curate_corpus(
        docs.repartition(7),
        exact_dedup=True,
        splits={"train": 0.9, "val": 0.1},
        epochs=1.5,
        shuffle_salt="run-a",
        pack_budget=256,
    )
    a = {(r["doc_id"], r["epoch"], r["split"], r["shuffle_pos"], r["seq_id"]) for r in rows}
    b = {(r["doc_id"], r["epoch"], r["split"], r["shuffle_pos"], r["seq_id"]) for r in out2.collect()}
    assert a == b
    # a different salt permutes differently but keeps the same survivor set
    out3, _ = C.curate_corpus(
        docs,
        exact_dedup=True,
        splits={"train": 0.9, "val": 0.1},
        epochs=1.5,
        shuffle_salt="run-b",
        pack_budget=256,
    )
    c = {(r["doc_id"], r["epoch"], r["split"], r["shuffle_pos"]) for r in out3.collect()}
    assert {x[:3] for x in a} == {x[:3] for x in c} and a != {x + ("",) for x in c}


def test_curate_epochs_dict_drops_unlisted_sources(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    out, report = C.curate_corpus(
        docs, epochs={"src0": 2.0, "src1": 1.0}, shuffle_salt=None,
    )
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert srcs == {"src0", "src1"}
    n0 = docs.filter("source = 'src0'").count()
    assert out.filter("source = 'src0'").count() == 2 * n0
