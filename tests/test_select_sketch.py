"""Unit tests for the late-r8 selection/sketch operators: DSIR importance
weights (llm/select), KMV bottom-k sketches (llm/sketch), and SemDeDup-style
semantic dedup (llm/similarity.semantic_dedup) — each against an independent
pure-Python ground truth, not just the DuckDB oracle."""

import hashlib
import math
import random
import re

import pytest
from pyspark.sql import functions as F

from analyst_toolkit_spark.llm import select as SEL
from analyst_toolkit_spark.llm import similarity as SIM
from analyst_toolkit_spark.llm import sketch as SK

# ---------------------------------------------------------------------------
# pure-Python mirrors of the engine-portable arithmetic


def _tokens(text):
    return re.findall(r"[a-z0-9']+", text.lower())


def _bucket(tok, b):
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % b


def _py_dsir(raw, target, b=64, a=0.5):
    """raw/target: list[(id, text)] -> {id: (n_tokens, log_weight)}"""
    rb, tb = {}, {}
    docb = {}
    for i, t in raw:
        d = docb.setdefault(i, {})
        for tok in _tokens(t):
            k = _bucket(tok, b)
            rb[k] = rb.get(k, 0) + 1
            d[k] = d.get(k, 0) + 1
    for _, t in target:
        for tok in _tokens(t):
            k = _bucket(tok, b)
            tb[k] = tb.get(k, 0) + 1
    R, T = sum(rb.values()), sum(tb.values())
    out = {}
    for i, _ in raw:
        n = sum(docb[i].values())
        lw = sum(
            c
            * (
                math.log((tb.get(k, 0) + a) / (T + a * b))
                - math.log((rb[k] + a) / (R + a * b))
            )
            for k, c in docb[i].items()
        )
        out[i] = (n, round(lw, 6))
    return out


@pytest.fixture(scope="module")
def pool(spark):
    rows = [
        (1, "good clean prose about careful analysis and clear writing"),
        (2, "good clean prose about careful analysis and clear writing"),
        (3, "spam spam buy now 123 456 click click spam buy"),
        (4, "careful analysis of clean prose with clear good writing style"),
        (5, ""),
        (6, "buy 999 click spam now buy spam click 777"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dsir_matches_python_ground_truth(spark, pool):
    target = pool.filter(F.col("doc_id").isin(1, 4))
    out = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"], r["selected"])
        for r in SEL.dsir_logweights(pool, target, buckets=64).collect()
    }
    raw = [(r["doc_id"], r["text"]) for r in pool.collect()]
    tgt = [(i, t) for i, t in raw if i in (1, 4)]
    exp = _py_dsir(raw, tgt, b=64)
    assert set(out) == set(exp)
    for i, (n, lw) in exp.items():
        assert out[i][0] == n
        assert out[i][1] == pytest.approx(lw, abs=2e-6)
        assert out[i][2] == (out[i][1] > 0)


def test_dsir_separates_target_like_from_spam(spark, pool):
    # alpha=0.1: on a 6-doc corpus the default 0.5 smoothing mass (alpha*B
    # = 32 pseudo-counts vs ~20 real target tokens) drowns the signal and
    # pulls even exact target copies under the 0 break-even; at corpus
    # scale the smoothing mass is negligible relative to the totals
    target = pool.filter(F.col("doc_id").isin(1, 4))
    out = {
        r["doc_id"]: r
        for r in SEL.dsir_logweights(pool, target, buckets=64, alpha=0.1).collect()
    }
    # target-like docs score above the spam docs, and the spam is rejected
    assert out[2]["log_weight"] > out[3]["log_weight"]
    assert out[2]["selected"] and out[4]["selected"]
    assert not out[3]["selected"] and not out[6]["selected"]


def test_dsir_empty_doc_kept_with_zero_weight(spark, pool):
    target = pool.filter(F.col("doc_id") == 1)
    row = [
        r for r in SEL.dsir_logweights(pool, target, buckets=64).collect() if r["doc_id"] == 5
    ][0]
    assert row["n_tokens"] == 0
    assert row["log_weight"] == 0.0
    assert not row["selected"]


def test_dsir_select_filters_and_keeps_columns(spark, pool):
    target = pool.filter(F.col("doc_id").isin(1, 4))
    sel = SEL.dsir_select(pool, target, buckets=64)
    w = SEL.dsir_logweights(pool, target, buckets=64)
    kept = {r["doc_id"] for r in sel.collect()}
    assert kept == {r["doc_id"] for r in w.collect() if r["selected"]}
    assert set(sel.columns) == {"doc_id", "text", "log_weight"}


# ---------------------------------------------------------------------------
# KMV


def _py_shingles(text, n=3):
    t = _tokens(text)
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def _py_sketch(texts, k, n=3):
    hs = set()
    for t in texts:
        hs |= {hashlib.md5(s.encode()).hexdigest() for s in _py_shingles(t, n)}
    return sorted(hs)[:k]


@pytest.fixture(scope="module")
def grouped(spark):
    rng = random.Random(7)
    words = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(60):
        src = f"s{i % 3}"
        # s0 and s1 share half their vocabulary slice; s2 is disjoint
        lo = 0 if src in ("s0", "s1") else 20
        text = " ".join(rng.choice(words[lo : lo + 20]) for _ in range(25))
        rows.append((i, src, text))
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_kmv_sketch_equals_naive_bottom_k(spark, grouped):
    k = 16
    sk = SK.kmv_sketch(grouped, group_col="source", k=k)
    got = {}
    for r in sk.collect():
        got.setdefault(r["source"], []).append((r["rank"], r["h"]))
    rows = grouped.collect()
    for src in ("s0", "s1", "s2"):
        texts = [r["text"] for r in rows if r["source"] == src]
        exp = _py_sketch(texts, k)
        assert [h for _, h in sorted(got[src])] == exp
        assert [rk for rk, _ in sorted(got[src])] == list(range(1, len(exp) + 1))


def test_kmv_small_group_is_exhaustive_and_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", "one two three four five six"), (2, "b", "seven eight nine ten eleven twelve")],
        ["doc_id", "source", "text"],
    )
    k = 100
    sk = SK.kmv_sketch(df, group_col="source", k=k)
    est = {r["source"]: r for r in SK.kmv_distinct_estimate(sk, k).collect()}
    # 6 tokens -> 4 distinct 3-gram shingles per doc, far below k
    for s in ("a", "b"):
        assert est[s]["sketch_size"] == 4
        assert est[s]["est_distinct"] == 4.0


def test_kmv_distinct_estimator_formula(spark, grouped):
    k = 16
    sk = SK.kmv_sketch(grouped, group_col="source", k=k)
    est = {r["source"]: r["est_distinct"] for r in SK.kmv_distinct_estimate(sk, k).collect()}
    rows = grouped.collect()
    for src in ("s0", "s1", "s2"):
        texts = [r["text"] for r in rows if r["source"] == src]
        sketch = _py_sketch(texts, k)
        if len(sketch) < k:
            exp = float(len(sketch))
        else:
            uk = int(sketch[k - 1][:12], 16) / 16**12
            exp = (k - 1) / uk
        assert est[src] == pytest.approx(round(exp, 6), abs=1e-6)


def test_kmv_overlap_ground_truth_and_bounds(spark, grouped):
    k = 16
    sk = SK.kmv_sketch(grouped, group_col="source", k=k)
    ov = {(r["group_a"], r["group_b"]): r for r in SK.kmv_overlap(sk, k).collect()}
    assert set(ov) == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}
    rows = grouped.collect()
    sketches = {
        src: set(_py_sketch([r["text"] for r in rows if r["source"] == src], k))
        for src in ("s0", "s1", "s2")
    }
    for (a, b), r in ov.items():
        merged = sorted(sketches[a] | sketches[b])[:k]
        shared = sum(1 for h in merged if h in sketches[a] and h in sketches[b])
        assert r["merged_k"] == len(merged) <= k
        assert r["shared"] == shared <= r["merged_k"]
        assert r["kmv_jaccard"] == pytest.approx(round(shared / len(merged), 6))
    # shared vocabulary pair overlaps; the disjoint-vocab pairs cannot
    assert ov[("s0", "s1")]["kmv_jaccard"] > 0
    assert ov[("s0", "s2")]["kmv_jaccard"] == 0.0
    assert ov[("s1", "s2")]["kmv_jaccard"] == 0.0


def test_kmv_identical_groups_estimate_jaccard_one(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, "x", text), (2, "y", text)], ["doc_id", "source", "text"]
    )
    sk = SK.kmv_sketch(df, group_col="source", k=8)
    [r] = SK.kmv_overlap(sk, 8).collect()
    assert r["kmv_jaccard"] == 1.0


# ---------------------------------------------------------------------------
# semantic dedup


@pytest.fixture(scope="module")
def vecs(spark):
    rng = random.Random(11)
    rows = []
    # three tight families of near-identical vectors + isolated singletons
    for fam in range(3):
        base = [rng.gauss(0, 1) for _ in range(8)]
        for j in range(3):
            rows.append(
                (fam * 10 + j, [x + rng.gauss(0, 0.01) for x in base])
            )
    for i in range(3):
        rows.append((100 + i, [rng.gauss(0, 1) for _ in range(8)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semantic_dedup_one_rep_per_component(spark, vecs):
    out = SIM.semantic_dedup(vecs, 8, n_planes=4, threshold=0.95)
    agg = out.groupBy("component").agg(
        F.sum(F.col("is_rep").cast("int")).alias("reps"),
        F.min("vec_id").alias("mn"),
    )
    for r in agg.collect():
        assert r["reps"] == 1
        assert r["mn"] == r["component"]


def test_semantic_dedup_collapses_families(spark, vecs):
    out = {r["vec_id"]: r for r in SIM.semantic_dedup(vecs, 8, n_planes=4, threshold=0.95).collect()}
    # every family member that shares an LSH bucket with its family head
    # joins that component; pairs from the operator itself define the truth
    pairs = SIM.lsh_bucketed_pairs(vecs, 8, n_planes=4, threshold=0.95).collect()
    assert pairs, "fixture must produce at least one near pair"
    for p in pairs:
        assert out[p["id_a"]]["component"] == out[p["id_b"]]["component"]
    # vectors that appear in no pair are singleton reps of themselves
    paired = {p["id_a"] for p in pairs} | {p["id_b"] for p in pairs}
    for vid, r in out.items():
        if vid not in paired:
            assert r["component"] == vid and r["is_rep"]
    # dedup keeps exactly one row per component
    reps = [r for r in out.values() if r["is_rep"]]
    assert len(reps) == len({r["component"] for r in out.values()})
