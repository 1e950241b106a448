"""Scale gating for all-pairs similarity operators: "auto" keeps the exact
quadratic baseline at test scale and routes to the bucketed (LSH) plan above
the size gate. Bucketed results must be a SUBSET of exact results with
identical scores (full precision, sub-1 recall)."""

import pytest

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.llm import scale as S
from analyst_toolkit_spark.llm.dedup import ngram_jaccard_pairs
from analyst_toolkit_spark.llm.similarity import cosine_pairs


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_pair_strategy_gates_on_size(docs, monkeypatch):
    assert S.pair_strategy(docs) == "exact"
    monkeypatch.setattr(S, "ALLPAIRS_THRESHOLD_BYTES", 0)
    assert S.pair_strategy(docs) == "bucketed"
    assert S.pair_strategy(docs, threshold_bytes=1 << 60) == "exact"


def test_cosine_pairs_auto_routes_to_lsh(embs, monkeypatch):
    exact = {(r["id_a"], r["id_b"]): r["cosine"] for r in cosine_pairs(embs, threshold=0.9).collect()}
    monkeypatch.setattr(S, "ALLPAIRS_THRESHOLD_BYTES", 0)
    lsh = {(r["id_a"], r["id_b"]): r["cosine"] for r in cosine_pairs(embs, threshold=0.9).collect()}
    assert set(lsh) <= set(exact)  # candidates only, never false pairs
    for k, v in lsh.items():
        assert v == exact[k]  # verified with the exact cosine


@pytest.mark.slow  # r16 tier split (default tier: the remaining pair_scale routing tests + ngram_jaccard slow oracle row)
def test_ngram_jaccard_auto_routes_to_minhash(docs, monkeypatch):
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    monkeypatch.setattr(S, "ALLPAIRS_THRESHOLD_BYTES", 0)
    banded = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert set(banded) <= set(exact)
    for k, v in banded.items():
        assert v == exact[k]
    # at this corpus's similarity levels the banding S-curve gives ~full recall
    assert len(banded) >= 0.9 * len(exact) if exact else True


def test_explicit_mode_overrides_gate(embs, monkeypatch):
    monkeypatch.setattr(S, "ALLPAIRS_THRESHOLD_BYTES", 0)
    # mode="exact" must ignore the gate entirely
    out = cosine_pairs(embs, threshold=0.95, mode="exact")
    assert "cosine" in out.columns
    out.count()


def test_pair_strategy_row_gate(spark):
    """Round-4 regression: bytes alone cannot gate O(n^2) work — a frame
    under the byte threshold but over the row cap must route to bucketed."""
    from analyst_toolkit_spark.llm import scale as S

    small = spark.range(100).selectExpr("id", "repeat('x', 10) as text")
    big_rows = spark.range(5000).selectExpr("id", "repeat('x', 10) as text")
    assert S.pair_strategy(small) == "exact"
    assert S.pair_strategy(big_rows) == "bucketed"  # tiny bytes, many rows
    # explicit cap override
    assert S.pair_strategy(small, max_exact_rows=10) == "bucketed"


def test_ensure_parallelism(spark):
    """Repartitions up only when the input has fewer partitions than slots;
    already-parallel inputs pass through untouched (the 100 TB case)."""
    from analyst_toolkit_spark.llm.scale import ensure_parallelism

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    widened = ensure_parallelism(narrow)
    assert widened.rdd.getNumPartitions() >= min(target, 2)

    wide = spark.range(100).repartition(target + 8)
    assert ensure_parallelism(wide) is wide  # no-op, same object
