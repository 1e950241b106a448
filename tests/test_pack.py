"""Sequence packing (llm/pack.py): distributed prefix sum exactness and
budget-packing semantics."""

import pytest
from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import load_table
from analyst_toolkit_spark.llm import pack as P


def test_global_cumsum_matches_single_node_and_is_partitioning_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    with_tokens = docs.withColumn("n", P.token_count("text").cast("long"))

    # single-node truth: pandas cumsum in doc_id order
    pdf = with_tokens.select("doc_id", "n").toPandas().sort_values("doc_id")
    truth = dict(zip(pdf["doc_id"], pdf["n"].cumsum()))

    for arranged in (with_tokens.repartition(7), with_tokens.coalesce(1), with_tokens.orderBy(F.desc("doc_id"))):
        got = {
            r["doc_id"]: r["c"]
            for r in P.with_global_cumsum(arranged, "n", "doc_id", out_col="c").collect()
        }
        assert got == truth


def test_pack_sequences_hand_example(spark):
    # budget 10; docs of 4,4,4 tokens: cum_before = 0,4,8 -> seqs 0,0,0
    # then a 9-token doc: cum_before=12 -> seq 1; a 1-token doc: cum 21 -> seq 2
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([4, 4, 4, 9, 1])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = P.pack_sequences(df, budget=10)
    seqs = {r["doc_id"]: r["seq_id"] for r in packed.collect()}
    assert seqs == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2}
    stats = P.pack_stats(packed, budget=10).first()
    assert stats["n_seqs"] == 3 and stats["total_docs"] == 5 and stats["total_tokens"] == 22
    assert stats["max_docs_per_seq"] == 3


def test_pack_deterministic_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["seq_id"] for r in P.pack_sequences(docs, 256).collect()}
    b = {r["doc_id"]: r["seq_id"] for r in P.pack_sequences(docs.repartition(13), 256).collect()}
    assert a == b and len(a) == docs.count()


def test_grouped_cumsum_resets_per_group(spark):
    # groups must get INDEPENDENT running sums (the split-aware packing path)
    rows = [(i, "g" + str(i % 3), (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "grp", "n"])
    got = {
        (r["grp"], r["id"]): r["c"]
        for r in P.with_global_cumsum(df.repartition(9), "n", "id", out_col="c", group_col="grp").collect()
    }
    truth: dict = {}
    running: dict = {}
    for i in range(200):  # ids ascend, so per-group order is id order
        g = "g" + str(i % 3)
        running[g] = running.get(g, 0) + (i % 7) + 1
        truth[(g, i)] = running[g]
    assert got == truth


def test_pack_split_col_never_mixes_splits(spark):
    # a packed sequence containing docs from >1 split would leak eval data
    # into training sequences — the exact contamination split_col prevents
    rows = [(i, " ".join(["w"] * ((i % 5) + 1))) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from analyst_toolkit_spark.llm.text import hash_split

    split_df = hash_split(df, id_col="doc_id")
    packed = P.pack_sequences(split_df, budget=16, split_col="split")
    mixed = (
        packed.groupBy("seq_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert mixed == 0
    # seq_ids are namespaced by split and every doc is assigned
    assert packed.filter(~F.col("seq_id").startswith(F.col("split"))).count() == 0
    assert packed.count() == 300
    # per-split assignment equals packing that split alone
    for label in ("train", "val", "test"):
        alone = {
            r["doc_id"]: r["seq_id"]
            for r in P.pack_sequences(split_df.filter(F.col("split") == label), budget=16).collect()
        }
        together = {
            r["doc_id"]: int(r["seq_id"].split("/")[1])
            for r in packed.filter(F.col("split") == label).collect()
        }
        assert together == {k: int(v) for k, v in alone.items()}


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile must equal SQL NTILE over the same total order — ties,
    uneven bands, n > rows, all of it — without any global-order window."""
    from pyspark.sql import Window

    from analyst_toolkit_spark.llm.pack import global_ntile

    rows = [(i, float((i * 37) % 11)) for i in range(257)]  # heavy ties
    df = spark.createDataFrame(rows, ["pk", "v"])
    for n in (2, 10, 300):
        got = {
            r["pk"]: r["ntile"]
            for r in global_ntile(df.repartition(13), n, ["v", "pk"]).collect()
        }
        w = Window.orderBy(F.col("v"), F.col("pk"))
        want = {r["pk"]: r["t"] for r in df.withColumn("t", F.ntile(n).over(w)).collect()}
        assert got == want, f"n={n}"
    # plan shape: no partitionBy-less window anywhere
    plan = global_ntile(df, 10, ["v", "pk"])._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window [" in line:
            assert "Exchange SinglePartition" not in "\n".join(lines[i + 1 : i + 4])


def test_length_buckets_and_padding_stats(spark):
    from analyst_toolkit_spark.llm import pack as P

    rows = [(1, "a b c"), (2, " ".join(["w"] * 40)), (3, " ".join(["w"] * 2000)), (4, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    b = P.length_buckets(df, boundaries=(4, 64))
    got = {r.doc_id: (r.n_tokens, r.bucket_cap) for r in b.collect()}
    # empty doc -> 0 tokens -> smallest bucket; oversize -> -1 overflow
    assert got == {1: (3, 4), 2: (40, 64), 3: (2000, -1), 4: (0, 4)}
    stats = {
        r.bucket_cap: (r.docs, r.tokens, r.padding, r.efficiency)
        for r in P.bucket_padding_stats(b).collect()
    }
    assert stats[4] == (2, 3, 5, 0.375)        # caps 4+4=8 slots, 3 used
    assert stats[64] == (1, 40, 24, 0.625)
    assert stats[-1] == (1, 2000, 0, None)     # overflow: no padding story


def test_grouped_ntile_matches_sql_ntile(spark):
    """grouped_ntile == ntile(n) OVER (PARTITION BY g ORDER BY v, pk) for
    every group shape: skewed big group, group smaller than n (each row its
    own band), exact-multiple group."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from analyst_toolkit_spark.llm.pack import grouped_ntile

    rows = (
        [("big", i, float(i % 7)) for i in range(23)]
        + [("tiny", 100 + i, float(i)) for i in range(2)]
        + [("even", 200 + i, float(i % 3)) for i in range(12)]
    )
    df = spark.createDataFrame(rows, ["g", "pk", "v"])
    got = {
        (r["g"], r["pk"]): r["band"]
        for r in grouped_ntile(df, 4, ["v", "pk"], "g", out_col="band").collect()
    }
    w = Window.partitionBy("g").orderBy("v", "pk")
    want = {
        (r["g"], r["pk"]): r["band"]
        for r in df.withColumn("band", F.ntile(4).over(w)).collect()
    }
    assert got == want


def test_grouped_topk_matches_sql_window(spark):
    """grouped_topk == row_number() OVER (PARTITION BY g ORDER BY v DESC,
    pk DESC) <= k across group shapes (skewed, smaller-than-k, ties in v),
    under a forced multi-partition layout so the per-partition phase runs."""
    from pyspark.sql.window import Window

    rows = (
        [("big", i, float(i % 7)) for i in range(23)]
        + [("tiny", 100 + i, float(i)) for i in range(2)]
        + [("ties", 200 + i, 1.0) for i in range(6)]
    )
    df = spark.createDataFrame(rows, ["g", "pk", "v"]).repartition(8)
    got = {
        (r["g"], r["rank"]): (r["pk"], r["v"])
        for r in P.grouped_topk(df, 3, ["v", "pk"], "g").collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.desc("pk"))
    want = {
        (r["g"], r["rn"]): (r["pk"], r["v"])
        for r in df.withColumn("rn", F.row_number().over(w)).filter("rn <= 3").collect()
    }
    assert got == want
    assert len({g for g, _ in got}) == 3 and ("tiny", 2) in got and ("tiny", 3) not in got


def test_grouped_topk_map_payload(spark):
    """r11 VERDICT nit: the payload no longer rides sort_array, so
    non-orderable payload types (map columns) work — ranking is on
    (order keys) only and the payload joins back by the unique key tuple."""
    rows = [("g1", i, float(i), {"k": str(i)}) for i in range(7)] + [
        ("g2", 100 + i, 5.0, {"k": "tie"}) for i in range(4)
    ]
    df = spark.createDataFrame(rows, ["g", "pk", "v", "m"]).repartition(5)
    got = P.grouped_topk(df, 2, ["v", "pk"], "g").collect()
    by_rank = {(r["g"], r["rank"]): (r["pk"], r["m"]) for r in got}
    assert by_rank[("g1", 1)] == (6, {"k": "6"})
    assert by_rank[("g1", 2)] == (5, {"k": "5"})
    # ties in v break descending on pk
    assert by_rank[("g2", 1)] == (103, {"k": "tie"})
    assert by_rank[("g2", 2)] == (102, {"k": "tie"})
    assert len(got) == 4


# -- training-shard export (r12) -----------------------------------------------


def test_shard_assign_balanced(spark):
    """Token-balanced contiguous shards: in id order, every shard's token
    mass lands within one document of the ideal total/n, the assignment is
    partitioning-independent, and an all-empty corpus degrades to shard 0."""
    from analyst_toolkit_spark.llm import pack as P

    rows = [(i, "tok " * (i % 7 + 1)) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = P.shard_assign(df, 5).collect()
    got = {r["doc_id"]: r["shard"] for r in out}
    # contiguous in id order
    ordered = [got[i] for i in range(60)]
    assert ordered == sorted(ordered)
    assert set(ordered) == set(range(5))
    # balance: every shard within max-doc-tokens of ideal
    toks = {r["doc_id"]: r["n_tokens"] for r in out}
    total = sum(toks.values())
    per = {}
    for i, s in got.items():
        per[s] = per.get(s, 0) + toks[i]
    ideal = total / 5
    assert all(abs(v - ideal) <= max(toks.values()) for v in per.values()), per
    # partitioning invariance
    got2 = {
        r["doc_id"]: r["shard"]
        for r in P.shard_assign(df.repartition(7), 5).collect()
    }
    assert got2 == got
    # zero-token corpus
    empty = spark.createDataFrame([(1, ""), (2, "")], ["doc_id", "text"])
    assert {r["shard"] for r in P.shard_assign(empty, 3).collect()} == {0}
    with pytest.raises(ValueError, match="n_shards"):
        P.shard_assign(df, 0)
    with pytest.raises(ValueError, match="shard mode"):
        P.shard_assign(df, 2, mode="typo")


def test_shard_assign_hash_stable(spark):
    """Hash mode: a document keeps its shard when the corpus grows — the
    incremental-build contract balanced mode can't give."""
    from analyst_toolkit_spark.llm import pack as P

    small = spark.createDataFrame([(i, "x y z") for i in range(30)], ["doc_id", "text"])
    big = spark.createDataFrame([(i, "x y z") for i in range(90)], ["doc_id", "text"])
    a = {r["doc_id"]: r["shard"] for r in P.shard_assign(small, 4, mode="hash").collect()}
    b = {r["doc_id"]: r["shard"] for r in P.shard_assign(big, 4, mode="hash").collect()}
    assert all(b[i] == a[i] for i in a)
    assert set(b.values()) <= set(range(4))


def test_write_training_shards_roundtrip(spark, tmp_path):
    """The materialized layout: one file per shard=K dir, rows sorted by id
    within each shard, manifest at _manifest equals a recompute, and the
    manifest content fingerprint reproduces from python md5."""
    import hashlib
    import os

    from analyst_toolkit_spark.llm import pack as P

    rows = [(i, "tok " * (i % 5 + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    path = str(tmp_path / "shards")
    man = {r["shard"]: r for r in P.write_training_shards(df, path, 4).collect()}
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(4)]
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)  # one task wrote each shard
    back = spark.read.parquet(path)
    assert back.count() == 40
    # in-shard deterministic order (file row order == id order)
    import pandas as pd  # noqa: F401

    one = spark.read.parquet(os.path.join(path, "shard=0")).toPandas()
    assert list(one["doc_id"]) == sorted(one["doc_id"])
    # manifest parquet equals returned manifest; fingerprint reproduces
    stored = {r["shard"]: r for r in spark.read.parquet(path + "/_manifest").collect()}
    assert stored.keys() == man.keys()
    for k, r in man.items():
        assert (r["n_docs"], r["n_tokens"], r["content_fp"]) == (
            stored[k]["n_docs"], stored[k]["n_tokens"], stored[k]["content_fp"]
        )
    grouped = back.groupBy("shard").count().collect()
    assert {r["shard"]: r["count"] for r in grouped} == {
        k: r["n_docs"] for k, r in man.items()
    }
    ids_by_shard = {
        r["shard"]: r["ids"]
        for r in back.groupBy("shard").agg(F.collect_list("doc_id").alias("ids")).collect()
    }
    for k, r in man.items():
        want_fp = 0
        for i in ids_by_shard[k]:
            want_fp ^= int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        assert r["content_fp"] == want_fp, k


def test_shard_manifest_fingerprint_no_overflow(spark):
    """r12 VERDICT #1: the old 48-bit-term SUM fingerprint overflowed a long
    past ~2^15 docs per shard and would THROW under Spark 4 ANSI — exactly
    the operator whose contract is 100 TB shard export. The bit_xor
    fingerprint must survive >32768 docs in ONE shard under ANSI and still
    reproduce from python md5 (order-free)."""
    import hashlib

    from analyst_toolkit_spark.llm import pack as P

    n = 40_000  # > 2^15, the old sum's overflow bound
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("n_tokens"), F.lit(0).alias("shard")
    )
    ansi_before = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        row = P.shard_manifest(df).collect()
        assert len(row) == 1 and row[0]["n_docs"] == n
        want = 0
        for i in range(n):
            want ^= int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        assert row[0]["content_fp"] == want
    finally:
        if ansi_before is not None:
            spark.conf.set("spark.sql.ansi.enabled", ansi_before)


def test_shard_assign_null_text_clamped(spark):
    """ADVICE r12: NULL text must not produce a negative/NULL token count —
    no shard=-1, no null shard; the doc lands in a real shard with
    n_tokens=0."""
    from analyst_toolkit_spark.llm import pack as P

    rows = [(0, None), (1, "a b c"), (2, None), (3, "d e")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = P.shard_assign(df, 2).collect()
    assert all(r["shard"] is not None and 0 <= r["shard"] <= 1 for r in out)
    toks = {r["doc_id"]: r["n_tokens"] for r in out}
    assert toks[0] == 0 and toks[2] == 0 and toks[1] == 3 and toks[3] == 2
    hashed = P.shard_assign(df, 2, mode="hash").collect()
    assert all(r["n_tokens"] >= 0 and 0 <= r["shard"] <= 1 for r in hashed)


def test_global_shuffle_is_permutation_and_partitioning_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    out = P.global_shuffle(docs, salt="run1")
    pos = [r["shuffle_pos"] for r in out.select("shuffle_pos").collect()]
    assert sorted(pos) == list(range(n))  # exact permutation of 0..N-1
    # deterministic + independent of input partitioning
    a = {r["doc_id"]: r["shuffle_pos"] for r in out.collect()}
    b = {
        r["doc_id"]: r["shuffle_pos"]
        for r in P.global_shuffle(docs.repartition(7), salt="run1").collect()
    }
    assert a == b
    # a different salt draws a genuinely different permutation
    c = {r["doc_id"]: r["shuffle_pos"] for r in P.global_shuffle(docs, salt="run2").collect()}
    assert a != c and sorted(c.values()) == list(range(n))


def test_global_shuffle_matches_single_node_md5_order(spark):
    import hashlib

    rows = [(i, f"doc {i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["shuffle_pos"] for r in P.global_shuffle(df, salt="s").collect()}
    order = sorted(range(50), key=lambda i: (hashlib.md5(f"{i}|s".encode()).hexdigest(), i))
    truth = {doc: pos for pos, doc in enumerate(order)}
    assert got == truth
