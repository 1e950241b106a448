"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: exact baseline. Dot products via F.zip_with +
  F.aggregate — JVM expressions, vectorized by codegen, no Python.
- LSH-bucketed ANN (random hyperplanes): the scale path. Sign bits of r random
  projections → bucket key; only same-bucket vectors are compared, turning the
  O(N) scan per query into a bucket lookup. Multi-probe = union over tables.

At 100 TB the corpus side stays partitioned by bucket; queries broadcast.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_lit(col: Column, vec: list[float]) -> Column:
    """Dot product between an array column and a literal query vector.
    Elements cast to double BEFORE multiply: float32 math would diverge from
    any double-precision oracle."""
    lit_vec = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(col, lit_vec, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_cols(a: Column, b: Column) -> Column:
    """Dot product of two array columns in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(col: Column) -> Column:
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_lit(col: Column, vec: list[float]) -> Column:
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0
    return dot_lit(col, vec) / (norm(col) * F.lit(qn))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    One map-only pass + a global top-k (Spark's TakeOrdered — no full sort
    shuffle). Deterministic tie-break on id."""
    return (
        df.select(F.col(id_col), F.round(cosine_lit(F.col(vec_col), query_vec), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    mode: str = "auto",
) -> DataFrame:
    """Cosine >= threshold near-pair detection (embedding near-dup).

    ``mode="exact"`` is the brute-force all-pairs self-join — O(n²), the
    correct baseline while the input is small. ``mode="lsh"`` routes to
    :func:`lsh_bucketed_pairs` (hyperplane buckets, exact cosine verified on
    candidates — full precision, sub-1 recall). ``mode="auto"`` (default)
    picks by input size via :func:`analyst_toolkit_spark.llm.scale.pair_strategy`,
    so the operator keeps exact semantics at test scale and survives 100 TB.
    """
    if mode == "auto":
        from analyst_toolkit_spark.llm.scale import pair_strategy

        mode = "exact" if pair_strategy(df) == "exact" else "lsh"
    if mode == "lsh":
        dim = df.select(F.size(F.col(vec_col)).alias("d")).filter(F.col("d") > 0).first()
        return lsh_bucketed_pairs(
            df, dim=int(dim["d"]) if dim else 0, vec_col=vec_col, id_col=id_col, threshold=threshold
        )
    d = df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
    )
    a, b = d.alias("a"), d.alias("b")
    dot = dot_cols(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("cosine", F.round(dot / (F.col("a.n") * F.col("b.n")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"), "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_bucket(col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane packed to a long."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(dot_lit(col, p) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_bucketed_pairs(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    threshold: float = 0.9,
    seed: int = 42,
) -> DataFrame:
    """ANN near-pair search: compare only vectors sharing a hyperplane bucket.
    Recall grows with fewer planes / multiple tables; this single-table variant
    is the building block."""
    planes = _hyperplanes(dim, n_planes, seed)
    d = df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a, b = d.alias("a"), d.alias("b")
    dot = dot_cols(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("cosine", F.round(dot / (F.col("a.n") * F.col("b.n")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"), "cosine")
    )


def ivf_build(
    df: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 16,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 8,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF (inverted-file) index: k-means coarse quantizer + cluster
    assignment column.

    Returns (df + ``__ivf_cluster``, centroid list). At scale: train on a
    sample (``sample_fraction``), assignment is a map-only pass, and the
    assigned table should be WRITTEN partitioned by cluster
    (``.write.partitionBy('__ivf_cluster')``) so a probe reads only
    nprobe/nlist of the data — that is the IVF win on 100 TB of vectors.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    train = df.sample(False, sample_fraction, seed=seed) if sample_fraction else df
    # a coarse quantizer doesn't need convergence — a few Lloyd iterations
    # give the same recall at a fraction of the training jobs
    km = KMeans(k=nlist, seed=seed, maxIter=max_iter, featuresCol="__vec", predictionCol="__ivf_cluster")
    model = km.fit(train.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("__vec")))
    assigned = (
        model.transform(df.withColumn("__vec", array_to_vector(F.col(vec_col).cast("array<double>"))))
        .drop("__vec")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k through the IVF index: rank centroids against the query on
    the driver (nlist dot products), then run exact cosine top-k over only the
    ``nprobe`` nearest clusters. The cluster filter is a pushdown-able
    predicate — on a cluster-partitioned layout it prunes whole partitions."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def _cos(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(c, query_vec)) / (cn * qn)

    probes = sorted(range(len(centroids)), key=lambda i: -_cos(centroids[i]))[:nprobe]
    return cosine_topk(
        assigned.filter(F.col("__ivf_cluster").isin(probes)), query_vec, k, vec_col, id_col
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    q_id: str = "vec_id",
    c_id: str = "vec_id",
) -> DataFrame:
    """Top-k corpus neighbors for every query row (exact brute force).

    The CORPUS is the streamed/probe side and the QUERIES are broadcast: a knn
    join's corpus is the 100 TB side (every executor scans its own corpus
    partitions against the small in-memory query set), so the corpus must
    never be the broadcast/build relation — that is an executor OOM at scale.
    The per-query top-k is a window over (query_id); its shuffle carries
    |Q|x|C| scored rows, which is inherent to the exact algorithm — for large
    corpora use ivf_topk / lsh_bucketed_pairs, the bounded-candidate paths.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("qv"), norm(F.col(vec_col)).alias("qn"))
    c = corpus.select(F.col(c_id).alias("corpus_id"), F.col(vec_col).alias("cv"), norm(F.col(vec_col)).alias("cn"))
    dot = dot_cols(F.col("qv"), F.col("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine", F.round(dot / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def ivf_write(
    assigned: DataFrame,
    centroids: list[list[float]],
    path: str,
    cluster_col: str = "__ivf_cluster",
) -> None:
    """Persist an IVF index as a cluster-partitioned parquet layout plus a
    centroid sidecar. THIS is the IVF win at 100 TB: the probe's cluster
    filter becomes directory-level partition pruning — a nprobe/nlist probe
    reads only that fraction of the files, no footer even opened elsewhere
    (asserted by plan in tests/test_llm.py).

    Layout: ``{path}/vectors/`` partitioned by the cluster id;
    ``{path}/centroids.json`` holds the quantizer (tiny, driver-written).
    """
    import json
    import os

    assigned.write.mode("overwrite").partitionBy(cluster_col).parquet(
        os.path.join(path, "vectors")
    )
    with open(os.path.join(path, "centroids.json"), "w") as fh:
        json.dump(centroids, fh)


def ivf_probe(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "__ivf_cluster",
) -> DataFrame:
    """Top-k probe against a persisted IVF index (:func:`ivf_write` layout):
    rank centroids driver-side (nlist dot products), scan ONLY the nprobe
    nearest partitions via partition pruning, exact cosine re-rank inside.
    """
    import json
    import math
    import os

    with open(os.path.join(path, "centroids.json")) as fh:
        centroids = json.load(fh)
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def _cos(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(c, query_vec)) / (cn * qn)

    probes = sorted(range(len(centroids)), key=lambda i: -_cos(centroids[i]))[:nprobe]
    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    pruned = vectors.filter(F.col(cluster_col).isin(probes))
    return cosine_topk(pruned, query_vec, k, vec_col, id_col)
