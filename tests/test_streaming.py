import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from analyst_toolkit_spark.operators.validation import ValidationConfig
from analyst_toolkit_spark.streaming.rules import (
    foreach_batch_runner,
    validate_stream,
    windowed_profile,
)


@pytest.fixture()
def stream_dir(spark, sf_dir):
    """Stage the events table as a file-source stream (one parquet = one batch)."""
    d = tempfile.mkdtemp(prefix="stream_src_")
    src = os.path.join(sf_dir, "events.parquet")
    # rewrite through spark so the schema matches the converted µs timestamps
    from analyst_toolkit_spark.ingest import load_table

    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_validate_stream_flags(spark, stream_dir):
    static = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    cfg = ValidationConfig(
        categorical_values={"event_type": ["click", "view", "purchase"]},
        numeric_ranges={"value": {"min": 0, "max": 1000}},
    )
    flagged = validate_stream(stream, cfg)
    assert flagged.isStreaming

    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    collected = []

    def sink(batch_df, batch_id):
        collected.append(batch_df.agg(F.sum(F.col("any_violation").cast("long"))).collect()[0][0])

    q = foreach_batch_runner(flagged, sink, ckpt)
    q.awaitTermination(120)
    assert collected, "stream produced no batches"

    # must equal the batch engine's answer on the same data
    from analyst_toolkit_spark.operators.validation import violating_rows

    expected = violating_rows(static, cfg).count()
    assert sum(c or 0 for c in collected) == expected
    shutil.rmtree(ckpt, ignore_errors=True)


def test_windowed_profile(spark, stream_dir):
    static = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    prof = windowed_profile(stream, ts_col="ts", window="1 day", watermark="2 days")

    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    out: list = []

    def sink(batch_df, batch_id):
        out.extend(batch_df.collect())

    q = prof.writeStream.foreachBatch(sink).outputMode("update").option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    assert out
    total_rows = sum(r["rows"] for r in out)
    assert total_rows == static.count()
    # spot-check one window against the batch engine
    day = out[0]["window_start"]
    batch_mean = (
        static.filter((F.col("ts") >= F.lit(day)) & (F.col("ts") < F.date_add(F.lit(day), 1)))
        .agg(F.round(F.avg("value"), 6))
        .collect()[0][0]
    )
    assert out[0]["mean"] == pytest.approx(batch_mean, abs=1e-6)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_asof_enrichment_foreach_batch(spark, stream_dir, sf_dir):
    """Batch operators compose with streams (SURVEY §2.9 posture): each
    micro-batch of purchases is as-of enriched against the static view table
    via operators/joins.asof_join inside foreachBatch — the stream-side reuse
    path for the temporal join."""
    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.operators.joins import asof_join

    static_views = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'view'")
        .select("user_id", "ts", F.col("value").alias("view_value"))
    )
    schema = spark.read.parquet(stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    purchases = stream.filter("event_type = 'purchase'").select(
        "user_id", "ts", "event_id", "value"
    )

    got = []

    def sink(batch_df, batch_id):
        got.append(asof_join(batch_df, static_views, on="ts", by="user_id").collect())

    q = (
        purchases.writeStream.foreachBatch(sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_asof_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [r for b in got for r in b]
    assert len(rows) > 0
    # every enriched row's matched view precedes (or equals) the purchase ts
    enriched = [r for r in rows if r["view_value"] is not None]
    assert enriched  # the events table always has earlier views for some user
    # spot-check correctness against the batch-side as-of on the same data
    from analyst_toolkit_spark.operators.joins import asof_join as aj

    batch_purchases = (
        spark.read.parquet(stream_dir)
        .filter("event_type = 'purchase'")
        .select("user_id", "ts", "event_id", "value")
    )
    expect = {
        r["event_id"]: r["view_value"]
        for r in aj(batch_purchases, static_views, on="ts", by="user_id").collect()
    }
    got_map = {r["event_id"]: r["view_value"] for r in rows}
    assert got_map == expect


def test_streaming_quality_gates_match_batch(spark, sf_dir):
    """Online corpus filtering on a document STREAM: the pinned-weight
    classifier margin applies directly (stateless projection, append mode);
    the char-LM score, whose plan ends in a per-doc aggregation, applies per
    micro-batch inside foreachBatch against the statically trained model.
    Both must agree doc-for-doc with the batch engine."""
    import tempfile

    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import classify as C
    from analyst_toolkit_spark.llm import lm as L
    from analyst_toolkit_spark.streaming.rules import foreach_batch_runner

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tempfile.mkdtemp(prefix="doc_stream_")
    docs.write.mode("overwrite").parquet(src)

    model = L.train_char_lm(docs).localCheckpoint(eager=True)  # static side
    w = [1.0, -0.5, -2.0, -3.0, 0.5, 0.25]  # arbitrary pinned weights

    stream = spark.readStream.schema(docs.schema).parquet(src)
    # classifier margin is a stateless projection -> applies to the stream
    # DIRECTLY (append mode); the LM score ends in a per-doc aggregation, so
    # its streaming form runs INSIDE foreachBatch per micro-batch (file
    # sources deliver whole docs per batch) — the same micro-batch pattern
    # as llm/incremental's near-probe twin.
    gated = C.score_logreg(
        stream.select("doc_id", C.quality_features("text").alias("features")),
        w,
        prob_col=None,
    )
    assert gated.isStreaming

    got_lm, got_clf = {}, {}
    ck1, ck2 = tempfile.mkdtemp(prefix="ckpt_"), tempfile.mkdtemp(prefix="ckpt_")
    q1 = foreach_batch_runner(
        stream,
        lambda b, _i: got_lm.update(
            {r.doc_id: r.mean_prob for r in L.charlm_score(b, model).collect()}
        ),
        ck1,
    )
    q2 = foreach_batch_runner(
        gated, lambda b, _i: got_clf.update({r.doc_id: r.margin for r in b.collect()}), ck2
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    batch_lm = {r.doc_id: r.mean_prob for r in L.charlm_score(docs, model).collect()}
    batch_clf = {
        r.doc_id: r.margin
        for r in C.score_logreg(
            docs.select("doc_id", C.quality_features("text").alias("features")), w, prob_col=None
        ).collect()
    }
    assert got_lm == batch_lm and len(got_lm) > 0
    assert got_clf == batch_clf and len(got_clf) == docs.count()

    import shutil

    for d in (src, ck1, ck2):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_semantic_decontaminate_matches_batch(spark, sf_dir):
    """The r12 semantic decontamination scan applies to a document stream
    UNMODIFIED: the benchmark rides the plan as a literal and the operator
    is a stateless projection (zero shuffle, zero state), so the same call
    that filters a 100 TB batch corpus gates an arriving stream in append
    mode — no foreachBatch needed. Every (max_bench_cosine, contaminated)
    pair must agree row-for-row with the batch engine."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from analyst_toolkit_spark.ingest import load_table
    from analyst_toolkit_spark.llm import similarity as S
    from analyst_toolkit_spark.streaming.rules import foreach_batch_runner

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    bench = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    src = tempfile.mkdtemp(prefix="decon_stream_")
    ck = tempfile.mkdtemp(prefix="ckpt_")
    corpus.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(corpus.schema).parquet(src)
    flagged = S.semantic_decontaminate(stream, bench, threshold=0.999)
    assert flagged.isStreaming  # applied directly — stateless, append-safe

    got: dict = {}
    q = foreach_batch_runner(
        flagged,
        lambda b, _i: got.update(
            {r.vec_id: (r.max_bench_cosine, r.contaminated) for r in b.collect()}
        ),
        ck,
    )
    q.awaitTermination(120)

    want = {
        r.vec_id: (r.max_bench_cosine, r.contaminated)
        for r in S.semantic_decontaminate(corpus, bench, threshold=0.999).collect()
    }
    assert got == want and len(got) == corpus.count()

    for d in (src, ck):
        shutil.rmtree(d, ignore_errors=True)
