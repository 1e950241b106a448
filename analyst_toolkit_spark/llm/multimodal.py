"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery here is REAL and tested: schema contracts, Arrow-
batched ``mapInPandas`` pipelines, partition sizing for large blobs. The codec
step itself (PIL/librosa/ffmpeg) is NOT available in this environment, so the
decoders are stubbed behind ``DecoderUnavailable`` with a deterministic fake
for tests — swap ``_decode_image_impl`` for a real decoder in production.

Design rules for 100 TB of blobs:
- blobs ride as ``binary`` columns; metadata (width/height/duration/codec) as
  typed sibling columns so filters prune BEFORE any decode.
- decode/feature-extract runs in ``mapInPandas`` (Arrow batches, one Python
  worker per core, no per-row overhead); batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap memory per batch.
- never collect blobs to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("content", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised when a real media codec is required but not installed."""


def _decode_image_impl(content: bytes) -> tuple[int, int]:
    """STUB: real implementation would use PIL/turbojpeg. Deterministic fake:
    derives (width, height) from a crc32 of the content — crc32, NOT Python
    ``hash()``, which is salted per process and would differ between executors
    — so tests exercise the full Arrow pipeline without a codec."""
    import zlib

    if content is None:
        raise DecoderUnavailable("no content")
    h = zlib.crc32(bytes(content)) & 0xFFFFFFFF
    return (h % 1920) + 1, (h // 1920 % 1080) + 1


def extract_image_meta(df: DataFrame, blob_col: str = "content", deterministic_fake: bool = True) -> DataFrame:
    """Decode-and-measure over Arrow batches. Appends width/height columns.

    ``deterministic_fake=False`` raises DecoderUnavailable — the marked seam
    where a real codec plugs in."""
    if not deterministic_fake:
        raise DecoderUnavailable("image codecs not installed in this environment")

    out_schema = T.StructType(df.schema.fields + [
        T.StructField("img_width", T.IntegerType(), True),
        T.StructField("img_height", T.IntegerType(), True),
    ])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _decode_image_impl(b) if b is not None else (None, None)
                for b in pdf[blob_col]
            ]
            pdf = pdf.copy()
            pdf["img_width"] = [d[0] for d in dims]
            pdf["img_height"] = [d[1] for d in dims]
            yield pdf

    return df.mapInPandas(mapper, schema=out_schema)


def frame_sample_plan(df: DataFrame, ts_col: str = "ts", every_n_seconds: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video rows: emits (blob, sample_ts) pairs via
    a generator column — the decode itself is the stubbed seam. Shows the
    explode-side plumbing (one row per frame to extract) that a real pipeline
    schedules across executors."""
    duration = F.coalesce(F.col("duration_s"), F.lit(0))
    sample_ts = F.sequence(F.lit(0), duration.cast("int"), F.lit(every_n_seconds))
    return df.withColumn("sample_ts", F.explode(sample_ts))


def resize_images(df: DataFrame, blob_col: str = "content", max_side: int = 512) -> DataFrame:
    """Resize seam (stub): in production the mapper re-encodes each blob with
    a codec; here the plumbing is real — Arrow batches in, binary column out,
    target size as typed metadata — and the pixel work raises through the
    marked seam."""

    out_schema = T.StructType(df.schema.fields + [
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("resized_max_side", T.IntegerType(), False),
    ])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            # STUB: passthrough bytes; a real impl decodes→resizes→re-encodes
            pdf["resized"] = pdf[blob_col]
            pdf["resized_max_side"] = max_side
            yield pdf

    return df.mapInPandas(mapper, schema=out_schema)


def extract_audio_features(df: DataFrame, blob_col: str = "content", deterministic_fake: bool = True) -> DataFrame:
    """Audio feature seam (stub): duration + RMS-energy columns from a
    deterministic crc32 fake (librosa/ffmpeg not installed here); the
    mapInPandas batch shape and output schema are the production contract."""
    if not deterministic_fake:
        raise DecoderUnavailable("audio codecs not installed in this environment")
    import zlib

    out_schema = T.StructType(df.schema.fields + [
        T.StructField("audio_seconds", T.DoubleType(), True),
        T.StructField("audio_rms", T.DoubleType(), True),
    ])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            feats = [
                (None, None) if b is None else (
                    (zlib.crc32(bytes(b)) % 6000) / 10.0,
                    ((zlib.crc32(bytes(b)) >> 8) % 1000) / 1000.0,
                )
                for b in pdf[blob_col]
            ]
            pdf["audio_seconds"] = [f[0] for f in feats]
            pdf["audio_rms"] = [f[1] for f in feats]
            yield pdf

    return df.mapInPandas(mapper, schema=out_schema)


def binary_stats(df: DataFrame, blob_col: str = "content") -> DataFrame:
    """Cheap metadata pass over blobs without decoding: size, magic-byte format
    sniff (JVM-side substring/hex, no Python)."""
    head = F.hex(F.substring(F.col(blob_col), 1, 4))
    fmt = (
        F.when(head.startswith("FFD8"), "jpeg")
        .when(head.startswith("89504E47"), "png")
        .when(head.startswith("47494638"), "gif")
        .when(head.startswith("52494646"), "riff")
        .otherwise("unknown")
    )
    return df.withColumn("blob_bytes", F.length(F.col(blob_col))).withColumn("blob_format", fmt)
