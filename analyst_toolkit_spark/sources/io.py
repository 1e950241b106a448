"""Sources & sinks (SURVEY §2.1).

Data plane (S1-S7, S10): Spark readers/writers — parquet-first, checkpoints
replace the reference's joblib pickles (m00_utils/load_data.py:45-62 →
``spark.read.parquet``; never pickle). Cloud storage (S4/S11,
mcp_server/io_storage.py:84-133) is a path-scheme concern: ``gs://``/``s3a://``
URIs go straight to ``spark.read`` when the connector jar is on the cluster —
the reference's manual blob-list-and-concat disappears because multi-file scan
is native.

Report plane (S8/S9, m00_utils/export_utils.py:30-131): reports are SMALL
collected aggregates by construction (profile rows, audit tables), so the
driver-side render is not a scale concern. Excel needs openpyxl — gated behind
an import-try; CSV + self-contained HTML always work.
"""

from __future__ import annotations

import html
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

REPORT_ROW_CAP = 10_000  # defensive cap: report tables must be aggregates, not data dumps


def save_output(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S7 data sink. Format from extension when not given; directory output
    (distributed write — no driver collect)."""
    fmt = fmt or ("csv" if path.endswith(".csv") else "json" if path.endswith(".json") else "parquet")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)


def write_sized(
    df: DataFrame,
    path: str,
    target_mb: int = 256,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> int:
    """Size-targeted write: choose the output file count from the
    optimizer's size estimate so files land near ``target_mb`` — the
    small-files discipline a 100 TB table needs (every downstream scan pays
    listing + footer + task-schedule cost PER FILE forever after; the
    dedup-index write learned this lesson in round 5).

    Uses the plan size estimate (parquet footers propagated through the
    plan — free, no scan). Parquet compresses ~3-4x from the in-plan
    estimate, so the estimate is divided by ``_PARQUET_COMPRESSION_GUESS``
    before sizing. Unknown estimate (-1) falls back to
    ``spark.sparkContext.defaultParallelism`` files rather than guessing —
    never a single file (one 100 GB file = one reader task downstream).
    ``coalesce`` (no shuffle) when shrinking; ``repartition`` only when the
    frame has FEWER partitions than the target (growing needs the shuffle).
    Returns the file count used."""
    from analyst_toolkit_spark.functions.stats import plan_size_bytes

    est = plan_size_bytes(df)
    if est >= 0:
        est = est // _PARQUET_COMPRESSION_GUESS if fmt == "parquet" else est
        n_files = max(1, -(-est // (target_mb << 20)))  # ceil div
    else:
        n_files = max(1, df.sparkSession.sparkContext.defaultParallelism)
    current = df.rdd.getNumPartitions()
    sized = df.coalesce(n_files) if n_files <= current else df.repartition(n_files)
    save_output(sized, path, fmt=fmt, mode=mode, partition_by=partition_by)
    return int(n_files)


_PARQUET_COMPRESSION_GUESS = 3  # in-plan bytes -> snappy parquet, conservative


def checkpoint(df: DataFrame, path: str) -> DataFrame:
    """S10/S5: parquet checkpoint — breaks lineage, replaces joblib pickling."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def _to_pandas(table: Any):
    """Accept DataFrame / list[dict] / list[Row] / dict for report rendering."""
    import pandas as pd

    if isinstance(table, DataFrame):
        return table.limit(REPORT_ROW_CAP).toPandas()
    if isinstance(table, dict):
        return pd.DataFrame([{"key": k, "value": v} for k, v in table.items()])
    if isinstance(table, list):
        rows = [r.asDict() if hasattr(r, "asDict") else r for r in table]
        return pd.DataFrame(rows)
    return pd.DataFrame({"value": [table]})


def export_report(reports: dict[str, Any], out_dir: str, formats: tuple[str, ...] = ("csv",)) -> list[str]:
    """S8 multi-table report sink: one CSV per table (and one xlsx with a sheet
    per table when openpyxl is available). Returns written paths."""
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []
    frames = {name: _to_pandas(tbl) for name, tbl in reports.items()}

    if "csv" in formats:
        for name, pdf in frames.items():
            path = os.path.join(out_dir, f"{name}.csv")
            pdf.to_csv(path, index=False)
            written.append(path)

    if "xlsx" in formats:
        try:
            import openpyxl  # noqa: F401
            import pandas as pd

            path = os.path.join(out_dir, "report.xlsx")
            with pd.ExcelWriter(path, engine="openpyxl") as xl:
                for name, pdf in frames.items():
                    pdf.to_excel(xl, sheet_name=name[:31], index=False)
            written.append(path)
        except ImportError:
            pass  # xlsx sink unavailable in this environment; CSV covers the contract

    return written


def export_html_report(reports: dict[str, Any], path: str, title: str = "Report") -> str:
    """S9 self-contained HTML dashboard (driver-side render over collected
    aggregates — plots/tables must never pull the full distributed table)."""
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>",
        "<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse;margin:1em 0}"
        "td,th{border:1px solid #999;padding:4px 8px;text-align:left}th{background:#eee}</style>",
        f"</head><body><h1>{html.escape(title)}</h1>",
    ]
    for name, tbl in reports.items():
        pdf = _to_pandas(tbl)
        parts.append(f"<h2>{html.escape(str(name))}</h2>")
        parts.append(pdf.to_html(index=False, border=0))
    parts.append("</body></html>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write("\n".join(parts))
    return path


def load_any(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Scheme- and format-dispatching reader (S1-S4): local or cloud URI,
    csv/parquet/json by extension unless forced.

    URIs whose scheme has a registered :class:`~analyst_toolkit_spark.sources.
    storage.ObjectStore` (tests, fake schemes, SDK-backed stores) take the
    staged list→cap→download→read path; everything else — local paths and
    native Hadoop-connector schemes (``gs://``, ``s3a://``, …) — goes straight
    to Spark's distributed reader.
    """
    if "://" in path:
        from analyst_toolkit_spark.sources import storage

        if storage.resolve_store(path) is not None:
            return storage.load_uri(spark, path, fmt)
    if fmt is None:
        # compressed variants keep their logical format (Spark's text-based
        # readers decompress .gz/.bz2/... transparently, one file per task)
        stem = path
        for codec_ext in (".gz", ".bz2", ".zst", ".snappy"):
            if stem.endswith(codec_ext):
                stem = stem[: -len(codec_ext)]
                break
        if stem.endswith(".csv"):
            fmt = "csv"
        elif stem.endswith((".json", ".jsonl", ".ndjson")):
            # .jsonl/.ndjson — the standard LLM-corpus layout (one doc per
            # line) — IS Spark's default json source format
            fmt = "json"
        elif stem.endswith(".parquet"):
            fmt = "parquet"
        elif stem.endswith(".orc"):
            fmt = "orc"
        elif os.path.isdir(path):
            # distributed writers emit extension-less directories: sniff the
            # part files
            exts = {os.path.splitext(f)[1] for f in os.listdir(path) if f.startswith("part-")}
            fmt = "csv" if ".csv" in exts else "json" if ".json" in exts else "orc" if ".orc" in exts else "parquet"
        else:
            fmt = "parquet"
    if fmt == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "orc":
        return spark.read.orc(path)
    return spark.read.parquet(path)
