"""Data dictionary — semantic typing + per-column stats + example values.

Reference semantics (m00_utils/data_dictionary_builder.py:50-90):
- semantic type heuristic F11: name ``*_id``/``id`` → identifier; bool →
  boolean; datetime → datetime; int → integer; float → numeric; all-null →
  unknown; bounded cardinality (``nunique <= min(20, max(5, n_nonnull // 2))``)
  → categorical; date/time in name → datetime_like_text; else text.
- example values F12: first ``limit`` DISTINCT non-null values in row order.

Spark design: counts for ALL columns come from ONE aggregation pass. Examples
for ALL columns come from ONE batched job: unpivot to (col, value, _row_id),
group to (col, value, min_row_id), rank per col — first-occurrence order is
exactly ``min(_row_id)``, reproducing pandas insertion order without a
per-column job. Both scale: the grouped set is bounded by distinct values, not
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from analyst_toolkit_spark.ingest import ROW_ID, with_row_id

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"} | {f"decimal({p},{s})" for p in range(39) for s in range(39)}


def semantic_type(name: str, dtype: str, n_nonnull: int, n_unique: int) -> str:
    """F11 heuristic, driver-side (data_dictionary_builder.py:50-74)."""
    lowered = str(name or "").strip().lower()
    if lowered.endswith("_id") or lowered == "id":
        return "identifier"
    if dtype == "boolean":
        return "boolean"
    if dtype.startswith("timestamp") or dtype == "date":
        return "datetime"
    if dtype in _INT_TYPES:
        return "integer"
    if dtype in _FLOAT_TYPES or dtype.startswith("decimal"):
        return "numeric"
    if n_nonnull == 0:
        return "unknown"
    if n_unique <= min(20, max(5, n_nonnull // 2)):
        return "categorical"
    if "date" in lowered or "time" in lowered:
        return "datetime_like_text"
    if dtype == "string":
        return "text"
    return dtype


def _column_stats_driver(df: DataFrame, cols: list[str]) -> list[dict] | None:
    """column_stats' small-input execution shape (r15 optimization round —
    the same tier :func:`operators.profile._profile_driver` rides): when the
    optimizer knows the input is tiny, ONE bounded Arrow collect replaces the
    null-count aggregation plus the count_distinct aggregation (whose EXPAND
    rewrite multiplies every input row per distinct column). Identical values:
    pandas ``isna``/``nunique`` match ``count(isNull)``/``count_distinct``
    under the engine's driver-tier convention (NaN≡null, same as profile's).
    Returns None (caller falls back to the distributed aggs) when the input
    is not known-small, a column type is non-atomic, or the row cap trips."""
    from pyspark.sql import types as T

    from analyst_toolkit_spark.functions.stats import collect_driver_bounded, quantile_strategy

    if quantile_strategy(df) != "driver":
        return None
    atomic = {f.name for f in df.schema.fields if isinstance(f.dataType, T.AtomicType)}
    if any(c not in atomic for c in cols):
        return None
    pdf = collect_driver_bounded(df, cols)
    if pdf is None:
        return None
    n = len(pdf)
    dtypes = dict(df.dtypes)
    out = []
    for c in cols:
        nulls = int(pdf[c].isna().sum())
        out.append(
            {
                "column": c,
                "dtype": dtypes[c],
                "count": n,
                "null_count": nulls,
                "null_pct": round(nulls * 100.0 / n, 2) if n else 0.0,
                "n_unique": int(pdf[c].nunique()),
                "n_nonnull": n - nulls,
            }
        )
    return out


def column_stats(df: DataFrame, columns: list[str] | None = None) -> list[dict]:
    """Per-column count / nulls / distinct. Tiny known inputs take the
    one-collect driver tier (see :func:`_column_stats_driver`); above the
    size gate, null counts in one agg; distinct counts in a second (keeping
    count_distinct separate avoids Catalyst's EXPAND row-multiplication
    hitting the other aggregates — see operators/profile.py)."""
    cols = columns or [c for c in df.columns if c != ROW_ID]
    driver = _column_stats_driver(df, cols)
    if driver is not None:
        return driver
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls::{c}"))
    dist_aggs = [F.count_distinct(F.col(c)).alias(f"uniq::{c}") for c in cols]
    row = df.agg(*aggs).crossJoin(df.agg(*dist_aggs)).first()
    n = row["__n"]
    dtypes = dict(df.dtypes)
    out = []
    for c in cols:
        nulls = int(row[f"nulls::{c}"] or 0)
        out.append(
            {
                "column": c,
                "dtype": dtypes[c],
                "count": n,
                "null_count": nulls,
                "null_pct": round(nulls * 100.0 / n, 2) if n else 0.0,
                "n_unique": int(row[f"uniq::{c}"] or 0),
                "n_nonnull": n - nulls,
            }
        )
    return out


def example_values(df: DataFrame, columns: list[str], limit: int = 5) -> dict[str, list[str]]:
    """First ``limit`` distinct non-null values per column in ingest order
    (F12), ONE distributed job for all columns via min-row-id ranking."""
    if not columns:
        return {}
    df = with_row_id(df)
    pairs = df.select(
        F.col(ROW_ID),
        F.explode(
            F.array(*[F.struct(F.lit(c).alias("col"), F.col(c).cast("string").alias("value")) for c in columns])
        ).alias("p"),
    ).select(ROW_ID, "p.col", "p.value")
    firsts = (
        pairs.filter(F.col("value").isNotNull())
        .groupBy("col", "value")
        .agg(F.min(ROW_ID).alias("first_seen"))
    )
    w = Window.partitionBy("col").orderBy("first_seen")
    top = firsts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= limit)
    out: dict[str, list[tuple[int, str]]] = {c: [] for c in columns}
    for r in top.collect():
        out[r["col"]].append((r["rn"], r["value"]))
    return {c: [v for _, v in sorted(pairs_)] for c, pairs_ in out.items()}


def data_dictionary(
    df: DataFrame, example_limit: int = 5, include_examples: bool = True
) -> DataFrame:
    """Dictionary table: column, dtype, semantic_type, count, null_count,
    null_pct, n_unique, examples. Small output (one row per column) built from
    two distributed passes; returned as a DataFrame for report sinks."""
    stats = column_stats(df)
    examples = (
        example_values(df, [s["column"] for s in stats], example_limit) if include_examples else {}
    )
    rows = []
    for s in stats:
        rows.append(
            {
                "column": s["column"],
                "dtype": s["dtype"],
                "semantic_type": semantic_type(s["column"], s["dtype"], s["n_nonnull"], s["n_unique"]),
                "count": s["count"],
                "null_count": s["null_count"],
                "null_pct": float(s["null_pct"]),
                "n_unique": s["n_unique"],
                "examples": ", ".join(examples.get(s["column"], [])) if include_examples else "Omitted",
            }
        )
    schema = (
        "column string, dtype string, semantic_type string, count long, "
        "null_count long, null_pct double, n_unique long, examples string"
    )
    return df.sparkSession.createDataFrame(rows, schema)
