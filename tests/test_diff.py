"""Diff/changelog engine unit tests (reference m00_utils/report_tables.py:79-126,
203-262, 319-327 semantics — row-level compare, dropped rows, value audit)."""

import pytest
from pyspark.sql import Row

from analyst_toolkit_spark.ingest import ROW_ID
from analyst_toolkit_spark.operators import diff as M


@pytest.fixture(scope="module")
def before_after(spark):
    before = spark.createDataFrame(
        [
            Row(_row_id=0, name="alpha", score=1.0),
            Row(_row_id=1, name="beta", score=None),
            Row(_row_id=2, name=None, score=3.0),
            Row(_row_id=3, name="delta", score=4.0),
        ]
    )
    after = spark.createDataFrame(
        [
            Row(_row_id=0, name="alpha", score=1.0),   # unchanged
            Row(_row_id=1, name="beta", score=2.0),    # null -> value
            Row(_row_id=2, name="gamma", score=None),  # value <-> null both ways
            # _row_id=3 dropped
        ]
    )
    return before, after


def test_row_diff_changed_cells(before_after):
    before, after = before_after
    rows = {(r["_row_id"], r["column"]): (r["before"], r["after"]) for r in M.row_diff(before, after).collect()}
    assert rows == {
        (1, "score"): (None, "2.0"),
        (2, "name"): (None, "gamma"),
        (2, "score"): ("3.0", None),
    }


def test_change_summary_counts(before_after):
    before, after = before_after
    out = {r["column"]: r["cells_changed"] for r in M.change_summary(before, after).collect()}
    assert out == {"name": 1, "score": 2, "__rows_changed__": 2}


def test_dropped_rows_anti_join(before_after):
    before, after = before_after
    dropped = M.dropped_rows(before, after).collect()
    assert [r[ROW_ID] for r in dropped] == [3]
    assert dropped[0]["name"] == "delta"


def test_value_audit_alignment(before_after):
    before, after = before_after
    out = {r["value"]: (r["count_before"], r["count_after"], r["delta"]) for r in M.value_audit(before, after, "name").collect()}
    assert out["alpha"] == (1, 1, 0)
    assert out["beta"] == (1, 1, 0)
    assert out["delta"] == (1, 0, -1)
    assert out["gamma"] == (0, 1, 1)
    # null bucket kept (pandas value_counts(dropna=False) parity)
    assert out[None] == (1, 0, -1)


def test_row_diff_column_subset(before_after):
    before, after = before_after
    only_name = M.row_diff(before, after, columns=["name"]).collect()
    assert {r["column"] for r in only_name} == {"name"}


def test_missing_column_raises(before_after):
    before, after = before_after
    with pytest.raises(ValueError):
        M.row_diff(before, after, columns=["nope"])
