"""User-defined rule seam tests (Arrow-batched pandas functions)."""

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

from analyst_toolkit_spark.operators.custom import apply_grouped_rule, apply_row_rule, vector_rule


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [Row(user=u, amount=float(a), note=n)
         for u, a, n in [(1, 10, "ok"), (1, 300, "BIG SPEND"), (2, 5, "ok"), (2, 7, "fine"), (3, 1000, "HUGE")]]
    )


def test_apply_row_rule(frame):
    def flag_large(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["large"] = pdf["amount"] > 100
        return pdf

    out = apply_row_rule(frame, flag_large, "user long, amount double, note string, large boolean")
    assert out.filter("large").count() == 2


def test_apply_grouped_rule(frame):
    def zscore_within_user(pdf: pd.DataFrame) -> pd.DataFrame:
        m, s = pdf["amount"].mean(), pdf["amount"].std()
        return pd.DataFrame({
            "user": pdf["user"],
            "amount": pdf["amount"],
            "is_anomaly": ((pdf["amount"] - m).abs() > 1 * s) if s and s > 0 else False,
        })

    out = apply_grouped_rule(frame, ["user"], zscore_within_user, "user long, amount double, is_anomaly boolean")
    assert out.count() == 5
    assert out.filter("is_anomaly").count() == 0  # 1-sigma with n=2 groups: none beyond


def test_vector_rule_composes_with_columns(frame):
    shouting = vector_rule(lambda s: s.str.isupper())
    out = frame.withColumn("shout", shouting(F.col("note")))
    assert out.filter("shout").count() == 2
    # composes with built-in predicates in one expression
    assert out.filter(F.col("shout") & (F.col("amount") > 100)).count() == 2
