"""Validator pass/fail matrix — mirrors the reference's test coverage
(test_transform.py:112-180) plus the fused-single-pass property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators.validators import (
    DataValidator,
    Severity,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        ("o1", 10.0, "delivered"),
        ("o1", -5.0, "delivered"),  # dup id + negative price
        ("o2", 20.0, "bogus"),
        (None, 30.0, "pending"),
    ]
    return spark.createDataFrame(rows, "order_id string, price double, status string")


def test_null_check_fail_and_threshold(spark, frame):
    report = DataValidator().add_null_check("order_id").validate(frame)
    assert not report.passed
    report2 = DataValidator().add_null_check("order_id", threshold=0.5).validate(frame)
    assert report2.passed  # 25% nulls under 50% threshold


def test_unique_check(spark, frame):
    report = DataValidator().add_unique_check("order_id").validate(frame)
    assert not report.passed
    ok = spark.createDataFrame([("a",), ("b",)], "order_id string")
    assert DataValidator().add_unique_check("order_id").validate(ok).passed


def test_range_check_ignores_nulls(spark):
    df = spark.createDataFrame([(1.0,), (None,), (99.0,)], "price double")
    report = (
        DataValidator().add_range_check("price", 0.0, 100.0).validate(df)
    )
    assert report.passed  # null is not a range violation
    bad = spark.createDataFrame([(-1.0,)], "price double")
    assert not DataValidator().add_range_check("price", 0.0).validate(bad).passed


def test_business_rule_null_counts_as_violation(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", None)], "k string, v double")
    report = (
        DataValidator()
        .add_business_rule("v_positive", F.col("v") > 0)
        .validate(df)
    )
    # null predicate result counts as violation (pandas ~mask parity)
    assert report.results[0].violations == 1


def test_critical_gate_raises(spark, frame):
    v = DataValidator().add_null_check("order_id", severity=Severity.CRITICAL)
    report = v.validate(frame)
    with pytest.raises(ValueError, match="critical"):
        report.raise_on_critical()


def test_single_pass_compilation(spark, frame):
    """All rules fuse into one aggregate plan — no per-rule scans."""
    v = (
        DataValidator()
        .add_null_check("order_id")
        .add_unique_check("order_id")
        .add_range_check("price", 0.0, 100.0)
        .add_allowed_values("status", ["delivered", "pending"])
    )
    plan = v.violation_counts(frame)._jdf.queryExecution().executedPlan().toString()
    # one aggregate pair (partial+final) over a single scan
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 2
    report = v.validate(frame)
    by_name = {r.name: r.violations for r in report.results}
    assert by_name["null_check_order_id"] == 1
    assert by_name["unique_check_order_id"] == 1
    assert by_name["range_check_price"] == 1
    assert by_name["allowed_values_status"] == 1
