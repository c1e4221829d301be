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


def test_schema_check_and_report_dict(spark, frame):
    v = (
        DataValidator("orders")
        .add_schema_check({"order_id": "string", "price": "double"})
        .add_null_check("order_id")
    )
    report = v.validate(frame)
    schema_result = [r for r in report.results if r.name == "schema_check"][0]
    assert schema_result.passed
    d = report.to_dict()
    assert d["table_name"] == "orders" and d["row_count"] == 4
    assert d["error_count"] == 1  # the null check fails
    bad = (
        DataValidator()
        .add_schema_check({"order_id": "bigint", "missing_col": "string"})
        .validate(frame)
    )
    r = bad.results[0]
    assert not r.passed and r.violations == 2
    assert "missing column" in r.description and "expected bigint" in r.description


def test_preconfigured_validators(spark):
    from data_engineering_for_e_commerce_logistics_spark.operators.validators import (
        create_order_items_validator,
        create_orders_validator,
    )

    orders = spark.createDataFrame(
        [("o1", "c1", "2024-01-01"), ("o2", None, "2024-01-02")],
        "order_id string, customer_id string, order_purchase_timestamp string",
    )
    report = create_orders_validator().validate(orders)
    by_name = {r.name: r for r in report.results}
    assert not by_name["null_check_customer_id"].passed
    assert by_name["null_check_order_id"].passed

    items = spark.createDataFrame(
        [("o1", "p1", 5.0, -1.0)],
        "order_id string, product_id string, price double, freight_value double",
    )
    report2 = create_order_items_validator().validate(items)
    by_name2 = {r.name: r for r in report2.results}
    assert not by_name2["range_check_freight_value"].passed


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
