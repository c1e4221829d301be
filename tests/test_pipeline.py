"""End-to-end ETL pipeline orchestration (O1-O4): extract → transform
→ validate (abort gate) → dependency-ordered load, with run logging."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators import cleaners
from data_engineering_for_e_commerce_logistics_spark.operators.validators import (
    DataValidator,
    Severity,
)
from data_engineering_for_e_commerce_logistics_spark.plans.pipeline import ETLPipeline


def _extractors(spark):
    orders = spark.createDataFrame(
        [("o1", "c1", "  OK "), ("o1", "c1", "ok"), ("o2", "c2", "BAD")],
        "order_id string, customer_id string, status string",
    )
    customers = spark.createDataFrame([("c1",), ("c2",)], "customer_id string")
    return {
        "customers": lambda s, df=customers: df,
        "orders": lambda s, df=orders: df,
    }


def test_pipeline_success_and_order(spark, tmp_path):
    loads: list[str] = []

    def loader(name, df):
        loads.append(name)
        return df.count()

    p = ETLPipeline(
        spark,
        extractors=_extractors(spark),
        transforms={
            "orders": [
                lambda df: cleaners.remove_duplicates(
                    df, ["order_id"], "first", ["status"]
                ),
                lambda df: cleaners.normalize_strings(df, ["status"], case="lower"),
            ]
        },
        validators={"orders": DataValidator().add_unique_check("order_id")},
        load_order=["customers", "orders"],
        loader=loader,
        run_log_path=str(tmp_path / "runlog"),
    )
    result = p.run()
    assert result.status == "success"
    assert loads == ["customers", "orders"]  # dependency order respected
    assert result.rows == {"customers": 2, "orders": 2}
    assert result.reports["orders"].passed
    log = spark.read.parquet(str(tmp_path / "runlog"))
    assert log.count() == 1 and log.first().status == "success"


def test_pipeline_critical_abort(spark, tmp_path):
    p = ETLPipeline(
        spark,
        extractors=_extractors(spark),
        validators={
            "orders": DataValidator().add_unique_check(
                "order_id", severity=Severity.CRITICAL
            )
        },
        run_log_path=str(tmp_path / "runlog"),
    )
    with pytest.raises(ValueError, match="critical"):
        p.run()
    log = spark.read.parquet(str(tmp_path / "runlog"))
    assert log.first().status == "failed"
