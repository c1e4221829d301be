"""Salted aggregation equivalence + the Olist-shaped CSV end-to-end
flow (the reference's primary data path: CSV → domain cleaners →
validators → warehouse load)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators import domain, skew
from data_engineering_for_e_commerce_logistics_spark.operators.validators import (
    DataValidator,
    Severity,
)
from data_engineering_for_e_commerce_logistics_spark.plans.pipeline import ETLPipeline
from data_engineering_for_e_commerce_logistics_spark.sources import readers, sinks


def test_salted_aggregate_equals_direct(spark):
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    direct = {
        (r.k): (r.n, r.sv)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    salted = {
        (r.k): (r.n_rows, r.sv)
        for r in skew.salted_aggregate(df, ["k"], sums={"sv": "v"}).collect()
    }
    assert direct == salted


def test_salted_join_equals_direct(spark):
    # skewed big side: 90% of rows share key 0
    big = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("rowid"),
    )
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], "k long, name string"
    )
    direct = {
        (r.rowid, r.name) for r in big.join(dim, ["k"], "inner").collect()
    }
    salted = {
        (r.rowid, r.name)
        for r in skew.salted_join(big, dim, ["k"], "inner", salt_buckets=4).collect()
    }
    assert direct == salted


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.range(100).select((F.col("id") % 20).alias("k"), F.col("id").alias("rowid"))
    dim = spark.createDataFrame([(i, i * 10) for i in range(5)], "k long, v long")
    out = skew.salted_join(big, dim, ["k"], "left", salt_buckets=3)
    assert out.count() == 100
    assert out.filter(F.col("v").isNull()).count() == 75  # keys 5..19


def test_salted_join_rejects_outer(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        skew.salted_join(df, df, ["id"], "full")


OLIST_ORDERS_CSV = """order_id,customer_id,order_status,order_purchase_timestamp,order_approved_at,order_delivered_carrier_date,order_delivered_customer_date,order_estimated_delivery_date
o1,c1,delivered,2024-01-01 00:00:00,2024-01-01 01:00:00,2024-01-01 12:00:00,2024-01-02 00:00:00,2024-01-05 00:00:00
o1,c1,delivered,2024-01-01 00:30:00,,,,
o2,c2,SHIPPED ,2024-01-03 00:00:00,2024-01-03 01:00:00,,,2024-01-08 00:00:00
o3,c1,canceled,2024-01-04 00:00:00,,,,
"""

OLIST_ITEMS_CSV = """order_id,order_item_id,product_id,seller_id,shipping_limit_date,price,freight_value
o1,1,p1,s1,2024-01-03 00:00:00,100.0,10.0
o1,1,p1,s1,2024-01-03 00:00:00,100.0,10.0
o2,1,p2,s2,2024-01-06 00:00:00,0.0,5.0
o3,1,p1,s1,2024-01-07 00:00:00,50.0,
"""


@pytest.fixture()
def olist_dir(tmp_path):
    (tmp_path / "olist_orders_dataset.csv").write_text(OLIST_ORDERS_CSV)
    (tmp_path / "olist_order_items_dataset.csv").write_text(OLIST_ITEMS_CSV)
    return tmp_path


def test_olist_csv_end_to_end(spark, olist_dir, tmp_path):
    """The reference's full flow on its own file shapes: typed CSV scan
    → entity cleaners → validation gate → dependency-ordered parquet
    load with audit columns + run log."""
    warehouse = tmp_path / "warehouse"

    def extract_orders(s):
        return readers.load_csv(
            s,
            str(olist_dir / "olist_orders_dataset.csv"),
            schema=readers.OLIST_ORDERS_SCHEMA,
        )

    def extract_items(s):
        return readers.load_csv(
            s,
            str(olist_dir / "olist_order_items_dataset.csv"),
            schema=readers.OLIST_ORDER_ITEMS_SCHEMA,
        )

    def load(name, df):
        df = sinks.with_audit_columns(df)
        sinks.write_parquet(df, str(warehouse / name), mode="overwrite")
        return spark.read.parquet(str(warehouse / name)).count()

    pipeline = ETLPipeline(
        spark,
        extractors={"orders": extract_orders, "order_items": extract_items},
        transforms={
            "orders": [domain.clean_orders],
            "order_items": [domain.clean_order_items],
        },
        validators={
            "orders": (
                DataValidator("orders")
                .add_null_check("order_id", severity=Severity.CRITICAL)
                .add_unique_check("order_id", severity=Severity.CRITICAL)
            ),
            "order_items": DataValidator("items").add_range_check(
                "price", min_value=0.0
            ),
        },
        load_order=["orders", "order_items"],
        loader=load,
        run_log_path=str(tmp_path / "runlog"),
    )
    result = pipeline.run()
    assert result.status == "success"
    assert result.rows == {"orders": 3, "order_items": 3}

    orders = spark.read.parquet(str(warehouse / "orders"))
    rows = {r.order_id: r for r in orders.collect()}
    assert rows["o1"].delivery_duration_hours == 24.0
    assert rows["o2"].order_status == "shipped"  # trimmed + lowered
    assert {"created_at", "updated_at"} <= set(orders.columns)

    items = spark.read.parquet(str(warehouse / "order_items"))
    irows = {(r.order_id, r.product_id): r for r in items.collect()}
    assert irows[("o1", "p1")].shipping_cost_ratio == 0.1
    assert irows[("o2", "p2")].shipping_cost_ratio is None  # zero price
    assert irows[("o3", "p1")].freight_value == 0.0  # null filled

    log = spark.read.parquet(str(tmp_path / "runlog"))
    assert log.first().status == "success"
