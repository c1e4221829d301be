"""Per-operator unit tests with tiny inline frames — the reference's
test style (SURVEY §5: tests/test_transform.py) on Spark."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators import cleaners


@pytest.fixture(scope="module")
def orders_df(spark):
    rows = [
        ("o1", "c1", "  ACTIVE ", "2024-01-01 10:00:00", 100.0),
        ("o1", "c1", "active", "2024-01-01 11:00:00", 100.0),  # dup order_id
        ("o2", None, "Delivered", "not-a-date", 50.0),
        ("o3", "c3", "CANCELED", "2024-01-02 10:00:00", None),
    ]
    return spark.createDataFrame(
        rows, "order_id string, customer_id string, status string, ts string, price double"
    )


def test_drop_missing(spark, orders_df):
    out = cleaners.drop_missing(orders_df, subset=["customer_id"])
    assert out.count() == 3


def test_fill_constant(spark, orders_df):
    out = cleaners.fill_constant(orders_df, 0.0, ["price"])
    assert out.filter(F.col("price").isNull()).count() == 0
    assert out.filter(F.col("price") == 0.0).count() == 1


def test_handle_missing_values_dispatcher(spark):
    df = spark.createDataFrame(
        [(1, 1.0, "a"), (2, None, None), (3, 9.0, "c")], "seq int, x double, s string"
    )
    assert cleaners.handle_missing_values(df, "drop").count() == 2
    filled = cleaners.handle_missing_values(df, "fill", fill_value=0.0, columns=["x"])
    assert filled.filter(F.col("x") == 0.0).count() == 1
    ff = cleaners.handle_missing_values(
        df, "fill", fill_method="ffill", columns=["x"], order_by=["seq"]
    )
    assert {r.seq: r.x for r in ff.collect()}[2] == 1.0
    defaults = cleaners.handle_missing_values(df, "fill", columns=["x", "s"])
    got = {r.seq: (r.x, r.s) for r in defaults.collect()}
    assert got[2] == (5.0, "UNKNOWN")  # median of (1, 9), string token
    interp = cleaners.handle_missing_values(
        df, "interpolate", columns=["x"], order_by=["seq"]
    )
    assert {r.seq: r.x for r in interp.collect()}[2] == 5.0
    with pytest.raises(ValueError, match="requires order_by"):
        cleaners.handle_missing_values(df, "fill", fill_method="ffill")
    with pytest.raises(ValueError, match="strategy"):
        cleaners.handle_missing_values(df, "bogus")


def test_fill_default_median_and_unknown(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, None), (None, "b"), (9.0, "c")], "x double, s string"
    )
    out = cleaners.fill_default(df)
    vals = {r.x for r in out.collect()}
    assert 2.0 in vals  # median of (1, 2, 9)
    assert out.filter(F.col("s") == "UNKNOWN").count() == 1


def test_remove_duplicates_keep_first_deterministic(spark, orders_df):
    out = cleaners.remove_duplicates(
        orders_df, subset=["order_id"], keep="first", order_by=["ts"]
    )
    assert out.count() == 3
    kept = out.filter(F.col("order_id") == "o1").first()
    assert kept.ts == "2024-01-01 10:00:00"


def test_remove_duplicates_keep_last(spark, orders_df):
    out = cleaners.remove_duplicates(
        orders_df, subset=["order_id"], keep="last", order_by=["ts"]
    )
    kept = out.filter(F.col("order_id") == "o1").first()
    assert kept.ts == "2024-01-01 11:00:00"


def test_remove_duplicates_drop_all(spark, orders_df):
    out = cleaners.remove_duplicates(orders_df, subset=["order_id"], keep=False)
    assert {r.order_id for r in out.collect()} == {"o2", "o3"}


def test_coerce_timestamps_null_on_bad(spark, orders_df):
    out = cleaners.coerce_timestamps(orders_df, cols=["ts"])
    rows = {r.order_id: r.ts for r in out.collect()}
    assert rows["o2"] is None  # "not-a-date" coerced, no raise
    assert rows["o3"] == datetime.datetime(2024, 1, 2, 10, 0)


def test_discover_timestamp_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", "y", "z")],
        "id int, order_purchase_timestamp string, delivered_date string, created_at string",
    )
    assert set(cleaners.discover_timestamp_columns(df)) == {
        "order_purchase_timestamp",
        "delivered_date",
        "created_at",
    }


def test_normalize_strings_cases(spark, orders_df):
    out = cleaners.normalize_strings(orders_df, ["status"], case="lower")
    sts = {r.status for r in out.filter(F.col("order_id") == "o1").collect()}
    assert sts == {"active"}


def test_ts_diff_hours_24h(spark):
    """The reference's exact-value assertion (test_transform.py:91-106):
    delivered 24h after purchase → 24.0."""
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-02 00:00:00")], "a string, b string"
    ).select(
        F.to_timestamp("a").alias("a"), F.to_timestamp("b").alias("b")
    )
    out = df.select(cleaners.ts_diff_hours("b", "a").alias("h")).first()
    assert out.h == 24.0


def test_safe_ratio_zero_denominator(spark):
    df = spark.createDataFrame([(10.0, 2.0), (10.0, 0.0)], "n double, d double")
    out = df.select(cleaners.safe_ratio("n", "d").alias("r")).collect()
    assert out[0].r == 5.0
    assert out[1].r is None


def test_ffill_partitioned(spark):
    df = spark.createDataFrame(
        [("u1", 1, 1.0), ("u1", 2, None), ("u1", 3, None), ("u2", 1, None), ("u2", 2, 7.0)],
        "user string, seq int, v double",
    )
    out = cleaners.fill_directional(
        df, ["v"], order_by=["seq"], partition_by=["user"], direction="forward"
    )
    got = {(r.user, r.seq): r.v for r in out.collect()}
    assert got[("u1", 2)] == 1.0 and got[("u1", 3)] == 1.0
    assert got[("u2", 1)] is None  # nothing before it


def test_interpolate_linear_pandas_semantics(spark):
    """[null, 1, null, 3, null] → [null, 1, 2, 3, 3] (leading stays
    null, interior linear, trailing takes last value)."""
    df = spark.createDataFrame(
        [(1, None), (2, 1.0), (3, None), (4, 3.0), (5, None)], "seq int, v double"
    )
    out = cleaners.interpolate_linear(df, ["v"], order_by=["seq"])
    got = [r.v for r in out.orderBy("seq").collect()]
    assert got == [None, 1.0, 2.0, 3.0, 3.0]


def test_with_derived_error_tolerance(spark, orders_df):
    out = cleaners.with_derived(
        orders_df,
        {
            "double_price": F.col("price") * 2,
            "broken": F.col("no_such_column") + 1,
        },
        on_error="skip",
    )
    assert "double_price" in out.columns
    assert "broken" not in out.columns
    with pytest.raises(Exception):
        cleaners.with_derived(
            orders_df, {"broken": F.col("nope") + 1}, on_error="raise"
        )
