"""as-of join unit semantics: backward/forward, equal-time visibility,
no-match nulls."""

from __future__ import annotations

import pytest

from data_engineering_for_e_commerce_logistics_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [("k1", 5, "e1"), ("k1", 10, "e2"), ("k1", 2, "e0"), ("k2", 7, "e3")],
        "k string, t long, event string",
    )
    right = spark.createDataFrame(
        [("k1", 3, 30.0), ("k1", 10, 100.0), ("k3", 1, 9.0)],
        "k string, t long, v double",
    )
    return left, right


def test_asof_backward(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_time="t", right_time="t", payload=["v"])
    got = {r.event: (r.asof_v, r.asof_time) for r in out.collect()}
    assert got["e0"] == (None, None)  # before any right row
    assert got["e1"] == (30.0, 3)  # latest at-or-before t=5
    assert got["e2"] == (100.0, 10)  # equal time visible (<=)
    assert got["e3"] == (None, None)  # key with no right rows


def test_asof_forward(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t", payload=["v"],
        direction="forward",
    )
    got = {r.event: (r.asof_v, r.asof_time) for r in out.collect()}
    assert got["e0"] == (30.0, 3)  # earliest at-or-after t=2
    assert got["e1"] == (100.0, 10)
    assert got["e2"] == (100.0, 10)  # equal time visible (>=)
    assert got["e3"] == (None, None)


def test_asof_preserves_left_rowcount(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_time="t", right_time="t", payload=["v"])
    assert out.count() == left.count()
