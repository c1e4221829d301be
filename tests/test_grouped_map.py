"""Grouped-map Pandas UDF path (SURVEY §2.9): applyInPandas computing
per-group OLS slope agrees with the native regr_slope aggregate —
the UDF escape hatch is exercised and pinned to the JVM-side result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.catalog import read_parquet_table

SF = "/root/testdata/sf0.001"


def test_apply_in_pandas_slope_matches_native(spark):
    o = read_parquet_table(spark, f"{SF}/orders.parquet")
    pts = o.select(
        F.col("o_custkey").alias("customer_id"),
        (
            (F.col("o_orderdate").cast("timestamp").cast("double") - 788918400.0)
            / 86400.0
        ).alias("x"),
        F.col("o_totalprice").alias("y"),
    )

    def ols(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 3:
            return pd.DataFrame(
                {"customer_id": [], "n_orders": [], "slope": []}
            ).astype({"customer_id": "int64", "n_orders": "int64", "slope": "float64"})
        slope = np.polyfit(pdf["x"], pdf["y"], 1)[0]
        return pd.DataFrame(
            {
                "customer_id": [pdf["customer_id"].iloc[0]],
                "n_orders": [len(pdf)],
                "slope": [slope],
            }
        )

    udf_out = {
        r.customer_id: (r.n_orders, r.slope)
        for r in pts.groupBy("customer_id")
        .applyInPandas(ols, "customer_id long, n_orders long, slope double")
        .collect()
    }
    native = {
        r.customer_id: (r.n, r.slope)
        for r in pts.groupBy("customer_id")
        .agg(F.count(F.lit(1)).alias("n"), F.expr("regr_slope(y, x)").alias("slope"))
        .filter(F.col("n") >= 3)
        .collect()
    }
    assert set(udf_out) == set(native)
    for k in native:
        assert udf_out[k][0] == native[k][0]
        assert udf_out[k][1] == pytest.approx(native[k][1], rel=1e-6)
