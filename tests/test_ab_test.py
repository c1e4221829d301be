"""Two-proportion A/B z-test (pre-built r13): a hand-computed split
gives the classical statistic, identical buckets read z ≈ 0 and not
significant, a planted lift trips the verdict, degenerate pooled
rates guard to NULL, the sf0.01 result matches the DuckDB oracle
bitwise, and the plan is one user aggregate + a 2-row rollup."""

import math

from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators.temporal import (
    ab_conversion_test,
)
from data_engineering_for_e_commerce_logistics_spark.plans import (
    analytics_queries as aq,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string"
    )


def _split_users(spark, n):
    """Engine-computed md5 bucket per uid — ONE job for all n users
    (the original per-uid collect() loop cost n driver round-trips,
    ~45s of the suite at n≈200; same bucket rule, same results)."""
    rows = (
        spark.range(n)
        .select(
            "id",
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                    16, 10,
                ).cast("long"),
                F.lit(2),
            ).alias("g"),
        )
        .collect()
    )
    a = [r.id for r in rows if r.g == 0]
    b = [r.id for r in rows if r.g != 0]
    return a, b


def test_hand_computed_z(spark):
    """Bucket A: 4 users 2 convert; bucket B: 4 users 4 convert —
    pooled 6/8, z = (1 − 0.5)/sqrt(0.75·0.25·(1/4+1/4))."""
    a, b = _split_users(spark, 30)
    a, b = a[:4], b[:4]
    rows = [(u, "view") for u in a + b]
    rows += [(u, "purchase") for u in a[:2]]
    rows += [(u, "purchase") for u in b]
    out = ab_conversion_test(_ev(spark, rows), "purchase").collect()[0]
    assert (out.n_a, out.conv_a, out.n_b, out.conv_b) == (4, 2, 4, 4)
    want = 0.5 / math.sqrt(0.75 * 0.25 * 0.5)
    assert abs(out.z - want) < 1e-6
    assert out.significant is False  # z ≈ 1.633 < 1.96


def test_identical_buckets_not_significant(spark):
    a, b = _split_users(spark, 60)
    rows = [(u, "view") for u in a + b]
    rows += [(u, "purchase") for u in a[: len(a) // 2]]
    rows += [(u, "purchase") for u in b[: len(b) // 2]]
    out = ab_conversion_test(_ev(spark, rows), "purchase").collect()[0]
    assert abs(out.rate_a - 0.5) < 0.1 and abs(out.rate_b - 0.5) < 0.1
    assert out.significant is False


def test_planted_lift_trips_verdict(spark):
    """Bucket A converts ~10%, bucket B ~90%, 100+ users each —
    far past any critical value."""
    a, b = _split_users(spark, 250)
    rows = [(u, "view") for u in a + b]
    rows += [(u, "purchase") for u in a[: len(a) // 10]]
    rows += [(u, "purchase") for u in b[: 9 * len(b) // 10]]
    out = ab_conversion_test(_ev(spark, rows), "purchase").collect()[0]
    assert out.significant is True
    assert out.z > 5


def test_degenerate_guard(spark):
    """Everyone converts: pooled = 1, se = 0 — z must be NULL and the
    verdict False, not a division error."""
    rows = [(u, "purchase") for u in range(20)]
    out = ab_conversion_test(_ev(spark, rows), "purchase").collect()[0]
    assert out.z is None
    assert out.significant is False


def test_ab_matches_duckdb(spark):
    spdf = aq.ab_purchase_test(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(aq.AB_PURCHASE_SQL).fetchdf()
    conn.close()
    assert compare_frames(spdf, opdf, "ab_purchase_test") == []


def test_ab_plan_one_user_agg(spark):
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, aq.ab_purchase_test)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Join" not in plan
