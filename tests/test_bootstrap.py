"""Deterministic Poisson bootstrap (pre-built r13): a constant column
reads boot_std exactly 0 with a degenerate CI at the value, the CI
contains the estimate on real data, replicate weights are honest
Poisson(1) draws (mean ≈ 1), the result is deterministic across
runs, the sf0.01 result matches the DuckDB oracle bitwise, and the
plan collapses to the B-row frame through one exchange."""

from data_engineering_for_e_commerce_logistics_spark.operators.corpus import (
    POISSON1_CDF,
    poisson_bootstrap_ci,
)
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, x long"
    )


def test_constant_column_reads_zero_std(spark):
    """Every replicate mean of a constant column is the constant
    (Σw·c/Σw = c exactly), so boot_std is exactly 0.0 and the CI
    collapses onto the value."""
    out = poisson_bootstrap_ci(
        _df(spark, [7] * 100), "x"
    ).collect()[0]
    assert out.estimate == 7.0
    assert out.boot_mean == 7.0
    assert out.boot_std == 0.0
    assert out.ci_lo == 7.0 and out.ci_hi == 7.0


def test_ci_contains_estimate_and_is_deterministic(spark):
    vals = [(i * 37) % 100 for i in range(500)]
    a = poisson_bootstrap_ci(_df(spark, vals), "x").collect()[0]
    b = poisson_bootstrap_ci(_df(spark, vals), "x").collect()[0]
    assert a == b  # hash-derived draws: bit-reproducible
    assert a.ci_lo < a.estimate < a.ci_hi
    assert a.boot_std > 0


def test_poisson_ladder_is_honest(spark):
    """The inverse-CDF ladder must produce draws with mean ≈ 1 over
    many (id, replicate) hashes — the property that makes the
    Poisson bootstrap consistent."""
    from pyspark.sql import functions as F

    df = _df(spark, [1] * 2000)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":"),
                        F.col("__b").cast("string"),
                    )
                ), 1, 8,
            ), 16, 10,
        ).cast("long").cast("double") / F.lit(4294967296.0)
    )
    w = (
        F.when(u < POISSON1_CDF[0], 0)
        .when(u < POISSON1_CDF[1], 1)
        .when(u < POISSON1_CDF[2], 2)
        .when(u < POISSON1_CDF[3], 3)
        .when(u < POISSON1_CDF[4], 4)
        .otherwise(5)
    )
    stats = (
        df.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("__b"))
        .select(w.alias("w"))
        .agg(F.avg("w").alias("m"), F.variance("w").alias("v"))
        .collect()[0]
    )
    assert abs(stats.m - 1.0) < 0.05
    assert abs(stats.v - 1.0) < 0.1  # Poisson(1): variance == mean


def test_bootstrap_matches_duckdb(spark):
    spdf = xc.corpus_mean_tokens_ci(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(xc.CORPUS_MEAN_TOKENS_CI_SQL).fetchdf()
    conn.close()
    assert compare_frames(spdf, opdf, "corpus_mean_tokens_ci") == []


def test_bootstrap_plan_one_exchange(spark):
    """100 TB guard: the explode(B) feeds ONE hash-agg whose
    map-side combine collapses each partition to B rows; the moment
    windows run on the bounded replicate frame — no join of the
    corpus, no cartesian."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, xc.corpus_mean_tokens_ci)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(__b" in plan
    assert "hashpartitioning(doc_id" not in plan
