"""Water-filling token-budget quotas (pre-built r13): hand-computed
cap-and-reflow fixture, exact budget conservation at fixpoint, ample
availability degenerates to proportional shares, over-budget caps
everyone, the sf0.01 result matches the unrolled-CTE DuckDB oracle
bitwise, and the loop is window arithmetic over the bounded group
frame."""

from data_engineering_for_e_commerce_logistics_spark.operators.corpus import (
    token_quota_plan,
)
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def _avail(spark, rows):
    return spark.createDataFrame(
        rows, "source string, avail_tokens long, weight double"
    )


def test_cap_and_reflow_hand_computed(spark):
    """Three groups, equal weight, budget 300: 'small' can only hold
    40, so it caps and its surplus re-flows — the other two split the
    remaining 260 evenly (130 each), NOT the naive 100."""
    rows = [("small", 40, 1.0), ("big_a", 1000, 1.0), ("big_b", 1000, 1.0)]
    out = {
        r.source: r
        for r in token_quota_plan(_avail(spark, rows), budget=300.0).collect()
    }
    assert out["small"].capped == 1 and out["small"].quota == 40.0
    assert out["big_a"].capped == 0
    assert abs(out["big_a"].quota - 130.0) < 1e-6
    assert abs(out["big_b"].quota - 130.0) < 1e-6


def test_ample_availability_is_proportional(spark):
    rows = [("a", 10_000, 3.0), ("b", 10_000, 1.0)]
    out = {
        r.source: r
        for r in token_quota_plan(_avail(spark, rows), budget=400.0).collect()
    }
    assert abs(out["a"].quota - 300.0) < 1e-5
    assert abs(out["b"].quota - 100.0) < 1e-5
    assert out["a"].capped == 0 and out["b"].capped == 0


def test_over_budget_caps_everyone(spark):
    rows = [("a", 50, 1.0), ("b", 70, 2.0)]
    out = {
        r.source: r
        for r in token_quota_plan(
            _avail(spark, rows), budget=10_000.0
        ).collect()
    }
    assert out["a"].capped == 1 and out["a"].quota == 50.0
    assert out["b"].capped == 1 and out["b"].quota == 70.0


def test_budget_conserved_at_fixpoint(spark):
    """Cascading caps (each round caps another group): the final
    allocation must still sum to the budget exactly — the
    naive-quota underfill bug this operator exists to fix."""
    rows = [
        ("tiny", 10, 5.0),
        ("small", 60, 5.0),
        ("mid", 5_000, 1.0),
        ("large", 50_000, 1.0),
    ]
    out = token_quota_plan(_avail(spark, rows), budget=1_000.0).collect()
    assert sum(r.quota for r in out) == 1_000.0
    assert {r.source: r.capped for r in out} == {
        "tiny": 1, "small": 1, "mid": 0, "large": 0,
    }


def test_token_quota_matches_duckdb(spark):
    spdf = xc.token_quota_plan_sources(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(xc.TOKEN_QUOTA_SQL).fetchdf()
    conn.close()
    assert len(spdf) == 20
    assert int(spdf.capped.sum()) > 0  # the capping branch exercises
    assert compare_frames(spdf, opdf, "token_quota_plan_sources") == []


def test_quota_plan_windows_on_bounded_frame(spark):
    """100 TB guard: the corpus appears only in the per-source token
    aggregate; every water-filling step is window arithmetic over the
    K-row frame — no joins, no cartesian."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, xc.token_quota_plan_sources)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition" in plan
    assert "hashpartitioning(doc_id" not in plan


def test_mixture_suite_equals_parts(spark):
    """The reweight leg must carry domain_reweight_mixture's cells
    verbatim, and the quota leg must allocate the suite budget
    exactly with caps exercised."""
    suite = xc.mixture_planning_suite(spark, SF).toPandas()
    rw = xc.domain_reweight_mixture(spark, SF).toPandas()
    r = suite[suite.variant == "reweight"].rename(
        columns={
            "s": "source", "n1": "n_docs", "n2": "n_feats",
            "v1": "loss_own", "v2": "loss_mix", "v3": "excess",
            "v4": "alpha", "v5": "weight",
        }
    )[list(rw.columns)]
    assert compare_frames(r, rw, "suite-reweight-leg") == []
    q = suite[suite.variant == "quota"]
    assert int(q.n2.sum()) > 0
    assert abs(q.v6.sum() - 26000.0) < 1e-6


def test_mixture_suite_matches_duckdb(spark):
    spdf = xc.mixture_planning_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(xc.MIXTURE_PLANNING_SQL).fetchdf()
    conn.close()
    assert compare_frames(spdf, opdf, "mixture_planning_suite") == []
