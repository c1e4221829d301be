"""Event transition matrix (pre-built r13): hand-planted timelines
produce exact counts, rows are proper probability distributions,
single-event users contribute nothing, equal-timestamp order is
pinned by the event-id tiebreak, the sf0.01 result matches the DuckDB
oracle bitwise, and the plan is one user shuffle with no self-join."""

from datetime import datetime

from data_engineering_for_e_commerce_logistics_spark.operators.temporal import (
    event_transition_matrix,
)
from data_engineering_for_e_commerce_logistics_spark.plans import (
    analytics_queries as aq,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, i, datetime(2024, 1, 1, 0, 0, s), e) for u, i, s, e in rows],
        "user_id long, event_id long, ts timestamp, event_type string",
    )


def test_hand_computed_counts(spark):
    """User 1: a→b→a (transitions ab, ba); user 2: a→b (ab).
    Matrix: ab=2, ba=1; P(b|a)=1.0, P(a|b)=1.0."""
    rows = [
        (1, 1, 0, "a"), (1, 2, 1, "b"), (1, 3, 2, "a"),
        (2, 4, 0, "a"), (2, 5, 1, "b"),
    ]
    out = {
        (r.from_type, r.to_type): r
        for r in event_transition_matrix(_ev(spark, rows)).collect()
    }
    assert out[("a", "b")].n == 2
    assert out[("b", "a")].n == 1
    assert out[("a", "b")].prob == 1.0
    assert out[("b", "a")].prob == 1.0


def test_rows_are_distributions(spark):
    rows = [(1, i, i, "abc"[i % 3]) for i in range(30)] + [
        (2, 100 + i, i, "ab"[i % 2]) for i in range(20)
    ]
    out = event_transition_matrix(_ev(spark, rows)).collect()
    by_from = {}
    for r in out:
        by_from.setdefault(r.from_type, []).append(r.prob)
        assert 0.0 < r.prob <= 1.0
    for probs in by_from.values():
        assert abs(sum(probs) - 1.0) < 1e-6


def test_singletons_and_cross_user_isolation(spark):
    """A single-event user adds no transition, and consecutive events
    of DIFFERENT users never pair."""
    rows = [(1, 1, 0, "a"), (2, 2, 1, "b"), (3, 3, 2, "c")]
    assert event_transition_matrix(_ev(spark, rows)).count() == 0


def test_equal_ts_tiebreak_by_event_id(spark):
    """Two events at the same timestamp order by event_id in BOTH
    engines — the transition direction is pinned, not
    partition-luck."""
    rows = [(1, 10, 0, "x"), (1, 11, 0, "y")]
    out = event_transition_matrix(_ev(spark, rows)).collect()
    assert len(out) == 1
    assert (out[0].from_type, out[0].to_type) == ("x", "y")


def test_transitions_match_duckdb(spark):
    spdf = aq.event_transitions(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(aq.EVENT_TRANSITIONS_SQL).fetchdf()
    conn.close()
    assert len(spdf) == 25  # 5 types, all pairs observed at this sf
    assert compare_frames(spdf, opdf, "event_transitions") == []


def test_transitions_plan_one_user_shuffle(spark):
    """100 TB guard: one exchange on the user key, pairs from a
    codegen zip of the sorted timeline against its own tail — no
    self-join, no corpus window, the row totals broadcast."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, aq.event_transitions)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition" not in plan
    assert "BroadcastHashJoin" in plan


def test_event_analytics_suite_equals_parts(spark):
    """The one-scan events suite must carry all three standalone
    specs' cells verbatim."""
    suite = aq.event_analytics_suite(spark, SF).toPandas()

    fun = aq.funnel_events(spark, SF).toPandas()
    f = suite[suite.variant == "funnel"].rename(
        columns={"k": "step", "s1": "name", "n": "n_users",
                 "v1": "conv_from_first", "v2": "drop_from_prev"}
    )[list(fun.columns)]
    assert compare_frames(f, fun, "suite-funnel-leg") == []

    coh = aq.cohort_retention_events(spark, SF).toPandas()
    c = suite[suite.variant == "cohort"].rename(
        columns={"k": "period", "d": "cohort_week", "n": "n_users",
                 "v1": "retention"}
    )[list(coh.columns)]
    assert compare_frames(c, coh, "suite-cohort-leg") == []

    tra = aq.event_transitions(spark, SF).toPandas()
    t = suite[suite.variant == "transitions"].rename(
        columns={"s1": "from_type", "s2": "to_type", "v1": "prob"}
    )[list(tra.columns)]
    assert compare_frames(t, tra, "suite-transitions-leg") == []


def test_event_analytics_suite_matches_duckdb(spark):
    spdf = aq.event_analytics_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(aq.EVENT_ANALYTICS_SUITE_SQL).fetchdf()
    conn.close()
    assert compare_frames(spdf, opdf, "event_analytics_suite") == []


def test_event_analytics_suite_one_scan(spark):
    """Plan guard: ONE cached narrow events scan serves the three
    legs (InMemoryTableScans), no cartesian anywhere."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, aq.event_analytics_suite)
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 3
