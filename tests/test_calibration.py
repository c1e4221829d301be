"""Reliability diagram + ECE (pre-built r13): a perfectly calibrated
scored frame reads ECE exactly 0, a constant-score frame reads the
plain gap, bins partition the corpus with the top clamp, the sf0.01
composition over the in-engine classifier matches the DuckDB oracle
bitwise, and the operator plan is one bounded hash-agg + windows."""

from data_engineering_for_e_commerce_logistics_spark.operators.corpus import (
    calibration_bins,
)
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double, y int")


def test_perfectly_calibrated_reads_zero(spark):
    """Per decile k: 20 rows at score k/10+0.05 with exactly 2k+1
    positives, so mean predicted == observed fraction in EVERY bin —
    every gap is exactly 0.0 and so is the ECE (exact, not small:
    both sides round at 9dp before the subtraction)."""
    rows = []
    i = 0
    for k in range(10):
        for r in range(20):
            rows.append((i, k / 10 + 0.05, 1 if r < 2 * k + 1 else 0))
            i += 1
    out = calibration_bins(_mk(spark, rows)).collect()
    assert len(out) == 10
    for r in out:
        assert r.gap == 0.0
        assert r.ece == 0.0


def test_constant_overconfident_score(spark):
    """Every doc scored 0.9, none positive: one bin, gap = ece = 0.9
    — the overconfident-filter smoking gun."""
    out = calibration_bins(
        _mk(spark, [(i, 0.9, 0) for i in range(40)])
    ).collect()
    assert len(out) == 1
    assert abs(out[0].gap - 0.9) < 1e-9
    assert abs(out[0].ece - 0.9) < 1e-9
    assert out[0].bin == 9


def test_bins_partition_with_top_clamp(spark):
    """Scores cover [0, 1] INCLUSIVE: score 1.0 clamps into the top
    bin (least(floor(10), 9)), bin ids stay in range, and the bin
    sizes sum back to the corpus."""
    rows = [(i, i / 20, i % 2) for i in range(21)]  # 0.0 .. 1.0
    out = calibration_bins(_mk(spark, rows)).collect()
    assert sum(r.n for r in out) == 21
    assert all(0 <= r.bin <= 9 for r in out)
    top = [r for r in out if r.bin == 9][0]
    assert top.n == 3  # 0.90, 0.95, and the clamped 1.00


def test_ece_is_size_weighted(spark):
    """Two bins, sizes 30 and 10, gaps 0.1 and 0.5: the ECE must be
    the size-weighted (30·0.1 + 10·0.5)/40 = 0.2, not the plain bin
    mean 0.3."""
    rows = [(i, 0.2, 1 if i < 3 else 0) for i in range(30)] + [
        (100 + i, 0.9, 1 if i < 4 else 0) for i in range(10)
    ]
    out = {r.bin: r for r in calibration_bins(_mk(spark, rows)).collect()}
    assert abs(out[2].gap - 0.1) < 1e-9
    assert abs(out[9].gap - 0.5) < 1e-9
    assert abs(out[2].ece - 0.2) < 1e-9


def test_calibration_matches_duckdb(spark):
    spdf = xc.quality_calibration_bins(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(xc.QUALITY_CALIBRATION_SQL).fetchdf()
    conn.close()
    assert compare_frames(spdf, opdf, "quality_calibration_bins") == []


def test_calibration_plan_bounded(spark):
    """The operator's own plan (scored frame in): ONE hash aggregate
    onto ≤n_bins keys, then window arithmetic on the bounded bin
    frame — no join of any kind, no corpus re-key."""
    df = _mk(spark, [(i, i / 40, 1 if i % 3 == 0 else 0) for i in range(40)])
    plan = (
        calibration_bins(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "windowspecdefinition" in plan
    assert plan.count("HashAggregate") <= 4  # partial+final, ≤2 aggs


def test_suite_equals_parts(spark):
    """The one-slot suite must carry BOTH standalone specs' cells
    verbatim: 'scored' rows == corpus_quality_classifier, 'calib'
    rows == quality_calibration_bins."""
    suite = xc.quality_classifier_suite(spark, SF).toPandas()
    scored = xc.corpus_quality_classifier(spark, SF).toPandas()
    calib = xc.quality_calibration_bins(spark, SF).toPandas()

    s = (
        suite[suite.variant == "scored"]
        .rename(
            columns={"k": "doc_id", "n": "n_feats", "s1": "score",
                     "s2": "pred"}
        )[["doc_id", "y", "n_feats", "score", "pred"]]
        .astype({"y": "int32", "pred": "int32"})
    )
    assert compare_frames(s, scored, "suite-scored-leg") == []

    c = (
        suite[suite.variant == "calib"]
        .rename(
            columns={"k": "bin", "y": "n_pos", "s1": "mean_score",
                     "s2": "frac_pos", "s3": "gap", "s4": "ece"}
        )[["bin", "n", "n_pos", "mean_score", "frac_pos", "gap", "ece"]]
    )
    assert compare_frames(c, calib, "suite-calib-leg") == []


def test_suite_matches_duckdb(spark):
    spdf = xc.quality_classifier_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(xc.QUALITY_CLASSIFIER_SUITE_SQL).fetchdf()
    conn.close()
    assert compare_frames(spdf, opdf, "quality_classifier_suite") == []


def test_suite_shares_one_training_chain(spark):
    """Plan guard: the scored frame is cached ONCE and both legs read
    the InMemoryTableScan — registering the suite must not replay the
    63-job training chain for the calibration arithmetic."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, xc.quality_classifier_suite)
    assert plan.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in plan
