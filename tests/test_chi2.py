"""Pearson χ² independence test (pre-built r13): a hand-computed 2×2
table gives the exact classical statistic, planted independence reads
~0, planted dependence blows past the critical value, zero-observed
cells still contribute e, the sf0.01 result matches the DuckDB oracle
bitwise, and the plan is one fused hash-agg + bounded windows."""

from data_engineering_for_e_commerce_logistics_spark.operators.corpus import (
    chi_square_independence,
)
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def _df(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


def test_hand_computed_2x2(spark):
    """Table [[10, 20], [20, 10]]: margins 30/30, n=60, every e=15,
    χ² = 4·(5²/15) = 20/3; dof = 1."""
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 20 + [("y", "q")] * 10
    )
    out = chi_square_independence(_df(spark, rows), "a", "b").collect()[0]
    assert abs(out.chi2 - 20 / 3) < 1e-6
    assert out.dof == 1
    assert out.n == 60


def test_perfect_independence_reads_zero(spark):
    """Counts exactly proportional to the margins: every o == e, the
    statistic is exactly 0.0."""
    rows = (
        [("x", "p")] * 8 + [("x", "q")] * 4
        + [("y", "p")] * 16 + [("y", "q")] * 8
    )
    out = chi_square_independence(_df(spark, rows), "a", "b").collect()[0]
    assert out.chi2 == 0.0


def test_dependence_trips_the_verdict(spark):
    """Perfect association (x→p, y→q): χ² = n; with critical below n
    the verdict fires."""
    rows = [("x", "p")] * 30 + [("y", "q")] * 30
    out = chi_square_independence(
        _df(spark, rows), "a", "b", critical=10.0
    ).collect()[0]
    assert abs(out.chi2 - 60.0) < 1e-6
    assert out.verdict is True


def test_zero_cells_contribute_expected(spark):
    """The (y, q) cell is never observed, but its expected count
    e = 5·5/15 is positive — the densified table must include it or
    the statistic undercounts.  Table: x:(p=5, q=5), y:(p=5, q=0)."""
    rows = [("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 5
    out = chi_square_independence(_df(spark, rows), "a", "b").collect()[0]
    # margins: row x=10, y=5; col p=10, q=5; n=15
    # e: (x,p)=100/15, (x,q)=50/15, (y,p)=50/15, (y,q)=25/15
    e = [100 / 15, 50 / 15, 50 / 15, 25 / 15]
    o = [5, 5, 5, 0]
    want = sum((oi - ei) ** 2 / ei for oi, ei in zip(o, e))
    assert abs(out.chi2 - want) < 1e-6


def test_chi2_matches_duckdb(spark):
    spdf = xc.lang_source_independence(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(xc.LANG_SOURCE_CHI2_SQL).fetchdf()
    conn.close()
    assert compare_frames(spdf, opdf, "lang_source_independence") == []
    assert spdf.dof.iloc[0] == 76


def test_chi2_plan_bounded(spark):
    """100 TB guard: one fused hash-agg to the K×L table, the
    densify as broadcast joins over level spines, windows on the
    bounded grid — no corpus-keyed shuffle beyond the one agg, no
    shuffled cartesian."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, xc.lang_source_independence)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition" in plan
    assert "InMemoryTableScan" in plan  # the cached contingency agg
