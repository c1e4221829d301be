"""Pairwise Jensen–Shannon divergence between source bucket-LMs
(pre-built r13): identical sources read ~0, disjoint-vocabulary
sources read near ln 2, the matrix covers every unordered pair
exactly once, the sf0.01 result matches the DuckDB oracle bitwise,
and the pair expansion is bounded by the domain count — never the
corpus."""

import math

from data_engineering_for_e_commerce_logistics_spark.operators.corpus import (
    source_divergence_matrix,
)
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def _fixture(spark):
    rows = []
    i = 0
    for d, words in (
        ("twin_a", "the cat sat on the mat and the dog ran fast"),
        ("twin_b", "the cat sat on the mat and the dog ran fast"),
        ("alien", "zq xv wk jj qz vx kw jx zz vv ww qq pp oo"),
    ):
        for r in range(10):
            rows.append((i, d, words))
            i += 1
    return _mk(spark, rows)


def test_identical_sources_read_zero(spark):
    """Two sources with IDENTICAL text: every bucket's p equals q, so
    each term is ln(1)·p = 0 rounded to exactly 0.0 — the JS reads
    0.0, not merely small."""
    out = {
        (r.source_a, r.source_b): r.js_div
        for r in source_divergence_matrix(_fixture(spark)).collect()
    }
    assert out[("twin_a", "twin_b")] == 0.0


def test_disjoint_vocab_reads_high(spark):
    """A disjoint-vocabulary source vs either twin must read far
    above the twins' mutual 0 and approach the ln 2 ceiling (add-½
    smoothing keeps it strictly below)."""
    out = {
        (r.source_a, r.source_b): r.js_div
        for r in source_divergence_matrix(_fixture(spark)).collect()
    }
    ln2 = math.log(2.0)
    for pair in (("alien", "twin_a"), ("alien", "twin_b")):
        assert out[pair] > 0.5 * ln2
        assert out[pair] < ln2
    assert out[("alien", "twin_a")] > 100 * out[("twin_a", "twin_b")]


def test_every_unordered_pair_once(spark):
    out = source_divergence_matrix(_fixture(spark)).collect()
    pairs = {(r.source_a, r.source_b) for r in out}
    assert len(out) == 3  # C(3,2)
    assert all(a < b for a, b in pairs)


def test_js_symmetric_in_construction(spark):
    """Relabeling the two sources (swapping which sorts first) must
    not change the value — JS is symmetric and the operator's a<b
    canonicalization cannot leak asymmetry."""
    rows_ab = []
    rows_ba = []
    i = 0
    for d1, d2 in (("aa", "zz"),):
        for r in range(8):
            rows_ab.append((i, d1, f"alpha beta gamma tail{r % 2}"))
            rows_ab.append((1000 + i, d2, f"delta epsilon zeta tail{r % 3}"))
            rows_ba.append((i, d2, f"alpha beta gamma tail{r % 2}"))
            rows_ba.append((1000 + i, d1, f"delta epsilon zeta tail{r % 3}"))
            i += 1
    v1 = source_divergence_matrix(_mk(spark, rows_ab)).collect()[0].js_div
    v2 = source_divergence_matrix(_mk(spark, rows_ba)).collect()[0].js_div
    assert v1 == v2


def test_source_divergence_matches_duckdb(spark):
    spdf = xc.source_divergence_matrix(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(xc.SOURCE_DIVERGENCE_SQL).fetchdf()
    conn.close()
    assert len(spdf) == 190  # C(20,2)
    assert compare_frames(spdf, opdf, "source_divergence_matrix") == []


def test_divergence_plan_bounded_pair_join(spark):
    """100 TB guard: the only join is the grid against a BROADCAST
    copy of itself (K×B rows each side) — no sort-merge, no
    cartesian, no corpus-keyed partitioning; the corpus appears only
    under the two grid aggregates."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, xc.source_divergence_matrix)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(doc_id" not in plan
    assert "BroadcastHashJoin" in plan
