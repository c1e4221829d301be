"""Cross-source contamination matrix (pre-built r13): the near-dup
pair mine labeled by source pair.  Matrix rows must re-derive from the
registered pair spec by plain relabeling (no new mining), match the
WITH-chain DuckDB oracle cell-exactly, and keep the pair frame
broadcast through the source lookups."""

from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.plans import (
    extended_queries as xq,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def test_matrix_rederives_from_pair_spec(spark):
    from data_engineering_for_e_commerce_logistics_spark.catalog import (
        load_tables,
    )

    docs = load_tables(spark, SF, ("documents",))["documents"]
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in xq.dedup_minhash_lsh(spark, SF).collect()
    }
    src = {
        r.doc_id: r.source for r in docs.select("doc_id", "source").collect()
    }
    want = {}
    for (a, b), j in pairs.items():
        key = tuple(sorted((src[a], src[b])))
        n, mx = want.get(key, (0, 0.0))
        want[key] = (n + 1, max(mx, j))
    got = {
        (r.source_a, r.source_b): (r.n_pairs, r.max_jaccard, r.cross_source)
        for r in xq.source_overlap_matrix(spark, SF).collect()
    }
    assert set(got) == set(want)
    for key, (n, mx) in want.items():
        gn, gmx, cross = got[key]
        assert (gn, gmx) == (n, mx), key
        assert cross == (key[0] != key[1]), key


def test_fixture_has_cross_source_contamination(spark):
    """The forensics value proposition: the fixture's planted near-dup
    clusters DO span sources, so the matrix carries real cross-source
    signal (if this ever goes empty the fixture changed under us)."""
    out = xq.source_overlap_matrix(spark, SF)
    assert out.where("cross_source").count() > 0
    assert out.agg(F.max("max_jaccard")).collect()[0][0] >= 0.9


def test_source_overlap_matches_duckdb(spark):
    spdf = xq.source_overlap_matrix(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(xq.SOURCE_OVERLAP_SQL).fetchdf()
    conn.close()
    assert compare_frames(spdf, opdf, "source_overlap_matrix") == []


def test_overlap_plan_broadcasts_pairs_no_cartesian(spark):
    plan = (
        xq.source_overlap_matrix(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
