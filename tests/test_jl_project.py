"""JL random projection (pre-built r12): the projection must match an
independent numpy reference cell-exactly, empirically preserve
pairwise distances (the JL lemma at 16 dims, loose ε), match its
DuckDB oracle bitwise, and stay a map-only shuffle-free plan."""

from __future__ import annotations

import math

from data_engineering_for_e_commerce_logistics_spark.operators import (
    similarity,
)
from data_engineering_for_e_commerce_logistics_spark.plans import (
    graph_queries as gq,
)

SF = "/root/testdata/sf0.01"


def _py_sign(i: int, j: int) -> int:
    p = similarity.JL_P
    fi = (i * similarity.JL_I[0] + similarity.JL_I[1]) % p
    fj = (j * similarity.JL_J[0] + similarity.JL_J[1]) % p
    return 1 - 2 * (fi * fj % p % 2)


def test_jl_project_matches_python_reference(spark):
    rows = [
        (k, [math.sin(k * 13 + i) for i in range(24)]) for k in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: list(r.jl)
        for r in similarity.jl_project(df, out_dim=8).collect()
    }
    inv = math.sqrt(8.0)
    for k, v in rows:
        want = [
            sum(v[i] * _py_sign(i, j) for i in range(24)) / inv
            for j in range(8)
        ]
        assert all(abs(a - b) < 1e-12 for a, b in zip(got[k], want)), k


def test_jl_project_wide_out_dim_no_int_overflow(spark):
    """ADVICE r12: j·22695477 in int32 overflows for j ≥ ~95.  With
    the long-cast fix, out_dim=128 must still match the (arbitrary-
    precision) Python reference exactly — and every sign must be ±1,
    which the overflowed parity would break."""
    rows = [(k, [math.cos(k * 7 + i) for i in range(12)]) for k in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: list(r.jl)
        for r in similarity.jl_project(df, out_dim=128).collect()
    }
    inv = math.sqrt(128.0)
    for k, v in rows:
        want = [
            sum(v[i] * _py_sign(i, j) for i in range(12)) / inv
            for j in range(128)
        ]
        assert all(abs(a - b) < 1e-12 for a, b in zip(got[k], want)), k


def test_jl_preserves_pairwise_distances(spark):
    """The Achlioptas bound made empirical: over the fixture's real
    embeddings, squared-distance ratios must center on 1 (16 dims ⇒
    ε ≈ 1/√16, so individual pairs roam but the mean is tight)."""
    out = gq.jl_project_embeddings(spark, SF).toPandas()
    ratios = out[out.variant == "dist"].x
    assert len(ratios) == gq.JL_DIST_IDS * (gq.JL_DIST_IDS - 1) // 2
    assert 0.85 <= ratios.mean() <= 1.15
    assert 0.6 <= ratios.median() <= 1.4
    assert (ratios > 0).all() and (ratios < 4).all()


def test_jl_project_embeddings_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.jl_project_embeddings(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.JL_PROJECT_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "jl_project_embeddings") == []


def test_jl_project_plan_is_map_only(spark):
    """The comp leg must be pure projection: no exchange anywhere in
    the projection subtree (assert the operator alone plans with zero
    shuffles), and the full spec adds only the bounded dist-leg join."""
    from data_engineering_for_e_commerce_logistics_spark.catalog import (
        load_tables,
    )

    emb = load_tables(spark, SF, ("embeddings",))["embeddings"]
    plan = (
        similarity.jl_project(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan

    full = (
        gq.jl_project_embeddings(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in full
    assert "BatchEvalPython" not in full
