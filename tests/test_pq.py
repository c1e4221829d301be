"""Product quantization + ANN-assign suite: the pre-built r11 trade
(plans/queries.py docstring).  pq_suite must match its generated
DuckDB oracle cell-exact; ann_assign_suite must reproduce BOTH
retiring specs' outputs from one shared scan and match DuckDB."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.catalog import read_parquet_table
from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
    pq_train_encode,
)
from data_engineering_for_e_commerce_logistics_spark.plans import graph_queries as gq

SF001 = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.01"


def test_pq_encode_shape_and_lloyd_invariant(spark):
    """Every vector gets one code per subspace, codes come from the
    seed id range, and the refined codebook never quantizes worse
    than the seed codebook (each Lloyd half-step minimizes SSE)."""
    emb = read_parquet_table(spark, f"{SF001}/embeddings.parquet")
    n = emb.count()
    codes1, cb1 = pq_train_encode(emb, dim=64, n_sub=4, k=8, n_refine=1)
    rows = codes1.collect()
    assert len(rows) == n * 4
    assert all(0 <= r.code < 8 for r in rows)
    assert all(r.dist >= 0.0 for r in rows)
    # deterministic across runs
    again = {
        (r.vec_id, r.m): r.code
        for r in pq_train_encode(emb, dim=64, n_sub=4, k=8, n_refine=1)[0].collect()
    }
    assert all(again[(r.vec_id, r.m)] == r.code for r in rows)
    codes0, _ = pq_train_encode(emb, dim=64, n_sub=4, k=8, n_refine=0)
    err0 = codes0.agg(F.sum("dist")).first()[0]
    err1 = codes1.agg(F.sum("dist")).first()[0]
    assert err1 <= err0 + 1e-9


def test_pq_suite_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.pq_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.PQ_SUITE_SQL).fetchdf()
    finally:
        conn.close()
    n_vec = int((spdf.variant == "encode").sum()) // gq.PQ_SUB
    assert len(spdf) == n_vec * gq.PQ_SUB + gq.PQ_N_QUERIES * gq.PQ_TOPK
    assert compare_frames(spdf, opdf, "pq_suite") == []
    adc = spdf[spdf.variant == "adc"]
    assert sorted(adc["rank"].tolist()) == sorted(
        float(r) for _ in range(gq.PQ_N_QUERIES) for r in range(1, gq.PQ_TOPK + 1)
    )
    # ADC never returns the query itself
    assert not any(adc.vec_id == adc.query_id)


def test_pq_adc_tracks_exact_distance(spark):
    """ADC is exact-query-vs-quantized-vector L2, so the triangle
    inequality gives a HARD bound: |sqrt(adc) - sqrt(exact)| <=
    sqrt(resid(x)) where resid(x) is x's total quantization error
    (the encode variant's dist summed over subspaces — the subspaces
    are an orthogonal decomposition, so the sums are true squared
    norms).  Verifies the lookup-sum really is distance-shaped, not
    just deterministic noise."""
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        _as_double_vec,
    )

    emb = read_parquet_table(spark, f"{SF001}/embeddings.parquet")
    suite = gq.pq_suite(spark, SF001).toPandas()
    adc = suite[suite.variant == "adc"]
    resid = (
        suite[suite.variant == "encode"].groupby("vec_id")["dist"].sum().to_dict()
    )
    vecs = {
        r.vec_id: r.v
        for r in emb.select(
            "vec_id", _as_double_vec("embedding").alias("v")
        ).collect()
    }
    assert len(adc) > 0
    for _, row in adc.iterrows():
        q, x = vecs[int(row.query_id)], vecs[int(row.vec_id)]
        exact = sum((a - b) * (a - b) for a, b in zip(q, x))
        assert row.dist >= 0.0
        # 1e-6 slop: ADC sums decimal(28,8)-rounded lookups
        assert abs(math.sqrt(row.dist) - math.sqrt(exact)) <= (
            math.sqrt(resid[int(row.vec_id)]) + 1e-6
        )


def test_ann_assign_suite_matches_duckdb_and_parts(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.ann_assign_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.ANN_ASSIGN_SUITE_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "ann_assign_suite") == []

    ivf = {
        r.vec_id: (r.cell, r.dist)
        for _, r in spdf[spdf.variant == "ivf"].iterrows()
    }
    for r in gq.ivf_assign(spark, SF).collect():
        cell, dist = ivf[r.vec_id]
        assert cell == float(r.centroid_id)
        assert math.isclose(dist, r.dist, rel_tol=0, abs_tol=0.0)
    routed = {
        r.vec_id: r.cell for _, r in spdf[spdf.variant == "routed"].iterrows()
    }
    for r in gq.routed_assign_embeddings(spark, SF).collect():
        assert routed[r.vec_id] == float(r.cell)
