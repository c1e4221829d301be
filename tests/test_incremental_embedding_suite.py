"""The embedding-side half of the r14 consolidation (pre-built r12):
the semantic (full-vector index) and PQ (compressed-code index)
incremental ingest flows union under one suite built from ONE cached
embeddings scan with shared centroids and batch splits — every
retiring spec's output cell preserved bit-exactly against both the
standalone builders and the DuckDB oracle."""

from __future__ import annotations

from data_engineering_for_e_commerce_logistics_spark.plans import (
    graph_queries as gq,
)

SF = "/root/testdata/sf0.01"


def test_incremental_embedding_suite_matches_duckdb_and_parts(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.incremental_embedding_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.INCREMENTAL_EMBEDDING_SUITE_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "incremental_embedding_suite") == []

    for variant, builder in (
        ("semantic", gq.incremental_semdedup_fresh),
        ("pq", gq.incremental_pq_fresh),
    ):
        leg = {
            r.vec_id: (r.cell, r.ingest_batch)
            for _, r in spdf[spdf.variant == variant].iterrows()
        }
        got = builder(spark, SF).collect()
        assert len(got) == len(leg) > 0, variant
        for r in got:
            assert leg[r.vec_id] == (r.cell, r.ingest_batch), (
                variant,
                r.vec_id,
            )
