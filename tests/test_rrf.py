"""Reciprocal Rank Fusion hybrid retrieval (pre-built r12): the fusion
operator must implement the SIGIR'09 formula exactly (hand-checked
fixture incl. absent-leg zeros and tie-breaks), the spec must match
its DuckDB oracle cell-exactly, and the fused pool must stay bounded
by the legs."""

from __future__ import annotations

from data_engineering_for_e_commerce_logistics_spark.operators import corpus
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)

SF = "/root/testdata/sf0.01"


def test_rrf_fuse_formula_and_ties(spark):
    """q0: item 7 sits in BOTH legs (ranks 3/2) and must beat every
    single-leg item incl. both rank-1s; items 1 (lex#1 only) and 2
    (sem#1 only) tie exactly at 1/61 — item-id breaks it."""
    lex = spark.createDataFrame(
        [(0, 1, 1), (0, 7, 3), (0, 9, 2), (1, 5, 1)],
        "query_id long, item_id long, rank int",
    )
    sem = spark.createDataFrame(
        [(0, 2, 1), (0, 7, 2), (1, 5, 1), (1, 6, 2)],
        "query_id long, item_id long, rank int",
    )
    got = {
        (r.query_id, r.item_id): (
            r.lex_rank,
            r.sem_rank,
            round(r.rrf_score, 12),
            r.rrf_rank,
        )
        for r in corpus.rrf_fuse({"lex": lex, "sem": sem}, c=60, k=10)
        .collect()
    }
    assert got[(0, 7)] == (3, 2, round(1 / 63 + 1 / 62, 12), 1)
    assert got[(0, 1)] == (1, None, round(1 / 61, 12), 2)  # id beats tie
    assert got[(0, 2)] == (None, 1, round(1 / 61, 12), 3)
    assert got[(0, 9)] == (2, None, round(1 / 62, 12), 4)
    # q1: item 5 in both legs at rank 1/1
    assert got[(1, 5)] == (1, 1, round(2 / 61, 12), 1)
    assert got[(1, 6)] == (None, 2, round(1 / 62, 12), 2)
    assert len(got) == 6


def test_hybrid_retrieval_rrf_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = xc.hybrid_retrieval_rrf(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(xc.HYBRID_RETRIEVAL_RRF_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "hybrid_retrieval_rrf") == []
    # exactly k fused results per query, pool bounded by the two legs
    per_q = spdf.groupby("query_id").size()
    assert set(per_q.index) == set(xc.RRF_QUERY_IDS)
    assert (per_q == xc.RRF_K).all()
    both = spdf.dropna(subset=["lex_rank", "sem_rank"])
    single = spdf[spdf.lex_rank.isna() | spdf.sem_rank.isna()]
    # any doc found by BOTH retrievers at pool-depth ranks must outrank
    # same-query docs found by one (2/(c+pool) > 1/(c+1) for pool=20,c=60)
    for q in xc.RRF_QUERY_IDS:
        b = both[both.query_id == q]
        s = single[single.query_id == q]
        if len(b) and len(s):
            assert b.rrf_score.min() > s.rrf_score.max() - 1e-12


def test_hybrid_retrieval_rrf_plan_shape(spark):
    plan = (
        xc.hybrid_retrieval_rrf(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
