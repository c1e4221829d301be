"""Hard-negative mining (pre-built r12): the mined set must be
exactly lex-pool ∖ sem-pool with lex-ordered dense ranks (independent
set-algebra check against the two legs), and the spec must match its
DuckDB oracle cell-exactly — the oracle reuses the RRF query's leg
CTEs verbatim, so leg parity is inherited, not re-proven."""

from __future__ import annotations

from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)

SF = "/root/testdata/sf0.01"


def test_hard_negatives_are_lex_minus_sem(spark):
    """Set algebra against the legs themselves: flagged rows are
    exactly the lexical pool minus the semantic pool, every query
    keeps its full lexical pool, and hn_rank is dense in lex order."""
    from pyspark.sql import functions as F

    from data_engineering_for_e_commerce_logistics_spark.operators import (
        corpus,
        similarity,
        text,
    )
    from data_engineering_for_e_commerce_logistics_spark.catalog import (
        load_tables,
    )

    out = xc.hard_negative_mining(spark, SF).toPandas()

    docs = load_tables(spark, SF, ("documents",))["documents"]
    emb = load_tables(spark, SF, ("embeddings",))["embeddings"]
    lex = {
        (r.query_id, r.doc_id)
        for r in corpus.bm25_topk(
            docs,
            xc.RRF_QUERY_IDS,
            k=xc.RRF_POOL,
            k1=xc.BM25_K1,
            b=xc.BM25_B,
        ).collect()
    }
    sem = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(
            emb, query_ids=xc.RRF_QUERY_IDS, k=xc.RRF_POOL
        ).collect()
    }
    got_all = {(r.query_id, r.item_id) for _, r in out.iterrows()}
    got_hn = {
        (r.query_id, r.item_id)
        for _, r in out.iterrows()
        if r.is_hard_negative
    }
    assert got_all == lex  # the full lexical pool survives
    assert got_hn == lex - sem  # the mined set is exactly the difference

    # dense lex-ordered ranks within each query's hard negatives
    for qid, grp in out[out.is_hard_negative].groupby("query_id"):
        g = grp.sort_values("lex_rank")
        assert list(g.hn_rank) == list(range(1, len(g) + 1)), qid
    assert out[~out.is_hard_negative].hn_rank.isna().all()


def test_hard_negative_mining_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = xc.hard_negative_mining(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(xc.HARD_NEGATIVE_MINING_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "hard_negative_mining") == []
    assert spdf.is_hard_negative.any()  # the fixture actually mines some


def test_hard_negative_mining_plan_shape(spark):
    """Both legs keep their bounded shapes: no cartesian, no Python,
    broadcast joins only around the query-side frames."""
    df = xc.hard_negative_mining(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
