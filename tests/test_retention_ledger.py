"""Per-source dedup retention ledger (pre-built r13): hand-planted
exact copies and injected near-dup pair evidence produce exactly the
hand-computed ledger, an all-unique corpus retains 1.0 everywhere,
the final stage never exceeds either single stage, the sf0.01 result
matches the recursive-CTE DuckDB oracle bitwise, and the plan keeps
the one-cached-scan / no-all-pairs shape."""

from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators.dedup import (
    retention_ledger,
)
from data_engineering_for_e_commerce_logistics_spark.plans import (
    graph_queries as gq,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_hand_computed_ledger(spark):
    """Source 'a': docs 0,1 exact copies (2 tokens each) + unique doc
    2 (3 tokens); source 'b': docs 10,11 near-dups by injected pair
    evidence (4 tokens each).  Exact stage drops doc 1; near stage
    drops doc 11; intersection keeps {0, 2, 10}."""
    docs = _docs(
        spark,
        [
            (0, "a", "x y"),
            (1, "a", "x y"),
            (2, "a", "p q r"),
            (10, "b", "k l m n"),
            (11, "b", "k l m o"),
        ],
    )
    out = {
        r.source: r
        for r in retention_ledger(
            docs, _pairs(spark, [(10, 11)])
        ).collect()
    }
    a, b = out["a"], out["b"]
    assert (a.n_docs, a.n_tokens) == (3, 7)
    assert (a.exact_kept, a.exact_tokens) == (2, 5)
    assert (a.near_kept, a.near_tokens) == (3, 7)  # no pair evidence
    assert (a.final_kept, a.final_tokens) == (2, 5)
    assert abs(a.doc_retention - 2 / 3) < 1e-9
    assert (b.n_docs, b.exact_kept, b.near_kept, b.final_kept) == (
        2,
        2,
        1,
        1,
    )
    assert b.final_tokens == 4
    assert b.doc_retention == 0.5


def test_all_unique_retains_everything(spark):
    docs = _docs(
        spark, [(i, f"s{i % 2}", f"tok{i} alpha beta") for i in range(8)]
    )
    out = retention_ledger(docs, _pairs(spark, [])).collect()
    for r in out:
        assert r.final_kept == r.n_docs
        assert r.doc_retention == 1.0
        assert r.token_retention == 1.0


def test_final_never_exceeds_either_stage(spark):
    """Flag-intersection law on the real sf0.01 corpus: final ≤
    min(exact, near) per source, tokens included."""
    for r in gq.dedup_retention_ledger(spark, SF).collect():
        assert r.final_kept <= min(r.exact_kept, r.near_kept)
        assert r.final_tokens <= min(r.exact_tokens, r.near_tokens)
        assert 0.0 < r.doc_retention <= 1.0


def test_cluster_chain_keeps_one_representative(spark):
    """A 3-doc near-dup CHAIN (0-1, 1-2) across two sources: one
    component, representative = min id 0 — sources lose exactly the
    docs whose component min lives elsewhere (cross-source dup
    attribution, the ledger's whole point)."""
    docs = _docs(
        spark,
        [(0, "a", "w x"), (1, "b", "w x y"), (2, "b", "w x y z")],
    )
    out = {
        r.source: r
        for r in retention_ledger(
            docs, _pairs(spark, [(0, 1), (1, 2)])
        ).collect()
    }
    assert out["a"].near_kept == 1  # doc 0 is the representative
    assert out["b"].near_kept == 0  # both b docs lose to doc 0
    assert out["b"].final_kept == 0


def test_retention_ledger_matches_duckdb(spark):
    spdf = gq.dedup_retention_ledger(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(gq.DEDUP_RETENTION_SQL).fetchdf()
    conn.close()
    assert len(spdf) == 20
    assert compare_frames(spdf, opdf, "dedup_retention_ledger") == []


def test_ledger_plan_shape(spark):
    """100 TB guard: the documents scan is cached once (miner + base
    legs), pair evidence comes from banded LSH (no cartesian), and
    the ledger's own exchanges are digest / id / source keyed."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, gq.dedup_retention_ledger)
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan
    assert "hashpartitioning(__fp" in plan
    assert "hashpartitioning(__grp" in plan
