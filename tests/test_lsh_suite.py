"""One-mine LSH forensics suite (pre-built r13): every leg's cells
must be bit-identical to its standalone spec (pairs/clusters ↔
minhash_cluster_suite, ledger ↔ dedup_retention_ledger, sweep ↔
dedup_threshold_sweep), the union must match the DuckDB oracle
bitwise, and the mine must be cached once."""

import pandas as pd

from data_engineering_for_e_commerce_logistics_spark.plans import (
    graph_queries as gq,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def test_suite_equals_parts(spark):
    suite = gq.lsh_forensics_suite(spark, SF).toPandas()

    mc = gq.minhash_cluster_suite(spark, SF).toPandas()
    p = (
        suite[suite.variant == "pairs"]
        .rename(columns={"k1": "id_a", "k2": "id_b", "v1": "jaccard"})[
            ["id_a", "id_b", "jaccard"]
        ]
    )
    mp = mc[mc.variant == "pairs"][["id_a", "id_b", "jaccard"]]
    assert compare_frames(p, mp, "suite-pairs-leg") == []

    c = (
        suite[suite.variant == "clusters"]
        .rename(columns={"k1": "doc_id", "k2": "cluster_id"})[
            ["doc_id", "cluster_id"]
        ]
    )
    mcc = mc[mc.variant == "clusters"][["doc_id", "cluster_id"]].astype(
        {"doc_id": "int64", "cluster_id": "int64"}
    )
    assert compare_frames(
        c.astype({"doc_id": "int64", "cluster_id": "int64"}),
        mcc,
        "suite-clusters-leg",
    ) == []

    led = gq.dedup_retention_ledger(spark, SF).toPandas()
    l_ = suite[suite.variant == "ledger"].rename(
        columns={
            "s": "source", "n1": "n_docs", "n2": "n_tokens",
            "n3": "exact_kept", "n4": "exact_tokens", "n5": "near_kept",
            "n6": "near_tokens", "n7": "final_kept", "n8": "final_tokens",
            "v1": "doc_retention", "v2": "token_retention",
        }
    )[list(led.columns)]
    assert compare_frames(l_, led, "suite-ledger-leg") == []

    sw = gq.dedup_threshold_sweep(spark, SF).toPandas()
    s_ = suite[suite.variant == "sweep"].rename(
        columns={
            "v1": "threshold", "n1": "n_pairs",
            "n2": "n_docs_affected", "n3": "n_removed", "v2": "dup_rate",
        }
    )[list(sw.columns)]
    assert compare_frames(s_, sw, "suite-sweep-leg") == []


def test_lsh_suite_matches_duckdb(spark):
    spdf = gq.lsh_forensics_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(gq.LSH_FORENSICS_SQL).fetchdf()
    conn.close()
    assert compare_frames(spdf, opdf, "lsh_forensics_suite") == []


def test_suite_one_cached_mine(spark):
    """Plan guard: the banded mine and the corpus scan are cached —
    the four legs read InMemoryTableScans, and nothing cartesians
    (the 5-row threshold broadcast is the legitimate
    nested-loop-over-bounded-side form)."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, gq.lsh_forensics_suite)
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 4
