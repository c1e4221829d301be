"""Leakage-safe cluster split (pre-built r12): every near-dup cluster
must land whole in one split (the invariant the 'leak' leg states),
singletons must reproduce the plain hash split, and the spec must
match its DuckDB oracle — which re-derives the clusters through the
WITH RECURSIVE LSH chain, so cluster parity is re-proven, not
assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators import corpus
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)

SF = "/root/testdata/sf0.01"


def test_cluster_members_share_split_and_singletons_match_plain(spark):
    """Synthetic map: docs 0-9 in cluster 0, docs 10-14 in cluster 10,
    docs 15-29 unclustered.  Members inherit the representative's
    split; unclustered docs get exactly split_assign's own draw."""
    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    clusters = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(i, 10) for i in range(10, 15)],
        "doc_id long, cluster_id long",
    )
    out = corpus.cluster_safe_split(docs, clusters).collect()
    by_id = {r.doc_id: r for r in out}
    assert len({by_id[i].split for i in range(10)}) == 1
    assert len({by_id[i].split for i in range(10, 15)}) == 1
    plain = {
        r.doc_id: r.split
        for r in corpus.split_assign(
            spark.range(15, 30).select(F.col("id").alias("doc_id"))
        ).collect()
    }
    for i in range(15, 30):
        assert by_id[i].split == plain[i], i
        assert by_id[i].cluster_key == i


def test_cluster_safe_split_no_leak_on_fixture(spark):
    out = xc.cluster_safe_split_documents(spark, SF).toPandas()
    leak = out[out.variant == "leak"]
    assert len(leak) == 1 and leak.n_clusters.iloc[0] == 0
    docs = out[out.variant == "doc"]
    # direct recomputation of the invariant from the doc rows
    assert (docs.groupby("cluster_key").split.nunique() <= 1).all()
    audit = out[out.variant == "audit"]
    assert audit.n_docs.sum() == len(docs)
    # hash split fractions hold loosely over clusters (13/2/1 of 16)
    tr = audit[audit.split == "train"].n_clusters.iloc[0]
    assert tr / audit.n_clusters.sum() > 0.6


def test_cluster_safe_split_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = xc.cluster_safe_split_documents(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(xc.CLUSTER_SAFE_SPLIT_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "cluster_safe_split_documents") == []


def test_cluster_safe_split_plan_shape(spark):
    df = xc.cluster_safe_split_documents(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
