"""Incremental SemDeDup — the fourth incremental-dedup family member
(semantic embeddings vs a persisted cell index): batch flows, the
zero-norm contract, replay screening, and the full DuckDB differential
for its r07 registry debut (same unit-first pattern the exact/minhash/
simhash families used in r04 and the routed SemDeDup trio in r05)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
    incremental_semdedup,
)

TAU = 0.9


@pytest.fixture(scope="module")
def centroids(spark):
    # two well-separated unit centroids on axes 0 and 1
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "centroid_id long, cv array<double>",
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_first_batch_within_batch_greedy(spark, centroids):
    """No index: only the within-batch drop-higher-id rule applies,
    chains included — vectors 1 and 2 both drop (0~1 and 1~2 fire even
    though 1 itself is dropped), 3 lives in the other cell."""
    b = _batch(
        spark,
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.01, 0.0]),
            (2, [1.0, 0.02, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
    )
    fresh, delta = incremental_semdedup(b, None, centroids, tau=TAU)
    assert sorted(r.vec_id for r in fresh.collect()) == [0, 3]
    d = {r.vec_id: r.cell for r in delta.collect()}
    assert d == {0: 0, 3: 1}


def test_cross_batch_screen_and_index_growth(spark, centroids):
    """Batch 2: a near-dup of an indexed vector drops, novel content
    survives and joins the index; the index is never rescanned as
    text/vectors — only the delta rows carry forward."""
    b1 = _batch(spark, [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])])
    _, delta1 = incremental_semdedup(b1, None, centroids, tau=TAU)
    b2 = _batch(
        spark,
        [
            (10, [1.0, 0.005, 0.0]),   # near-dup of indexed 0 -> drop
            (11, [0.6, 0.7, 0.39]),    # cell 1, cos vs indexed 1 = 0.70 -> keep
        ],
    )
    fresh, delta2 = incremental_semdedup(b2, delta1, centroids, tau=TAU)
    assert [r.vec_id for r in fresh.collect()] == [11]
    assert [r.vec_id for r in delta2.collect()] == [11]


def test_replay_screens_to_zero(spark, centroids):
    """Re-ingesting an already-indexed batch yields 0 fresh: identical
    vectors sit at cosine 1.0 >= tau regardless of id equality (the
    cross-batch screen has no id guard, unlike the within-batch rule)."""
    b1 = _batch(
        spark, [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.7, 0.7])]
    )
    fresh1, delta1 = incremental_semdedup(b1, None, centroids, tau=TAU)
    assert fresh1.count() == 3
    replay_fresh, _ = incremental_semdedup(b1, delta1, centroids, tau=TAU)
    assert replay_fresh.count() == 0


def test_zero_norm_vectors_always_kept(spark, centroids):
    """Cosine against a zero vector is NULL (nullif guard), never
    >= tau — content-free embeddings are a quality concern, not a
    dedup identity (mirrors the exact family's NULL-text contract)."""
    b1 = _batch(spark, [(0, [0.0, 0.0, 0.0])])
    _, delta1 = incremental_semdedup(b1, None, centroids, tau=TAU)
    b2 = _batch(spark, [(5, [0.0, 0.0, 0.0])])
    fresh, _ = incremental_semdedup(b2, delta1, centroids, tau=TAU)
    assert fresh.count() == 1


def test_incremental_semdedup_matches_duckdb_oracle(spark):
    """Full cross-engine differential for the r07 registry candidate:
    DuckDB replays assignment + both NOT EXISTS screens bit-exactly
    over the sf0.01 embeddings (batch 2 re-ingests 20% of batch 1
    verbatim, so the cross-batch screen provably fires)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from data_engineering_for_e_commerce_logistics_spark.plans import (
        graph_queries as gq,
    )
    from tests.oracle import compare_frames, duckdb_conn

    sf = "/root/testdata/sf0.01"
    conn = duckdb_conn(sf)
    try:
        opdf = conn.execute(gq.INCREMENTAL_SEMDEDUP_SQL).fetchdf()
    finally:
        conn.close()
    spdf = gq.incremental_semdedup_fresh(spark, sf).toPandas()
    # both screens must actually fire: fewer kept than ingested, but
    # batch-2 novel content must survive
    n_b2 = (spdf["ingest_batch"] == 2).sum()
    assert 0 < n_b2 < 350  # 350 = |b2| at sf0.01 (70% of 500)
    assert compare_frames(spdf, opdf, "incremental_semdedup_fresh") == []


def test_cross_batch_chain_screens_against_kept_only(spark, centroids):
    """Chain a~b in batch 1 (b dropped), then c in batch 2 near b but
    NOT near a: c is KEPT — the index holds only kept content, so
    there is nothing in the corpus c duplicates.  This deliberately
    diverges from the single-corpus greedy (which drops the higher id
    of any firing pair, dropped lower ids included); the docstring
    pins it as the ingest contract shared by all incremental
    families."""
    import math

    # unit vectors in the x-y plane at angles 0, 30, 60 degrees:
    # cos(a,b)=cos30=0.866 >= 0.8 (b drops); cos(b,c)=0.866 would
    # fire, but b is not indexed; cos(a,c)=cos60=0.5 < 0.8 -> c kept
    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0]

    tau = 0.8
    b1 = _batch(spark, [(0, at(0)), (1, at(30))])
    _, delta1 = incremental_semdedup(b1, None, centroids, tau=tau)
    assert [r.vec_id for r in delta1.collect()] == [0]  # b dropped
    b2 = _batch(spark, [(10, at(60))])
    fresh, _ = incremental_semdedup(b2, delta1, centroids, tau=tau)
    assert [r.vec_id for r in fresh.collect()] == [10]


def test_routed_assignment_mode_is_bit_identical(spark):
    """routed=True (two-stage assignment under routed_defaults' exact
    regime) makes every screen decision identically to the flat scan:
    same fresh ids, same index_delta rows, across a two-batch flow
    with a 64-centroid codebook (n_super=8, all supers probed)."""
    import random

    random.seed(7)
    k = 64
    dims = 8
    rows = [
        (i, [round(random.uniform(-1, 1), 3) for _ in range(dims)])
        for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    b1 = emb.where(F.col("vec_id") % 2 == 0)
    b2 = emb.where(F.col("vec_id") % 2 == 1)

    def run(routed):
        f1, d1 = incremental_semdedup(b1, None, cents, tau=0.8, routed=routed)
        d1 = d1.localCheckpoint()
        f2, d2 = incremental_semdedup(b2, d1, cents, tau=0.8, routed=routed)
        return (
            sorted(r.vec_id for r in f1.collect()),
            sorted(r.vec_id for r in f2.collect()),
            sorted((r.vec_id, r.cell) for r in d1.collect()),
            sorted((r.vec_id, r.cell) for r in d2.collect()),
        )

    assert run(False) == run(True) == run("auto")


def test_auto_routed_resolution_by_codebook_size(spark):
    """routed="auto" (the default, VERDICT r07 ask #8) plans the flat
    broadcast scan for codebooks at or under ROUTED_EXACT_MAX_SUPERS
    and the two-stage routed assignment (observable as the ``__sid``
    coarse-route join) past it — while staying bit-identical either
    way in the exact regime."""
    import random

    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        ROUTED_EXACT_MAX_SUPERS,
    )

    random.seed(11)
    rows = [
        (i, [round(random.uniform(-1, 1), 3) for _ in range(6)])
        for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def plan_for(k):
        cents = emb.where(F.col("vec_id") < k).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
        )
        _, delta = incremental_semdedup(emb, None, cents, tau=0.95)
        return delta._jdf.queryExecution().executedPlan().toString()

    assert "__sid" not in plan_for(ROUTED_EXACT_MAX_SUPERS)  # flat regime
    assert "__sid" in plan_for(ROUTED_EXACT_MAX_SUPERS + 8)  # routed regime

    with pytest.raises(ValueError, match="routed"):
        cents = emb.limit(4).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
        )
        incremental_semdedup(emb, None, cents, tau=0.9, routed="yes")
