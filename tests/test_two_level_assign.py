"""Two-level (coarse-routed) centroid assignment: exactness in the
degenerate configuration, measured recall vs flat assignment at the
default sqrt(k) routing, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
    _as_double_vec,
    _fold_sum,
    two_level_assign,
)

SF = "/root/testdata/sf0.001"


def _flat_assign(vecs, cents, id_col="vec_id"):
    """Reference: exact nearest centroid by broadcast scan (the n·k
    plan two_level_assign approximates)."""
    scored = F.broadcast(cents).crossJoin(vecs).withColumn(
        "__dist",
        _fold_sum(
            F.zip_with(F.col("v"), F.col("__cv"), lambda x, y: (x - y) * (x - y))
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__dist").asc(), F.col("__cid").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col("__cid").alias("cell"))
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(emb):
    # deterministic seed convention: first 16 vectors are the codebook
    return (
        emb.filter(F.col("vec_id") < 16)
        .select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv"))
    )


def test_exact_when_every_centroid_is_a_super(emb, centroids):
    got = {
        r.vec_id: r.cell
        for r in two_level_assign(emb, centroids, n_super=16).collect()
    }
    vecs = emb.select("vec_id", _as_double_vec("embedding").alias("v"))
    cents = centroids.select(
        F.col("centroid_id").alias("__cid"), _as_double_vec("cv").alias("__cv")
    )
    want = {r.vec_id: r.cell for r in _flat_assign(vecs, cents).collect()}
    assert got == want


def test_default_routing_recall_and_totality(emb, centroids):
    """sqrt(k) routing must assign EVERY vector exactly once, and most
    assignments should agree with the exact flat scan (mis-routes are
    the documented approximation)."""
    out = two_level_assign(emb, centroids)  # n_super = ceil(sqrt(16)) = 4
    rows = out.collect()
    n = emb.count()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n
    vecs = emb.select("vec_id", _as_double_vec("embedding").alias("v"))
    cents = centroids.select(
        F.col("centroid_id").alias("__cid"), _as_double_vec("cv").alias("__cv")
    )
    want = {r.vec_id: r.cell for r in _flat_assign(vecs, cents).collect()}
    agree = sum(1 for r in rows if want[r.vec_id] == r.cell)
    assert agree / n >= 0.5, f"recall {agree / n:.2f}"


def test_two_level_assign_deterministic(emb, centroids):
    a = sorted(map(tuple, two_level_assign(emb, centroids).collect()))
    b = sorted(map(tuple, two_level_assign(emb, centroids).collect()))
    assert a == b
