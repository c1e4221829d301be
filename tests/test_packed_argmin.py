"""Packed-quantizer argmin (r11): the map-only
``array_min(transform(...))`` form must pick EXACTLY the row the
broadcast-join + ``row_number`` window form picked — same
(dist asc, id asc) tie-break, same strict-left-fold doubles.  Ten
call sites (incremental PQ/semdedup, PQ train/encode, kmeans, IVF
assigns) lean on this equivalence, so it gets its own differential
on adversarial data: duplicated centroids (exact distance ties,
resolved by id) and duplicated vectors.

A second pin records the REJECTED variant's lesson (SCALE.md r11):
Catalyst performs no common-subexpression elimination inside
higher-order-function lambdas, so an outer expression referenced in
a lambda body re-evaluates per element — the packed
``two_level_assign`` paid the per-row super ranking O(k) times and
was reverted.  The pin here is semantic, not perf: the window form
and ``_pack_rows`` helpers stay consistent under ties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
    _nearest_packed,
    _pack_rows,
)


@pytest.fixture(scope="module")
def frames(spark):
    # vectors: includes exact duplicates (ids 4 and 5) and a vector
    # equidistant to two centroids (id 6 sits midway between c0/c1)
    vecs = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 0.0]),
            (2, [0.1, -0.2]),
            (3, [9.9, 0.3]),
            (4, [5.0, 5.0]),
            (5, [5.0, 5.0]),
            (6, [5.0, 0.0]),
        ],
        "vec_id long, v array<double>",
    )
    # centroids: c2 DUPLICATES c0 (every distance ties; id must win)
    cents = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 0.0]),
            (2, [0.0, 0.0]),
        ],
        "cid long, cv array<double>",
    )
    return vecs, cents


def _window_argmin(vecs, cents):
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        _sq_dist,
    )

    scored = F.broadcast(cents).crossJoin(vecs).withColumn(
        "dist", _sq_dist(F.col("v"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"), "dist")
    )


def _packed_argmin(vecs, cents):
    return (
        vecs.crossJoin(F.broadcast(_pack_rows(cents, "cid", "cv")))
        .withColumn(
            "best", _nearest_packed(F.col("v"), F.col("__packed"), "cid", "cv")
        )
        .select(
            "vec_id",
            F.col("best.id").alias("cell"),
            F.col("best.dist").alias("dist"),
        )
    )


def test_packed_matches_window_under_ties(frames):
    vecs, cents = frames
    got = {r["vec_id"]: (r["cell"], r["dist"]) for r in _packed_argmin(vecs, cents).collect()}
    want = {r["vec_id"]: (r["cell"], r["dist"]) for r in _window_argmin(vecs, cents).collect()}
    assert got == want
    # the duplicated-centroid tie resolves to the LOWER id for every
    # vector nearest c0/c2
    assert got[0][0] == 0 and got[2][0] == 0
    # the equidistant vector (25.0 to both c0 and c1) takes c0
    assert got[6] == (0, 25.0)


def test_packed_matches_window_on_real_embeddings(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = vecs.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    got = _packed_argmin(vecs, cents).orderBy("vec_id").collect()
    want = _window_argmin(vecs, cents).orderBy("vec_id").collect()
    assert [(r["vec_id"], r["cell"]) for r in got] == [
        (r["vec_id"], r["cell"]) for r in want
    ]
    # doubles bitwise equal (strict left fold on both paths)
    assert [r["dist"] for r in got] == [r["dist"] for r in want]


def test_pack_rows_is_deterministic_and_sorted(spark, frames):
    vecs, cents = frames
    a = _pack_rows(cents, "cid", "cv").collect()[0]["__packed"]
    b = _pack_rows(cents.repartition(7), "cid", "cv").collect()[0]["__packed"]
    assert [r["cid"] for r in a] == [0, 1, 2]
    assert a == b  # partitioning never changes the packed order
