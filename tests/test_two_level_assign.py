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


def test_routed_defaults_regimes(emb, centroids):
    """The measured default (SCALE.md r07): small coarse level →
    exact two-stage (n_probe = n_super, recall 1.0 by construction);
    large coarse level → trained supers + 80% probe.  The small-k
    branch must literally reproduce the flat assignment."""
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        routed_defaults,
    )

    small = routed_defaults(10)
    assert small == {"n_probe": 10, "train_supers": 0, "exact_means": True}
    large = routed_defaults(100)
    assert large == {"n_probe": 80, "train_supers": 1, "exact_means": True}

    got = {
        r.vec_id: r.cell
        for r in two_level_assign(
            emb, centroids, n_super=4, **routed_defaults(4)
        ).collect()
    }
    vecs = emb.select("vec_id", _as_double_vec("embedding").alias("v"))
    cents = centroids.select(
        F.col("centroid_id").alias("__cid"), _as_double_vec("cv").alias("__cv")
    )
    want = {r.vec_id: r.cell for r in _flat_assign(vecs, cents).collect()}
    assert got == want


def test_semdedup_prune_keep_lowest_and_chains(spark):
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        semdedup_prune,
    )

    corpus = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "vec_id int, payload string"
    )
    # chain 0~1~2 (all >= tau), isolated pair 3~4 below tau, 5 alone
    pairs = spark.createDataFrame(
        [(0, 1, 0.99), (1, 2, 0.97), (3, 4, 0.5)],
        "id_a int, id_b int, cosine double",
    )
    kept = sorted(
        r.vec_id for r in semdedup_prune(corpus, pairs, tau=0.9).collect()
    )
    # 1 and 2 drop (higher side of a >=tau pair); 3,4 survive (below tau)
    assert kept == [0, 3, 4, 5]


def test_two_level_assign_matches_duckdb_oracle(spark, emb, centroids):
    """Full cross-engine differential for the coarse-routed assignment
    (pre-registration evidence for its r06 registry debut): DuckDB
    replays supers → grouping → routing → within-group nearest with
    the same strict-fold distance and (dist asc, id asc) ties."""
    import duckdb

    got = sorted(
        map(tuple, two_level_assign(emb, centroids, n_super=4).collect())
    )
    dist = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
    )
    sql = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM read_parquet('{SF}/embeddings.parquet')
),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
s AS (SELECT cid AS sid, cv AS sv FROM c WHERE cid < 4),
grouped AS (
  SELECT sid, cid, cv FROM (
    SELECT s.sid, c.cid, c.cv, row_number() OVER (
        PARTITION BY c.cid
        ORDER BY {dist.format(a='c.cv', b='s.sv')} ASC, s.sid ASC) AS rn
    FROM c, s) WHERE rn = 1
),
routed AS (
  SELECT vec_id, v, sid FROM (
    SELECT e.vec_id, e.v, s.sid, row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {dist.format(a='e.v', b='s.sv')} ASC, s.sid ASC) AS rn
    FROM e, s) WHERE rn <= 2  -- default n_probe
)
SELECT vec_id, cell FROM (
  SELECT r.vec_id, g.cid AS cell, row_number() OVER (
      PARTITION BY r.vec_id
      ORDER BY {dist.format(a='r.v', b='g.cv')} ASC, g.cid ASC) AS rn
  FROM routed r JOIN grouped g USING (sid)) WHERE rn = 1
"""
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def test_trained_supers_lift_agreement(emb, centroids):
    """train_supers Lloyd rounds over the centroid set must not hurt —
    and on this clustered corpus measurably help — agreement with the
    exact assignment at the same n_probe."""
    vecs = emb.select("vec_id", _as_double_vec("embedding").alias("v"))
    cents = centroids.select(
        F.col("centroid_id").alias("__cid"), _as_double_vec("cv").alias("__cv")
    )
    want = {r.vec_id: r.cell for r in _flat_assign(vecs, cents).collect()}
    n = len(want)

    def agreement(**kw):
        got = {
            r.vec_id: r.cell for r in two_level_assign(emb, centroids, **kw).collect()
        }
        return sum(1 for k in want if got.get(k) == want[k]) / n

    seeded = agreement(n_probe=2, train_supers=0)
    trained = agreement(n_probe=2, train_supers=3)
    assert trained >= seeded - 0.02, (seeded, trained)


def test_semdedup_routed_pairs_matches_duckdb_oracle(spark):
    """Full differential for the routed SemDeDup composition (r06
    registry candidate): seed centroids → multi-probe routed
    assignment → per-cell top-k pairs, replayed bit-exactly by
    SEMDEDUP_ROUTED_PAIRS_SQL."""
    import sys

    sys.path.insert(0, "/root/repo")
    from data_engineering_for_e_commerce_logistics_spark.plans import (
        graph_queries as gq,
    )
    from tests.oracle import compare_frames, duckdb_conn

    sf = "/root/testdata/sf0.01"
    conn = duckdb_conn(sf)
    try:
        opdf = conn.execute(gq.SEMDEDUP_ROUTED_PAIRS_SQL).fetchdf()
    finally:
        conn.close()
    spdf = gq.semdedup_routed_pairs(spark, sf).toPandas()
    assert compare_frames(spdf, opdf, "semdedup_routed_pairs") == []


def test_semdedup_keep_matches_duckdb_oracle(spark):
    """End-to-end SemDeDup prune (r06 candidate): pair mining + the
    keep-set anti join, replayed by SEMDEDUP_KEEP_SQL — at the chosen
    tau the drop path fires (some rows ARE removed), so the
    differential covers both kept and dropped sides."""
    import sys

    sys.path.insert(0, "/root/repo")
    from data_engineering_for_e_commerce_logistics_spark.plans import (
        graph_queries as gq,
    )
    from tests.oracle import compare_frames, duckdb_conn

    sf = "/root/testdata/sf0.01"
    conn = duckdb_conn(sf)
    try:
        opdf = conn.execute(gq.SEMDEDUP_KEEP_SQL).fetchdf()
    finally:
        conn.close()
    spdf = gq.semdedup_keep(spark, sf).toPandas()
    assert len(spdf) < 500  # the prune actually dropped something
    assert compare_frames(spdf, opdf, "semdedup_keep") == []
