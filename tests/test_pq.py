"""Product quantization + ANN-assign suite: the pre-built r11 trade
(plans/queries.py docstring).  pq_suite must match its generated
DuckDB oracle cell-exact; ann_assign_suite must reproduce BOTH
retiring specs' outputs from one shared scan and match DuckDB."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.catalog import read_parquet_table
from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
    pq_train_encode,
)
from data_engineering_for_e_commerce_logistics_spark.plans import graph_queries as gq

SF001 = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.01"


def test_pq_encode_shape_and_lloyd_invariant(spark):
    """Every vector gets one code per subspace, codes come from the
    seed id range, and the refined codebook never quantizes worse
    than the seed codebook (each Lloyd half-step minimizes SSE)."""
    emb = read_parquet_table(spark, f"{SF001}/embeddings.parquet")
    n = emb.count()
    codes1, cb1 = pq_train_encode(emb, dim=64, n_sub=4, k=8, n_refine=1)
    rows = codes1.collect()
    assert len(rows) == n * 4
    assert all(0 <= r.code < 8 for r in rows)
    assert all(r.dist >= 0.0 for r in rows)
    # deterministic across runs
    again = {
        (r.vec_id, r.m): r.code
        for r in pq_train_encode(emb, dim=64, n_sub=4, k=8, n_refine=1)[0].collect()
    }
    assert all(again[(r.vec_id, r.m)] == r.code for r in rows)
    codes0, _ = pq_train_encode(emb, dim=64, n_sub=4, k=8, n_refine=0)
    err0 = codes0.agg(F.sum("dist")).first()[0]
    err1 = codes1.agg(F.sum("dist")).first()[0]
    assert err1 <= err0 + 1e-9


def test_pq_suite_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.pq_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.PQ_SUITE_SQL).fetchdf()
    finally:
        conn.close()
    n_vec = int((spdf.variant == "encode").sum()) // gq.PQ_SUB
    assert len(spdf) == n_vec * gq.PQ_SUB + 2 * gq.PQ_N_QUERIES * gq.PQ_TOPK
    assert compare_frames(spdf, opdf, "pq_suite") == []
    for variant in ("adc", "rerank"):
        part = spdf[spdf.variant == variant]
        assert sorted(part["rank"].tolist()) == sorted(
            float(r)
            for _ in range(gq.PQ_N_QUERIES)
            for r in range(1, gq.PQ_TOPK + 1)
        ), variant
        # neither stage ever returns the query itself
        assert not any(part.vec_id == part.query_id), variant


def test_pq_adc_tracks_exact_distance(spark):
    """ADC is exact-query-vs-quantized-vector L2, so the triangle
    inequality gives a HARD bound: |sqrt(adc) - sqrt(exact)| <=
    sqrt(resid(x)) where resid(x) is x's total quantization error
    (the encode variant's dist summed over subspaces — the subspaces
    are an orthogonal decomposition, so the sums are true squared
    norms).  Verifies the lookup-sum really is distance-shaped, not
    just deterministic noise."""
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        _as_double_vec,
    )

    emb = read_parquet_table(spark, f"{SF001}/embeddings.parquet")
    suite = gq.pq_suite(spark, SF001).toPandas()
    adc = suite[suite.variant == "adc"]
    resid = (
        suite[suite.variant == "encode"].groupby("vec_id")["dist"].sum().to_dict()
    )
    vecs = {
        r.vec_id: r.v
        for r in emb.select(
            "vec_id", _as_double_vec("embedding").alias("v")
        ).collect()
    }
    assert len(adc) > 0
    for _, row in adc.iterrows():
        q, x = vecs[int(row.query_id)], vecs[int(row.vec_id)]
        exact = sum((a - b) * (a - b) for a, b in zip(q, x))
        assert row.dist >= 0.0
        # 1e-6 slop: ADC sums decimal(28,8)-rounded lookups
        assert abs(math.sqrt(row.dist) - math.sqrt(exact)) <= (
            math.sqrt(resid[int(row.vec_id)]) + 1e-6
        )
    # the refine stage's distances are EXACT L2, and re-ranking the
    # shortlist never does worse than raw ADC order against exact
    # ground truth (the whole point of the two-stage shape)
    rerank = suite[suite.variant == "rerank"]
    by_q = {}
    for vid, v in vecs.items():
        for qid in range(gq.PQ_N_QUERIES):
            if vid == qid:
                continue
            d = sum((a - b) * (a - b) for a, b in zip(vecs[qid], v))
            by_q.setdefault(qid, []).append((d, vid))
    recall = {"adc": 0, "rerank": 0}
    for qid, ds in by_q.items():
        gt = {vid for _, vid in sorted(ds)[: gq.PQ_TOPK]}
        for name, part in (("adc", adc), ("rerank", rerank)):
            got = set(part[part.query_id == qid].vec_id.astype(int))
            recall[name] += len(gt & got)
    assert recall["rerank"] >= recall["adc"]
    for _, row in rerank.iterrows():
        q, x = vecs[int(row.query_id)], vecs[int(row.vec_id)]
        exact = sum((a - b) * (a - b) for a, b in zip(q, x))
        assert math.isclose(row.dist, exact, rel_tol=1e-12, abs_tol=1e-12)


def test_ann_assign_suite_matches_duckdb_and_parts(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.ann_assign_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.ANN_ASSIGN_SUITE_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "ann_assign_suite") == []

    ivf = {
        r.vec_id: (r.cell, r.dist)
        for _, r in spdf[spdf.variant == "ivf"].iterrows()
    }
    for r in gq.ivf_assign(spark, SF).collect():
        cell, dist = ivf[r.vec_id]
        assert cell == float(r.centroid_id)
        assert math.isclose(dist, r.dist, rel_tol=0, abs_tol=0.0)
    routed = {
        r.vec_id: r.cell for _, r in spdf[spdf.variant == "routed"].iterrows()
    }
    for r in gq.routed_assign_embeddings(spark, SF).collect():
        assert routed[r.vec_id] == float(r.cell)


def test_ivfpq_suite_matches_duckdb(spark):
    """The r12 debut: IVF-PQ must match its generated oracle
    cell-exact and honor the probed-cell candidate restriction.
    (No tighter-than-raw-PQ assertion: residuals only concentrate
    energy when the coarse quantizer captures real structure — on
    this i.i.d. synthetic corpus var(x - c) > var(x), measured 531
    vs 423 total squared error, so the textbook win is corpus-
    dependent and documented rather than asserted.)"""
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.ivfpq_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.IVFPQ_SUITE_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "ivfpq_suite") == []

    enc = spdf[spdf.variant == "encode"]
    assert (enc.dist >= 0.0).all()
    owning = {
        int(r.vec_id): r.cell for _, r in enc.iterrows() if r.m == 0.0
    }
    adc = spdf[spdf.variant == "adc"]
    assert len(adc) > 0
    for qid, part in adc.groupby("query_id"):
        assert len(part) <= gq.PQ_TOPK
        assert not any(part.vec_id == int(qid))
        hit_cells = {owning[int(v)] for v in part.vec_id}
        assert len(hit_cells) <= gq.IVFPQ_PROBE


def test_semdedup_suite_matches_duckdb_and_parts(spark):
    """The r12 consolidation: ONE cached miner pass must serve both
    retiring specs' rows verbatim, and match the DuckDB oracle."""
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.semdedup_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.SEMDEDUP_SUITE_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "semdedup_suite") == []

    pairs = {
        (r.id_a, r.id_b): (r.cell, r.pair_rank, r.cosine)
        for _, r in spdf[spdf.variant == "pairs"].iterrows()
    }
    got = gq.semdedup_pairs(spark, SF).collect()
    assert len(got) == len(pairs)
    for r in got:
        cell, rank, cos = pairs[(r.id_a, r.id_b)]
        assert (cell, rank) == (float(r.cell), float(r.pair_rank))
        assert math.isclose(cos, r.cosine, rel_tol=0, abs_tol=0)
    keep = {
        r.vec_id: r.label for _, r in spdf[spdf.variant == "keep"].iterrows()
    }
    got_keep = gq.semdedup_keep(spark, SF).collect()
    assert len(got_keep) == len(keep)
    for r in got_keep:
        assert keep[r.vec_id] == float(r.label)


# --- Embedding standardization (r17 debut candidate) -------------------------


def test_standardize_embeddings_suite_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.standardize_embeddings_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.STANDARDIZE_EMBEDDINGS_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "standardize_embeddings_suite") == []
    assert (spdf.variant == "stats").sum() == gq.EMB_DIM
    assert (spdf.variant == "vector").sum() > 0


def test_standardize_embeddings_moments_and_zero_spread(spark):
    """After the transform every dimension has mean ~0 / std ~1 (the
    operator's contract), and a constant dimension maps to exactly
    0.0 — never NULL/inf."""
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        standardize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 7.0, float(i % 3)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    out, stats = standardize_embeddings(df)
    st = {r.dim: r for r in stats.collect()}
    assert st[1].std == 0.0  # the constant dimension
    rows = out.collect()
    vals = {d: [r.embedding[d] for r in rows] for d in range(3)}
    assert all(v == 0.0 for v in vals[1])
    for d in (0, 2):
        n = len(vals[d])
        mean = sum(vals[d]) / n
        var = sum(x * x for x in vals[d]) / n - mean * mean
        assert abs(mean) < 1e-12
        assert abs(var - 1.0) < 1e-9


def test_kcenter_seed_properties(spark):
    """Farthest-point seeding on a constructed 3-cluster fixture:
    every well-separated cluster receives a seed (first-k-ids puts
    all three in cluster A), the covering-radius sequence is
    non-increasing, and the selection is deterministic."""
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        kcenter_seed,
    )

    rows = []
    # cluster A at (0,0), B at (100,0), C at (0,100); ids ordered so
    # the first 3 ids are ALL in cluster A
    for i, (cx, cy) in enumerate(
        [(0.0, 0.0)] * 4 + [(100.0, 0.0)] * 4 + [(0.0, 100.0)] * 4
    ):
        rows.append((i, [cx + (i % 4) * 0.25, cy + (i % 4) * 0.5]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = kcenter_seed(df, k=3).collect()
    assert [r.seed_rank for r in out] == [1, 2, 3]
    assert out[0].vec_id == 0 and out[0].radius is None
    picked_clusters = {r.vec_id // 4 for r in out}
    assert picked_clusters == {0, 1, 2}  # one seed per true cluster
    radii = [r.radius for r in out[1:]]
    assert radii == sorted(radii, reverse=True)
    # deterministic replay
    again = kcenter_seed(df, k=3).collect()
    assert [(r.seed_rank, r.vec_id) for r in again] == [
        (r.seed_rank, r.vec_id) for r in out
    ]


def test_kcenter_seed_embeddings_matches_duckdb_oracle(spark):
    """THE r19 debut's unit-first differential: the KCENTER_K seed
    ranks, ids, and selection radii are cell-exact vs the unrolled
    MATERIALIZED-CTE oracle at the driver's sf0.01 scale."""
    from data_engineering_for_e_commerce_logistics_spark.plans import (
        graph_queries as gq,
    )
    from tests.oracle import compare_frames, duckdb_conn

    sf = "/root/testdata/sf0.01"
    spdf = gq.kcenter_seed_embeddings(spark, sf).toPandas()
    assert len(spdf) == gq.KCENTER_K
    conn = duckdb_conn(sf)
    try:
        opdf = conn.execute(gq.KCENTER_SEED_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "kcenter_seed_embeddings") == []


def test_kcenter_seed_stops_at_distinct_vectors(spark):
    """k > #distinct vectors (r09 ADVICE): once every remaining point
    sits at dmin=0 from the chosen set, the loop stops instead of
    re-selecting a chosen point — one seed per distinct vector, no
    duplicate vec_ids, and the short result is still deterministic."""
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        kcenter_seed,
    )

    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [0.0, 0.0]),  # duplicate of 0
            (2, [3.0, 4.0]),
            (3, [3.0, 4.0]),  # duplicate of 2
        ],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_seed(df, k=4).collect()
    assert [(r.seed_rank, r.vec_id) for r in out] == [(1, 0), (2, 2)]
    assert out[1].radius == 25.0
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids))  # never a repeated seed

    # the unrolled oracle replays the early stop (r10: its padded
    # rounds filter to dmin > 0), so the degenerate input stays
    # cell-exact against DuckDB too — k=KCENTER_K=8 over 2 distinct
    # vectors must yield the same 2 rows on both engines
    import duckdb

    from data_engineering_for_e_commerce_logistics_spark.plans import (
        graph_queries as gq,
    )
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        kcenter_seed as _ks,
    )
    from tests.oracle import compare_frames

    spdf = (
        _ks(df, k=gq.KCENTER_K)
        .select("seed_rank", "vec_id", "radius")
        .toPandas()
    )
    conn = duckdb.connect()
    try:
        conn.execute(
            "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
            "(0::BIGINT, [0.0, 0.0]), (1, [0.0, 0.0]), "
            "(2, [3.0, 4.0]), (3, [3.0, 4.0])"
            ") t(vec_id, embedding)"
        )
        opdf = conn.execute(gq.KCENTER_SEED_SQL).fetchdf()
    finally:
        conn.close()
    assert len(opdf) == 2
    assert compare_frames(spdf, opdf, "kcenter_degenerate") == []


def test_pq_recall_floor_on_clustered_fixture(spark):
    """VERDICT r10 task 5: a recall FLOOR pinned on the CLUSTERED
    fixture only — the workload PQ serves (semantic dedup / retrieval
    over corpora with real neighbor structure).  PQ_RECALL.json's
    sf0.1 rows (recall@5 ≈ 0.10-0.15) are measured on i.i.d.-uniform
    vectors, the quantizer's theoretical worst case (rank-1..5
    neighbors of random points are barely closer than average, so
    12-bit codes cannot order them); they are NOT a production
    quality claim and deliberately carry no assertion.  This fixture
    plants 4 near-duplicate replicas per base vector — the geometry
    the SCALE.md study measured at 0.70 ADC / 0.90 rerank on the
    sf0.5 clustered corpus — and trips if either stage regresses."""
    import random

    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        pq_adc_topk,
        pq_rerank_topk,
    )

    rng = random.Random(7)
    dim, n_clusters, n_replicas = 16, 24, 4
    rows = []
    for c in range(n_clusters):
        base = [rng.uniform(-1.0, 1.0) for _ in range(dim)]
        rows.append((c * (n_replicas + 1), base))
        for j in range(1, n_replicas + 1):
            rows.append(
                (
                    c * (n_replicas + 1) + j,
                    [x + rng.uniform(-0.02, 0.02) for x in base],
                )
            )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    codes, codebook = pq_train_encode(emb, dim=dim, n_sub=4, k=8, n_refine=1)
    sub_d = dim // 4
    # queries: each cluster's base vector; ground truth top-4 = its
    # own replicas (intra-cluster sq-dist <= 16*0.04^2 = 0.026 vs
    # E[inter] ~ 10.7 — separation by 2+ orders of magnitude)
    query_ids = [c * (n_replicas + 1) for c in range(n_clusters)]
    qframe = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("v")
    )
    queries = qframe.select(
        "query_id",
        F.posexplode(
            F.array(*[F.slice("v", m * sub_d + 1, sub_d) for m in range(4)])
        ).alias("m", "sv"),
    )
    shortlist = pq_adc_topk(codes, codebook, queries, k=20)
    vecs = emb.select("vec_id", F.col("embedding").alias("v"))
    qvecs = qframe.select("query_id", F.col("v").alias("qv"))
    rerank = pq_rerank_topk(shortlist, vecs, qvecs, k=n_replicas)

    def recall(df, k):
        hits = total = 0
        per_q = {}
        for r in df.collect():
            per_q.setdefault(r.query_id, []).append((r.rank, r.vec_id))
        for qid in query_ids:
            gt = {qid + j for j in range(1, n_replicas + 1)}
            got = {
                vid
                for rank, vid in sorted(per_q.get(qid, []))[:k]
            }
            hits += len(gt & got)
            total += n_replicas
        return hits / total

    adc_recall = recall(shortlist, n_replicas)
    rerank_recall = recall(rerank, n_replicas)
    # floors, not exact pins: ADC ranks quantized geometry (codebook
    # assignment noise moves individual ranks), rerank is exact over
    # the shortlist, so it can only miss replicas the screen dropped
    assert adc_recall >= 0.6, adc_recall
    assert rerank_recall >= 0.9, rerank_recall
    assert rerank_recall >= adc_recall
