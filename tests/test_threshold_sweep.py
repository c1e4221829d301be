"""Verify-threshold sensitivity sweep (pre-built r13): counts are
monotone non-increasing in the threshold, a planted mixed-similarity
fixture separates the sweep points, empty thresholds read zero rows
not missing rows, the sf0.01 result matches the DuckDB oracle
bitwise, and the plan keeps the one-mine / broadcast-sweep shape."""

from data_engineering_for_e_commerce_logistics_spark.plans import (
    graph_queries as gq,
)
from tests.oracle import compare_frames, duckdb_conn

SF = "/root/testdata/sf0.01"


def test_sweep_monotone_and_complete(spark):
    rows = sorted(
        gq.dedup_threshold_sweep(spark, SF).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    for a, b in zip(rows, rows[1:]):
        assert b.n_pairs <= a.n_pairs
        assert b.n_docs_affected <= a.n_docs_affected
        assert b.n_removed <= a.n_removed
        assert b.dup_rate <= a.dup_rate
    for r in rows:
        assert r.n_removed <= r.n_docs_affected <= 2 * r.n_pairs


def test_mixed_similarity_separates_sweep_points(spark):
    """Planted pairs at ~0.55 and ~0.95 Jaccard: the loose end of the
    sweep must see both, the strict end only the near-identical one."""
    from data_engineering_for_e_commerce_logistics_spark.operators import (
        dedup,
    )

    words = [f"w{i:02d}" for i in range(40)]
    base = " ".join(words)
    near = " ".join(words[:-1] + ["xx"])  # jaccard ≈ 0.95
    mid = " ".join(words[:32] + [f"z{i}" for i in range(8)])  # ≈ 0.65
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, mid), (50, "unrelated words only here")],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_dedup(
        docs, num_hashes=16, bands=8, shingle_k=3, threshold=0.0
    )
    js = {
        (r.id_a, r.id_b): r.jaccard
        for r in pairs.collect()
    }
    assert js[(0, 1)] > 0.9
    assert 0.5 < js[(0, 2)] < 0.7  # the mid pair separates the sweep


def test_sweep_matches_duckdb(spark):
    spdf = gq.dedup_threshold_sweep(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    opdf = conn.execute(gq.DEDUP_SWEEP_SQL).fetchdf()
    conn.close()
    assert len(spdf) == 5
    assert compare_frames(spdf, opdf, "dedup_threshold_sweep") == []


def test_sweep_plan_one_mine(spark):
    """100 TB guard: the verified-pair frame is mined once and cached
    (InMemoryTableScan feeds both the pair aggregate and the
    affected-doc aggregate); the sweep side is a 5-row broadcast; no
    shuffled cartesian anywhere (the threshold join is the broadcast
    nested-loop over the bounded side, the legitimate form)."""
    from tests.test_plans import _plan_of

    plan = _plan_of(spark, gq.dedup_threshold_sweep)
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 2
    assert "BroadcastNestedLoopJoin" in plan
