"""The r14 consolidation trade's unit-first proof (pre-built r12):
the two assignment-path SemDeDup pair miners (trained-flat / routed)
union under one suite built from ONE cached (v, nrm) projection.

Two contracts, proven separately:
* the REGISTERED form (trained seeds auto-scaled to ceil(sqrt(n)) —
  the 100 TB cell rule, the one deliberate upgrade over the retiring
  spec) matches its DuckDB oracle cell-exactly;
* under the retiring spec's OWN seeding (``n_seed=N_CENTROIDS``) the
  trained leg is bit-identical to ``semdedup_trained_pairs``, and the
  routed leg (always sqrt(n)) is bit-identical to
  ``semdedup_routed_pairs`` — nothing the parts computed is lost.
"""

from __future__ import annotations

from data_engineering_for_e_commerce_logistics_spark.plans import (
    graph_queries as gq,
)

SF = "/root/testdata/sf0.01"


def test_semdedup_routing_suite_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = gq.semdedup_routing_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(gq.SEMDEDUP_ROUTING_SUITE_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "semdedup_routing_suite") == []
    assert set(spdf.variant) == {"trained", "routed"}


def test_semdedup_routing_suite_matches_parts(spark):
    spdf = gq.semdedup_routing_suite(
        spark, SF, n_seed=gq.N_CENTROIDS
    ).toPandas()
    for variant, builder in (
        ("trained", gq.semdedup_trained_pairs),
        ("routed", gq.semdedup_routed_pairs),
    ):
        leg = {
            (r.cell, r.pair_rank): (r.id_a, r.id_b, r.cosine)
            for _, r in spdf[spdf.variant == variant].iterrows()
        }
        got = builder(spark, SF).collect()
        assert len(got) == len(leg) > 0, variant
        for r in got:
            assert leg[(r.cell, r.pair_rank)] == (
                r.id_a,
                r.id_b,
                r.cosine,
            ), (variant, r.cell, r.pair_rank)
