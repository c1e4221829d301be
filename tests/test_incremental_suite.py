"""The r12 consolidation trade's unit-first proof: the three
signature-family incremental-ingest specs (exact / simhash / minhash)
union under one suite built from ONE cached documents scan, every
retiring spec's output cell preserved bit-exactly — with BOTH
near-dup screens reading PRE-BANDED persisted indexes (VERDICT r10
task 4), so the parts-equality below doubles as the banded-vs-inline
equivalence proof."""

from __future__ import annotations

from data_engineering_for_e_commerce_logistics_spark.plans import (
    extended_queries as xq,
)

SF = "/root/testdata/sf0.01"


def test_incremental_dedup_suite_matches_duckdb_and_parts(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = xq.incremental_dedup_suite(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(xq.INCREMENTAL_DEDUP_SUITE_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "incremental_dedup_suite") == []

    # exact variant == incremental_exact_fresh verbatim
    exact = {
        (r.fingerprint, r.kept_id, r.n_copies)
        for _, r in spdf[spdf.variant == "exact"].iterrows()
    }
    got = xq.incremental_exact_fresh(spark, SF).collect()
    assert len(got) == len(exact) > 0
    for r in got:
        assert (r.fingerprint, float(r.kept_id), float(r.n_copies)) in exact

    # simhash variant == incremental_simhash_fresh verbatim
    sim = {
        r.doc_id: r.signature
        for _, r in spdf[spdf.variant == "simhash"].iterrows()
    }
    got = xq.incremental_simhash_fresh(spark, SF).collect()
    assert len(got) == len(sim) > 0
    for r in got:
        assert sim[float(r.doc_id)] == str(r.simhash)

    # minhash variant == incremental_minhash_fresh verbatim
    mh = {
        r.doc_id: r.signature
        for _, r in spdf[spdf.variant == "minhash"].iterrows()
    }
    got = xq.incremental_minhash_fresh(spark, SF).collect()
    assert len(got) == len(mh) > 0
    for r in got:
        sig = "-".join(str(r[f"mh{i}"]) for i in range(xq.NUM_HASHES))
        assert mh[float(r.doc_id)] == sig
