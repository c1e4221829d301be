"""DSIR importance resampling (pre-built r12, r15 registry candidate):
the hashed-n-gram log-ratio weights must reproduce the paper's
bag-of-words estimator (independent Python reference), the log-space
Sequential Poisson draw must be importance-biased toward the target
domain, the spec must match its DuckDB oracle cell-exactly, and the
physical plan must stay broadcast-only around the 64-row LM tables."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators import corpus
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)

SF = "/root/testdata/sf0.01"


def _py_weights(rows, target_srcs, n_buckets=64):
    """Independent reference: smoothed hashed-bigram log-ratio sums."""

    def feats(text):
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n_buckets

    c_r: dict[int, int] = {}
    c_t: dict[int, int] = {}
    for _i, src, text in rows:
        for f in feats(text):
            b = bucket(f)
            c_r[b] = c_r.get(b, 0) + 1
            if src in target_srcs:
                c_t[b] = c_t.get(b, 0) + 1
    tot_r, tot_t = sum(c_r.values()), sum(c_t.values())
    lr = {
        b: round(
            math.log((c_t.get(b, 0) + 0.5) / (tot_t + 0.5 * n_buckets))
            - math.log((c_r[b] + 0.5) / (tot_r + 0.5 * n_buckets)),
            9,
        )
        for b in c_r
    }
    out = {}
    for i, _src, text in rows:
        bs = [bucket(f) for f in feats(text)]
        out[i] = (len(bs), sum(lr[b] for b in bs))
    return out


def test_dsir_weights_match_python_reference(spark):
    rows = [
        (
            i,
            ["wiki", "crawl", "crawl", "forum"][i % 4],
            " ".join(
                ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"][
                    (i * 7 + j) % 3
                ]
                for j in range(1 + i % 5)
            ),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = {
        r.doc_id: (r.n_feats, r.lr_weight)
        for r in corpus.dsir_log_ratio_weights(
            df, F.col("src") == "wiki"
        ).collect()
    }
    want = _py_weights(rows, {"wiki"})
    assert set(got) == set(want)
    for i, (n, w) in want.items():
        gn, gw = got[i]
        assert gn == n, (i, gn, n)
        # python round() is banker's vs decimal HALF_UP: allow the sum
        # of per-bucket half-ulp splits, nothing more
        assert abs(gw - w) <= 2e-9 * n, (i, gw, w)


def test_dsir_resample_is_importance_biased(spark):
    """Docs written in the target vocabulary must dominate the draw:
    50 labeled target docs (vocab A), 50 unlabeled vocab-A docs, 100
    vocab-B docs; a 40-doc draw ∝ exp(lr) should be nearly all
    vocab-A (the unlabeled A docs prove it generalizes beyond the
    label)."""
    a = "sun moon star comet nova quasar pulsar nebula"
    b = "rock sand clay silt loam gravel basalt shale"
    rows = (
        [(i, "t", " ".join([a] * 4)) for i in range(50)]
        + [(100 + i, "r", " ".join([a] * 4)) for i in range(50)]
        + [(200 + i, "r", " ".join([b] * 4)) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    w = corpus.dsir_log_ratio_weights(df, F.col("src") == "t")
    sampled = corpus.dsir_resample_flag(w, 40).collect()
    assert len(sampled) == 40
    assert {r.sample_rank for r in sampled} == set(range(1, 41))
    n_a = sum(1 for r in sampled if r.doc_id < 200)
    assert n_a >= 36, n_a
    # unlabeled vocab-A docs are drawn too — weights, not labels
    assert any(100 <= r.doc_id < 200 for r in sampled)


def test_corpus_dsir_sample_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = xc.corpus_dsir_sample(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(xc.CORPUS_DSIR_SAMPLE_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "corpus_dsir_sample") == []
    assert set(spdf.variant) == {"weight", "sample"}
    sample = spdf[spdf.variant == "sample"]
    assert len(sample) == xc.DSIR_SAMPLE_K


def test_corpus_dsir_sample_plan_shape(spark):
    """The LM/count tables must broadcast (64 rows), never shuffle the
    feature stream against them; no cartesian products, no Python in
    the hot path."""
    plan = (
        xc.corpus_dsir_sample(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_dsir_incremental_laws(spark):
    """(1) Self-index equivalence: scoring a batch against the index
    built FROM that batch reproduces dsir_log_ratio_weights exactly.
    (2) Accrual law: accrue(index(C1), C2) = index(C1 ∪ C2) — exact
    integer counts, cell equality."""
    import pyspark.sql.functions as SF

    rows = [
        (
            i,
            ["wiki", "crawl"][i % 2],
            " ".join(
                ["alpha beta gamma", "delta epsilon zeta"][(i + j) % 2]
                for j in range(1 + i % 3)
            ),
        )
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    tgt = SF.col("src") == "wiki"

    idx_self = corpus.dsir_bucket_index(df, tgt)
    _, scores = corpus.dsir_score_batch(df, idx_self, tgt)
    direct = corpus.dsir_log_ratio_weights(df, tgt)
    got = {r.doc_id: (r.n_feats, r.lr_weight) for r in scores.collect()}
    want = {r.doc_id: (r.n_feats, r.lr_weight) for r in direct.collect()}
    assert got == want

    c1 = df.where(SF.col("doc_id") < 40)
    c2 = df.where(SF.col("doc_id") >= 40)
    accrued, _ = corpus.dsir_score_batch(
        c2, corpus.dsir_bucket_index(c1, tgt), tgt
    )
    full = corpus.dsir_bucket_index(df, tgt)
    a = {r.b: (r.c_r, r.c_t) for r in accrued.collect()}
    f = {r.b: (r.c_r, r.c_t) for r in full.collect()}
    assert a == f


def test_incremental_dsir_fresh_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = xc.incremental_dsir_fresh(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(xc.INCREMENTAL_DSIR_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "incremental_dsir_fresh") == []
    assert set(spdf.variant) == {"batch_score", "index_after"}
    # O(buckets) state: the index leg is exactly the bucket count
    assert (spdf.variant == "index_after").sum() <= xc.DSIR_BUCKETS
