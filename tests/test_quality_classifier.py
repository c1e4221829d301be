"""Hashed logistic quality classifier (pre-built r12, r16 registry
candidate): in-engine full-batch GD must actually learn (separable
vocabularies → perfect sign separation), must reproduce an independent
Python implementation of the same math, must match its unrolled DuckDB
oracle cell-exactly, and must keep model state broadcast-only."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators import corpus
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)

SF = "/root/testdata/sf0.01"


def _py_classifier(rows, label_fn, n_buckets=64, iters=3, step=0.5):
    """Independent reference: same features, same GD, float sums
    (tolerance covers the decimal-vs-float gap)."""

    def feats(text):
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n_buckets

    x = {}  # doc -> {b: freq}, incl. intercept at n_buckets
    y = {}
    for i, src, text in rows:
        bs = [bucket(f) for f in feats(text)]
        d: dict[int, float] = {}
        for b in bs:
            d[b] = d.get(b, 0.0) + 1.0 / len(bs)
        d[n_buckets] = 1.0
        x[i], y[i] = d, label_fn(src)
    w = [0.0] * (n_buckets + 1)
    n = len(rows)
    for _ in range(iters):
        p = {
            i: round(
                1.0 / (1.0 + math.exp(-sum(w[b] * v for b, v in d.items()))),
                9,
            )
            for i, d in x.items()
        }
        g = [0.0] * (n_buckets + 1)
        for i, d in x.items():
            for b, v in d.items():
                g[b] += round((y[i] - p[i]) * v, 9)
        w = [round(w[b] + step * g[b] / n, 9) for b in range(n_buckets + 1)]
    return {
        i: round(
            1.0 / (1.0 + math.exp(-sum(w[b] * v for b, v in d.items()))), 9
        )
        for i, d in x.items()
    }


def test_classifier_learns_separable_vocab(spark):
    a = "sun moon star comet nova quasar pulsar nebula"
    b = "rock sand clay silt loam gravel basalt shale"
    rows = [(i, "hq", " ".join([a] * 3)) for i in range(60)] + [
        (100 + i, "lq", " ".join([b] * 3)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = corpus.train_quality_classifier(df, F.col("src") == "hq").collect()
    assert len(got) == 120
    hq = [r for r in got if r.y == 1]
    lq = [r for r in got if r.y == 0]
    # balanced separable data: sign of the margin splits perfectly
    assert all(r.pred == 1 and r.score > 0.5 for r in hq)
    assert all(r.pred == 0 and r.score < 0.5 for r in lq)
    assert min(r.score for r in hq) > max(r.score for r in lq)


def test_classifier_matches_python_reference(spark):
    rows = [
        (
            i,
            ["hq", "lq", "lq"][i % 3],
            " ".join(
                ["alpha beta gamma", "delta epsilon", "zeta eta theta"][
                    (i + j) % 3
                ]
                for j in range(1 + i % 4)
            ),
        )
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = {
        r.doc_id: r.score
        for r in corpus.train_quality_classifier(
            df, F.col("src") == "hq"
        ).collect()
    }
    want = _py_classifier(rows, lambda s: 1 if s == "hq" else 0)
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) <= 1e-6, (i, got[i], want[i])


def test_corpus_quality_classifier_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = xc.corpus_quality_classifier(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(xc.CORPUS_QUALITY_CLASSIFIER_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "corpus_quality_classifier") == []
    assert set(spdf.columns) == {"doc_id", "y", "n_feats", "score", "pred"}


def test_corpus_quality_classifier_plan_shape(spark):
    """Model state (the 65-row weight table, the 1-row doc count)
    must broadcast every iteration; corpus-side joins may sort-merge
    (both sides are corpus-sized at scale); never cartesian, never
    Python."""
    plan = (
        xc.corpus_quality_classifier(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
