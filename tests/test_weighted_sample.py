"""Sequential Poisson weighted sampling (pre-built r12, r14 registry
candidate): exact top-n-per-stratum by the ξ = u/w order without a
per-stratum window — the exponent-ladder bucketed rank must equal the
plain single-window form row-for-row, the spec must match its DuckDB
oracle cell-exactly, and the draw must actually be weight-biased."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators import corpus
from data_engineering_for_e_commerce_logistics_spark.plans import (
    corpus_queries as xc,
)

SF = "/root/testdata/sf0.01"


def _plain_window_sample(df, weight_col, n, strata, id_col="doc_id"):
    """The single-window ancestor the bucketed form must reproduce."""
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    d = df.filter(w > 0).select(
        *strata, F.col(id_col), w.alias("weight"), (u / w).alias("skey")
    )
    win = Window.partitionBy(*strata).orderBy("skey", id_col)
    return (
        d.withColumn("sample_rank", F.row_number().over(win).cast("long"))
        .filter(F.col("sample_rank") <= n)
        .select(*strata, id_col, "weight", "skey", "sample_rank")
    )


def test_weighted_sample_matches_single_window(spark):
    """Adversarial differential incl. null strata, weight ties (one
    stratum all-equal weights -> keys share u's distribution), and a
    weight spread wide enough to cross many exponent buckets."""
    rows = [
        (
            i,
            [None, "web", "code"][i % 3],
            [1.0, 1.0, 10.0, 10000.0][i % 4] if i % 3 else 7.5,
        )
        for i in range(400)
    ]
    rows += [(900, "web", None), (901, "code", 0.0), (902, None, -3.0)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w double")
    got = {
        (r.src, r.doc_id): (r.sample_rank, r.skey, r.weight)
        for r in corpus.weighted_sample_flag(
            df, "w", 12, ("src",), id_col="doc_id"
        ).collect()
    }
    want = {
        (r.src, r.doc_id): (r.sample_rank, r.skey, r.weight)
        for r in _plain_window_sample(df, "w", 12, ("src",)).collect()
    }
    assert got == want and len(got) == 36  # 3 strata x 12, nulls own group
    # null/zero/negative weights never sampled
    assert not {k for k in got if k[1] in (900, 901, 902)}

    # global (no strata) variant
    got_g = {
        r.doc_id: r.sample_rank
        for r in corpus.weighted_sample_flag(df, "w", 25, ()).collect()
    }
    want_g = {
        r.doc_id: r.sample_rank
        for r in _plain_window_sample(df, "w", 25, ()).collect()
    }
    assert got_g == want_g and len(got_g) == 25


def test_weighted_sample_is_weight_biased(spark):
    """Inclusion tracks weight: with half the rows at w=20 and half at
    w=1, a 100-of-1000 draw must be dominated by heavy rows (E[heavy]
    ≈ 95 under pps; the deterministic hash draw should land close)."""
    df = spark.createDataFrame(
        [(i, 20.0 if i % 2 == 0 else 1.0) for i in range(1000)],
        "doc_id long, w double",
    )
    sampled = corpus.weighted_sample_flag(df, "w", 100, ()).collect()
    heavy = sum(1 for r in sampled if r.weight == 20.0)
    assert len(sampled) == 100
    assert heavy >= 85, heavy


def test_corpus_weighted_sample_matches_duckdb(spark):
    from tests.oracle import compare_frames, duckdb_conn

    spdf = xc.corpus_weighted_sample(spark, SF).toPandas()
    conn = duckdb_conn(SF)
    try:
        opdf = conn.execute(xc.CORPUS_WEIGHTED_SAMPLE_SQL).fetchdf()
    finally:
        conn.close()
    assert compare_frames(spdf, opdf, "corpus_weighted_sample") == []
    assert set(spdf.variant) == {"per_source", "global"}
