"""Z-order layout: Morton-code math, bucketize bounds handling, and
the measurable payoff — per-file min/max envelopes shrink in BOTH
clustered dimensions vs a single-column sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators import layout


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j)
        z |= ((b >> j) & 1) << (2 * j + 1)
    return z


def test_morton_sql_matches_reference_bits(spark):
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (65535, 0), (12345, 54321)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", F.expr(layout.morton_sql(["a", "b"], 16))
    )
    got = {(r.a, r.b): r.z for r in df.collect()}
    for a, b in rows:
        assert got[(a, b)] == _morton_py(a, b), (a, b)


def test_morton_is_monotone_in_block_order(spark):
    """Locality property: points in the same 2^k-aligned square share
    a Morton-code prefix, so sorting by z groups them — spot-check
    that the 4 quadrant corners sort in Z traversal order."""
    quad = [(0, 0), (1, 0), (0, 1), (1, 1)]
    df = spark.createDataFrame(quad, "a long, b long").withColumn(
        "z", F.expr(layout.morton_sql(["a", "b"], 2))
    )
    order = [
        (r.a, r.b) for r in df.orderBy("z").collect()
    ]
    assert order == [(0, 0), (1, 0), (0, 1), (1, 1)]


def test_with_zorder_constant_column(spark):
    """A constant clustering column (hi == lo) buckets to 0 instead of
    dividing by zero."""
    df = spark.range(10).select(F.lit(7).alias("a"), F.col("id").alias("b"))
    z = layout.with_zorder(df, ["a", "b"], bits=8)
    assert z.where(F.col("__zorder").isNull()).count() == 0
    assert z.count() == 10


def test_with_zorder_no_python_stage(spark):
    df = spark.range(1000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") % 31).alias("b")
    )
    z = layout.with_zorder(df, ["a", "b"])
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def _file_envelopes(spark, path: str, cols: list[str]):
    """Average per-file (max-min) spread of each column, normalized by
    the global range — the quantity row-group skipping consumes."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    per_file = df.groupBy("__f").agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    )
    spreads = {}
    glob = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    for c in cols:
        rng = glob[f"hi_{c}"] - glob[f"lo_{c}"]
        avg = per_file.agg(
            F.avg(F.col(f"hi_{c}") - F.col(f"lo_{c}"))
        ).first()[0]
        spreads[c] = avg / rng
    return spreads


def test_zorder_write_shrinks_envelopes_both_dims(spark, tmp_path):
    """The payoff assertion: sorted-by-a files have narrow a-envelopes
    but full-width b-envelopes; z-ordered files are narrow in BOTH."""
    n, files = 16384, 16
    df = spark.range(n).select(
        (F.col("id") % 256).alias("a"),
        ((F.col("id") * 7919) % 256).alias("b"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    layout.write_zorder(df, ["a", "b"], zpath, bits=8, num_files=files)
    df.repartitionByRange(files, "a").sortWithinPartitions("a").write.parquet(
        spath
    )
    z_env = _file_envelopes(spark, zpath, ["a", "b"])
    s_env = _file_envelopes(spark, spath, ["a", "b"])
    # single-column sort: b completely unclustered (~full range / file)
    assert s_env["b"] > 0.9
    # z-order: both dimensions clustered well below full width
    assert z_env["a"] < 0.5 and z_env["b"] < 0.5, (z_env, s_env)


def test_zorder_write_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.range(500).select(
        F.col("id").alias("a"), (F.col("id") * 13 % 101).alias("b")
    )
    p = str(tmp_path / "rt")
    layout.write_zorder(df, ["a", "b"], p, bits=8, num_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 500
    assert "__zorder" not in back.columns
    assert sorted(r.a for r in back.collect()) == list(range(500))
