"""Bloom-filter join pruning: exactness vs the plain semi join,
pruning power, degenerate inputs, and plan shape (broadcast filter,
no Python in the hot path)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators import bloom

SF = "/root/testdata/sf0.001"

HYP_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("payload")
    )
    build = spark.range(0, 300).select((F.col("id") * 7 % 997).alias("k"))
    return probe, build


def test_semi_join_exact(spark, frames):
    probe, build = frames
    got = bloom.bloom_semi_join(probe, build, "k", num_bits=1 << 12)
    want = probe.join(build.distinct(), "k", "left_semi")
    assert sorted(r.payload for r in got.collect()) == sorted(
        r.payload for r in want.collect()
    )


def test_prune_never_drops_a_match(spark, frames):
    """The bloom pass alone (no exact join) must be a superset of the
    true matches — false positives allowed, false negatives never."""
    probe, build = frames
    keys = build.distinct()
    filt = bloom.bloom_build(keys, "k", num_bits=1 << 12, num_hashes=3)
    pruned = bloom.bloom_prune(probe, "k", filt, num_bits=1 << 12, num_hashes=3)
    true_ids = {
        r.payload for r in probe.join(keys, "k", "left_semi").collect()
    }
    pruned_ids = {r.payload for r in pruned.collect()}
    assert true_ids <= pruned_ids


def test_prune_actually_prunes(spark, frames):
    """With a well-sized filter the pass-through fraction approaches
    the true selectivity — the whole point at 100 TB."""
    probe, build = frames
    filt = bloom.bloom_build(build.distinct(), "k", num_bits=1 << 14)
    pruned = bloom.bloom_prune(probe, "k", filt, num_bits=1 << 14)
    n_true = probe.join(build.distinct(), "k", "left_semi").count()
    n_pruned = pruned.count()
    assert n_pruned < probe.count()  # it filtered something
    assert n_pruned <= n_true * 1.2 + 50  # and close to the true rate


def test_empty_build_side(spark, frames):
    probe, _ = frames
    empty = probe.select("k").where(F.lit(False))
    assert bloom.bloom_semi_join(probe, empty, "k", num_bits=1 << 12).count() == 0


def test_null_probe_keys_dropped(spark):
    probe = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k int, v string"
    )
    build = spark.createDataFrame([(1,), (2,)], "k int")
    got = bloom.bloom_semi_join(probe, build, "k", num_bits=1 << 12)
    assert sorted(r.v for r in got.collect()) == ["a", "c"]


def test_num_bits_must_be_word_aligned(spark, frames):
    _, build = frames
    with pytest.raises(ValueError):
        bloom.bloom_build(build, "k", num_bits=100)


def test_plan_broadcasts_filter_no_python(spark):
    from data_engineering_for_e_commerce_logistics_spark.plans.registry import (
        all_specs,
    )

    df = all_specs()["bloom_semi_lineitem"].build(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the 1-row word map rides a broadcast, membership is expression
    # work (no Python evaluation anywhere), and the finishing exact
    # join is a real semi join.
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LeftSemi" in plan


def test_prune_happens_below_the_semi_join_exchange(spark):
    """The operator's reason to exist: with a non-broadcastable build
    side (forced here), the bloom filter must sit BELOW the semi
    join's exchange so the shuffle carries only pruned rows.  Catalyst
    tries to push the semi join under the filter
    (PushLeftSemiLeftAntiThroughJoin); the anchor conjunct in
    bloom_semi_join is what stops it — this test is the regression
    guard for that barrier."""
    from data_engineering_for_e_commerce_logistics_spark.catalog import (
        read_parquet_table,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = read_parquet_table(spark, f"{SF}/lineitem.parquet")
        build = read_parquet_table(spark, f"{SF}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        out = bloom.bloom_semi_join(
            probe, build, "l_orderkey", "o_orderkey", num_bits=1 << 14
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        lines = plan.split("\n")
        semi = next(
            i for i, l in enumerate(lines) if "SortMergeJoin" in l and "LeftSemi" in l
        )
        bloom_filter = next(
            i for i, l in enumerate(lines) if "NestedLoopJoin" in l
        )
        probe_exchange = next(
            i
            for i, l in enumerate(lines)
            if "Exchange hashpartitioning(l_orderkey" in l and i > semi
        )
        # toString prints parents first: semi above the probe exchange,
        # the bloom filter below it (closer to the scan).
        assert semi < probe_exchange < bloom_filter or (
            semi < bloom_filter and probe_exchange > bloom_filter
        ), plan[:2000]
        assert bloom_filter > probe_exchange, "bloom filter above the exchange"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bloom_filter_persists_and_reloads(spark, tmp_path, frames):
    """The docstring claim 'write it to parquet and reuse across runs':
    a reloaded filter prunes identically to the in-memory one."""
    probe, build = frames
    keys = build.distinct()
    filt = bloom.bloom_build(keys, "k", num_bits=1 << 12, num_hashes=3)
    p = str(tmp_path / "bloom_filter")
    filt.write.parquet(p)
    reloaded = spark.read.parquet(p)
    a = sorted(
        r.payload
        for r in bloom.bloom_prune(
            probe, "k", filt, num_bits=1 << 12, num_hashes=3
        ).collect()
    )
    b = sorted(
        r.payload
        for r in bloom.bloom_prune(
            probe, "k", reloaded, num_bits=1 << 12, num_hashes=3
        ).collect()
    )
    assert a == b


def test_anti_join_exact(spark, frames):
    """bloom_anti_join must return exactly the plain left-anti rows —
    the certain-miss bypass plus the joined survivors, nothing else."""
    probe, build = frames
    got = sorted(
        r.payload
        for r in bloom.bloom_anti_join(
            probe, build, "k", num_bits=1 << 12
        ).collect()
    )
    want = sorted(
        r.payload for r in probe.join(build.distinct(), "k", "left_anti").collect()
    )
    assert got == want


def test_anti_join_null_keys_kept(spark):
    """Anti-join semantics: a null left key never matches, so the row
    must survive regardless of which bloom branch it lands in."""
    left = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k int, v string"
    )
    right = spark.createDataFrame([(1,)], "k int")
    got = sorted(
        r.v for r in bloom.bloom_anti_join(left, right, "k", num_bits=1 << 12).collect()
    )
    assert got == ["b", "c"]


@given(
    left_keys=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=30),
    right_keys=st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=15),
)
@settings(**HYP_SETTINGS)
def test_anti_join_equals_plain_anti_join(spark, left_keys, right_keys):
    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)], "k int, rowid int"
    )
    right = spark.createDataFrame([(k,) for k in right_keys], "k int")
    got = sorted(
        r.rowid
        for r in bloom.bloom_anti_join(
            left, right, "k", num_bits=256, num_hashes=3
        ).collect()
    )
    want = sorted(i for i, k in enumerate(left_keys) if k not in set(right_keys))
    assert got == want


def test_upsert_with_bloom_equals_plain_upsert(spark, tmp_path):
    from data_engineering_for_e_commerce_logistics_spark.sources.sinks import (
        upsert_parquet,
    )

    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    updates = spark.range(990, 1010).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    pa, pb = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    base.write.parquet(pa)
    base.write.parquet(pb)
    upsert_parquet(spark, updates, pa, ["k"])
    upsert_parquet(spark, updates, pb, ["k"], bloom_bits=1 << 12)
    a = sorted((r.k, r.v) for r in spark.read.parquet(pa).collect())
    b = sorted((r.k, r.v) for r in spark.read.parquet(pb).collect())
    assert a == b and len(a) == 1010


def test_bloom_sizing_hits_target_fpp(spark):
    """Sized filter must land near (and not wildly above) the asked-for
    false-positive rate on disjoint probe keys."""
    n = 2000
    m, k = bloom.bloom_sizing(n, fpp=0.01)
    assert m % 64 == 0 and k >= 1
    build = spark.range(n).select(F.col("id").alias("k"))
    probe = spark.range(100000, 140000).select(F.col("id").alias("k"))  # disjoint
    filt = bloom.bloom_build(build, "k", num_bits=m, num_hashes=k)
    passed = bloom.bloom_prune(probe, "k", filt, num_bits=m, num_hashes=k).count()
    fp_rate = passed / 40000
    assert fp_rate < 0.03, fp_rate  # target 1%, allow 3x sampling slack


def test_bloom_sizing_degenerate():
    assert bloom.bloom_sizing(0) == (64, 1)
    import pytest as _pt

    with _pt.raises(ValueError):
        bloom.bloom_sizing(100, fpp=1.5)


def test_auto_sized_joins_exact_and_well_sized(spark, frames):
    """num_bits=None sizes the filter from approx_count_distinct of
    the build keys: results stay identical to the plain joins, and
    the chosen m lands at ≈ -n·ln(p)/ln²2 for the true cardinality."""
    probe, build = frames
    semi = bloom.bloom_semi_join(probe, build, "k", num_bits=None)
    want_semi = probe.join(build.distinct(), "k", "left_semi")
    assert sorted(r.payload for r in semi.collect()) == sorted(
        r.payload for r in want_semi.collect()
    )
    anti = bloom.bloom_anti_join(probe, build, "k", num_bits=None)
    want_anti = probe.join(build.distinct(), "k", "left_anti")
    assert sorted(r.payload for r in anti.collect()) == sorted(
        r.payload for r in want_anti.collect()
    )
    n_true = build.distinct().count()
    m, k = bloom.bloom_auto_size(build.distinct(), "k", fpp=0.01)
    lo, _ = bloom.bloom_sizing(int(n_true * 0.9), 0.01)
    hi, _ = bloom.bloom_sizing(int(n_true * 1.1), 0.01)
    assert lo <= m <= hi  # HLL error stays inside sizing slack
    assert 1 <= k <= 16
