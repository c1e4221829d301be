"""Distributed Bloom-filter join pruning — shrink the probe side
BEFORE the shuffle.

At 100 TB the dominant cost of a selective fact⨝filtered-dim join is
shuffling probe rows that will never match.  Catalyst's runtime
row-level bloom filtering covers the automatic case; this module is
the explicit form for fixed plans, persisted filters, and build sides
too big to broadcast as a hash relation but whose *bit array* is tiny
(a 2^20-bit filter is 16 K longs regardless of build-side row count).

Everything stays JVM-side and whole-stage-codegen'd:

* build: each key hashes ``num_hashes`` ways (murmur3 with seed i) to
  bit positions; positions group by 64-bit word index with a
  ``bit_or`` of single-bit masks — one shuffle on ≤ num_bits/64 keys,
  map-side partials collapse it to almost nothing.  The words then
  fold into ONE row holding a dense ``array<long>`` (the
  broadcast-scalar pattern — never ``.collect()``).
* probe: crossJoin(broadcast(1-row word array)), then a
  pure-expression membership test per row (k O(1) array lookups +
  shifts/ANDs); rows failing any bit are dropped at the scan stage,
  before any exchange.
* exactness: the bloom pass only PRUNES (false positives survive), so
  ``bloom_semi_join`` finishes with a real left-semi join — the result
  is bit-identical to the plain semi join, which is what the DuckDB
  oracle checks.  The bloom's own hash family therefore needs no
  cross-engine portability.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the 2^20-bit default
holds ~100 K keys at <1% fp with k=5.  At warehouse scale pick
m ≈ 10·n bits — the 1-row word array stays megabytes while the pruned
shuffle saves terabytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOOM_COL = "__bloom_words"


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k murmur3 bit positions in [0, num_bits) for one key."""
    return [
        F.pmod(F.hash(key, F.lit(i)), F.lit(num_bits)).cast("long")
        for i in range(num_hashes)
    ]


def _word_index(bitpos: Column) -> Column:
    # bitpos < 2^31, so the double division inside floor is exact.
    return F.floor(bitpos / F.lit(64)).cast("long")


def _bit_mask(bitpos: Column) -> Column:
    # shiftleft with a COLUMN shift amount: the SQL expression accepts
    # it even though the F.shiftleft wrapper only takes an int literal.
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(bitpos, F.lit(64)).cast("int")
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Build the filter as a ONE-row DataFrame with a DENSE
    array<long> column of num_bits/64 words named ``__bloom_words`` —
    broadcastable, persistable (write it to parquet and reuse across
    runs), never collected.

    Dense array, NOT a map: Spark's ``element_at`` on a map is a
    LINEAR scan of ArrayBasedMapData, so per-probe lookup cost grew
    with filter size (measured: the sf0.1 query went 1.6s → 9.1s when
    the filter grew 2^16 → 2^20 bits as a map).  Array indexing is
    O(1).  Densification joins the word aggregate against
    ``range(n_words)`` and packs via array_sort(collect_list) —
    NOT via ``transform(sequence, i -> map[i])``, whose interpreted
    per-index map scans are O(n_words²) (measured 16s for 2^20 bits
    on ONE row)."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    key = F.col(key_col)
    pos = keys.select(
        F.explode(F.array(*_bit_positions(key, num_bits, num_hashes))).alias(
            "__bitpos"
        )
    )
    words = pos.groupBy(_word_index(F.col("__bitpos")).alias("__word_idx")).agg(
        F.bit_or(_bit_mask(F.col("__bitpos"))).alias("__word")
    )
    n_words = num_bits // 64
    idx = keys.sparkSession.range(n_words).select(
        F.col("id").alias("__word_idx")
    )
    dense = idx.join(words, "__word_idx", "left").select(
        "__word_idx",
        F.coalesce("__word", F.lit(0).cast("long")).alias("__word"),
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__word_idx", "__word"))),
            lambda s: s["__word"],
        ).alias(_BLOOM_COL)
    )


def bloom_might_contain(
    key: Column, num_bits: int, num_hashes: int
) -> Column:
    """Membership predicate against the broadcast ``__bloom_words``
    dense word array (must be in scope via the crossJoin in
    bloom_prune).  The 1-based array index is always valid by
    construction (pmod < num_bits), so ANSI-mode element_at cannot
    throw; an all-zero (empty-build) filter rejects everything."""
    test = F.lit(True)
    for p in _bit_positions(key, num_bits, num_hashes):
        word = F.element_at(
            F.col(_BLOOM_COL), (_word_index(p) + F.lit(1)).cast("int")
        )
        test = test & (word.bitwiseAND(_bit_mask(p)) != 0)
    return test


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Filter probe rows through the bloom filter (may keep false
    positives, never drops a true match).  The 1-row filter frame rides
    along as an explicit broadcast; the membership test is pure
    expression work inside the scan stage."""
    pruned = probe.crossJoin(F.broadcast(bloom)).where(
        bloom_might_contain(F.col(key_col), num_bits, num_hashes)
    )
    return pruned.drop(_BLOOM_COL)


def _barrier_join(
    pruned: DataFrame, keys: DataFrame, key: str, how: str
) -> DataFrame:
    """Finishing exact join that STAYS ABOVE the bloom filter.

    Catalyst's PushDownLeftSemiAntiJoin / PushLeftSemiLeftAntiThroughJoin
    would otherwise slide the semi/anti join underneath the bloom
    filter (the filter folds into the cross join's condition; a join
    whose condition touches only probe columns pushes into the probe
    leg) — executing the exact join's exchange on UNPRUNED rows, the
    opposite of the operator's point.

    The barrier is a per-row ``spark_partition_id`` tag: Catalyst
    classes it non-deterministic, so the join cannot push below the
    Project that computes it; it costs 4 bytes/row through the
    exchange, and — unlike ``monotonically_increasing_id`` — it is
    allowed in streaming plans, so the bloom joins compose with
    Structured Streaming unchanged.  The tag must be REFERENCED in the
    join condition (an always-true ``>= 0``) or column pruning deletes
    it and the barrier with it.  Earlier designs anchored on the
    word-array column itself — which forced the 2^20-bit array to ride
    the exchange on EVERY probe row (measured: filled a disk with
    spill at sf0.5 in the sort-merge regime).  Measured plan order
    without broadcast: scan → bloom filter (scan stage) →
    exchange(pruned rows + tag) → sort-merge join."""
    tagged = pruned.withColumn("__bloom_tag", F.spark_partition_id())
    cond = (tagged[key] == keys[key]) & (tagged["__bloom_tag"] >= F.lit(0))
    return tagged.join(keys, cond, how).drop("__bloom_tag")


def bloom_auto_size(
    keys: DataFrame, key_col: str, fpp: float = 0.01
) -> tuple[int, int]:
    """(num_bits, num_hashes) sized for the ACTUAL build-side key
    cardinality: one ``approx_count_distinct`` pass feeds
    ``bloom_sizing``.  The r04 measurements are why this exists — an
    undersized filter saturates silently (2^16 bits at 30 K keys →
    ~60% fp, pruning power 1.49× instead of 4.98×) and an oversized
    one wastes broadcast bytes; neither affects correctness, which is
    exactly why the mis-sizing goes unnoticed without a knob that
    tracks n.  The single-scalar driver pull is the same bounded
    planner action every cost-based optimizer performs (HLL ±2% error
    moves m by ±2%, far inside the sizing slack)."""
    n = keys.agg(F.approx_count_distinct(key_col).alias("n")).first()["n"]
    return bloom_sizing(int(n), fpp)


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    num_bits: int | None = 1 << 20,
    num_hashes: int = 5,
    fpp: float = 0.01,
) -> DataFrame:
    """EXACT left-semi join with bloom pre-pruning: semantically
    identical to ``probe.join(build, key, 'left_semi')``; the bloom
    pass just keeps non-matching probe rows out of the semi join's
    shuffle.  At 100 TB this is the difference between exchanging the
    full fact table and exchanging only the ~selectivity fraction.
    ``num_bits=None`` auto-sizes from the build-side cardinality via
    ``bloom_auto_size`` (then ``num_hashes`` is derived too)."""
    build_key = build_key or probe_key
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    if num_bits is None:
        num_bits, num_hashes = bloom_auto_size(keys, probe_key, fpp)
    bloom = bloom_build(keys, probe_key, num_bits, num_hashes)
    pruned = bloom_prune(probe, probe_key, bloom, num_bits, num_hashes)
    return _barrier_join(pruned, keys, probe_key, "left_semi")


def bloom_anti_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    num_bits: int | None = 1 << 20,
    num_hashes: int = 5,
    fpp: float = 0.01,
) -> DataFrame:
    """EXACT left-anti join with bloom splitting — the MERGE/upsert
    accelerator.  A plain ``target ⟕anti batch`` shuffles the WHOLE
    target even when the batch touches 0.1% of it.  Here rows that
    MISS the bloom are *guaranteed* unmatched (no false negatives) and
    bypass the join entirely; only bloom hits (true matches + the fp
    fraction) pay the anti join's exchange.  Result is row-identical
    to ``left.join(right, key, 'left_anti')``.

    At 100 TB this is the row-level analogue of Delta/Iceberg's
    file-level MERGE pruning: anti-join shuffle volume drops from
    |target| to ≈|matches|, and the pass-through branch is a pure
    scan-stage filter.  ``num_bits=None`` auto-sizes from the
    build-side cardinality via ``bloom_auto_size``."""
    right_key = right_key or left_key
    keys = right.select(F.col(right_key).alias(left_key)).distinct()
    if num_bits is None:
        num_bits, num_hashes = bloom_auto_size(keys, left_key, fpp)
    bloom = bloom_build(keys, left_key, num_bits, num_hashes)
    tagged = left.crossJoin(F.broadcast(bloom))
    test = bloom_might_contain(F.col(left_key), num_bits, num_hashes)
    # NULL-key left rows must survive like plain left_anti keeps them
    # (a null key matches nothing on the right).  Today they do either
    # way — F.hash maps NULL to a seed-derived NON-null value, so the
    # test never evaluates NULL and a null-key row that reaches the
    # `maybe` branch still passes its anti join — but the explicit
    # isNull() arm makes the row-identical contract robust to any
    # future hash that propagates NULL (ADVICE r05; pinned by
    # test_anti_join_null_keys_kept).
    certain_miss = tagged.where(test.isNull() | ~test).drop(_BLOOM_COL)
    maybe = tagged.where(test).drop(_BLOOM_COL)
    # Same planning barrier as bloom_semi_join: PushDownLeftSemiAntiJoin
    # covers LeftAnti too and would re-order the join below the filter.
    survivors = _barrier_join(maybe, keys, left_key, "left_anti")
    return certain_miss.unionByName(survivors)


def bloom_sizing(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate:
    m = -n·ln p / ln²2 rounded up to a 64-bit word boundary,
    k = (m/n)·ln 2.  Callers with an unknown build-side cardinality
    can feed ``approx_count_distinct`` of the key — the filter's
    correctness never depends on the estimate, only its fp rate."""
    import math

    if n_keys <= 0:
        return 64, 1
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k
