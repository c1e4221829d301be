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
m ≈ 10·n bits — the 1-row map stays megabytes while the pruned shuffle
saves terabytes.
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


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT left-semi join with bloom pre-pruning: semantically
    identical to ``probe.join(build, key, 'left_semi')``; the bloom
    pass just keeps non-matching probe rows out of the semi join's
    shuffle.  At 100 TB this is the difference between exchanging the
    full fact table and exchanging only the ~selectivity fraction."""
    build_key = build_key or probe_key
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    bloom = bloom_build(keys, probe_key, num_bits, num_hashes)
    pruned = probe.crossJoin(F.broadcast(bloom)).where(
        bloom_might_contain(F.col(probe_key), num_bits, num_hashes)
    )
    # Planning barrier: Catalyst's PushLeftSemiLeftAntiThroughJoin would
    # otherwise push the finishing semi join below the bloom filter
    # (the filter folds into the cross join's condition, and a semi
    # whose condition touches only probe columns slides into the probe
    # leg) — executing the exact join's exchange on UNPRUNED rows, the
    # opposite of the operator's point.  The anchor conjunct is always
    # true but references BOTH the words column and the right side, so
    # it can neither be extracted as a left-side filter nor let the
    # semi push into a cross-join leg, and the optimizer cannot
    # constant-fold it.  Measured plan order without broadcast:
    # scan → bloom filter (scan stage) → exchange(pruned rows only) →
    # sort-merge LeftSemi.
    anchor = (F.size(pruned[_BLOOM_COL]) >= 0) | F.isnull(
        keys[probe_key]
    )
    cond = (pruned[probe_key] == keys[probe_key]) & anchor
    return pruned.join(keys, cond, "left_semi").drop(_BLOOM_COL)


def bloom_anti_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
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
    scan-stage filter."""
    right_key = right_key or left_key
    keys = right.select(F.col(right_key).alias(left_key)).distinct()
    bloom = bloom_build(keys, left_key, num_bits, num_hashes)
    tagged = left.crossJoin(F.broadcast(bloom))
    test = bloom_might_contain(F.col(left_key), num_bits, num_hashes)
    certain_miss = tagged.where(~test).drop(_BLOOM_COL)
    maybe = tagged.where(test)
    # Same planning barrier as bloom_semi_join: PushDownLeftSemiAntiJoin
    # covers LeftAnti too and would re-order the join below the filter.
    anchor = (F.size(maybe[_BLOOM_COL]) >= 0) | F.isnull(
        keys[left_key]
    )
    cond = (maybe[left_key] == keys[left_key]) & anchor
    survivors = maybe.join(keys, cond, "left_anti").drop(_BLOOM_COL)
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
