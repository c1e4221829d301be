"""Index-maintenance contract for long-running incremental ingest
(VERDICT r06 ask #7): every foreachBatch append adds small parquet
files, so an unmaintained index fragments without bound — file count
grows with ingest AGE.  ``layout.compact_in_place`` every N batches
bounds it by index SIZE instead.  These tests pin:

* the file-count envelope: immediately after each compaction the index
  holds exactly ceil(rows / target) files, regardless of how many
  batches ever appended;
* content invariance: compaction changes bytes-on-disk layout only —
  the digest set and row count are identical before and after, and the
  NEXT batch screens identically against the compacted index;
* crash-safety surface: the swap never leaves both the temp and the
  live directory.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_for_e_commerce_logistics_spark.operators.dedup import (
    incremental_exact_dedup,
)
from data_engineering_for_e_commerce_logistics_spark.operators.layout import (
    compact_in_place,
    parquet_file_count,
)

COMPACT_EVERY = 2
TARGET_ROWS = 1000  # every compaction lands the whole index in 1 file


def _batch(spark, lo: int, n: int):
    return spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(lo, lo + n)],
        "doc_id int, text string",
    )


def test_ingest_loop_file_envelope_and_content(spark, tmp_path):
    idx_path = str(tmp_path / "inc_index")
    n_batches, per_batch = 6, 50
    for step in range(n_batches):
        idx = (
            spark.read.parquet(idx_path)
            if os.path.exists(idx_path)
            else None
        )
        batch = _batch(spark, step * per_batch, per_batch)
        fresh, delta = incremental_exact_dedup(batch, idx, bloom_bits=1 << 12)
        # fragment harder than production would: one file per partition
        delta.repartition(4).write.mode("append").parquet(idx_path)
        spark.catalog.clearCache()
        if (step + 1) % COMPACT_EVERY == 0:
            rows_before = spark.read.parquet(idx_path).count()
            digests_before = {
                r.fingerprint
                for r in spark.read.parquet(idx_path)
                .select("fingerprint")
                .collect()
            }
            before, after = compact_in_place(
                spark, idx_path, target_rows_per_file=TARGET_ROWS
            )
            # envelope: fragmentation bounded by SIZE (ceil(rows/target)
            # == 1 here), not by ingest age
            assert before > after or before == 1
            assert after == 1
            assert parquet_file_count(idx_path) == 1
            # content invariance: same rows, same digest set
            assert spark.read.parquet(idx_path).count() == rows_before
            assert {
                r.fingerprint
                for r in spark.read.parquet(idx_path)
                .select("fingerprint")
                .collect()
            } == digests_before
            # no leftover swap directories
            assert not os.path.exists(idx_path + ".compact-tmp")
            assert not os.path.exists(idx_path + ".compact-old")
    # all 300 distinct docs survived the loop exactly once
    assert spark.read.parquet(idx_path).count() == n_batches * per_batch


def test_screen_identical_against_compacted_index(spark, tmp_path):
    """Replaying an ingested batch against the COMPACTED index screens
    to zero fresh — compaction is invisible to the dedup semantics."""
    idx_path = str(tmp_path / "inc_index2")
    b0 = _batch(spark, 0, 40)
    _, delta = incremental_exact_dedup(b0, None)
    delta.repartition(5).write.mode("append").parquet(idx_path)
    compact_in_place(spark, idx_path, target_rows_per_file=TARGET_ROWS)
    idx = spark.read.parquet(idx_path)
    fresh, delta2 = incremental_exact_dedup(b0, idx, bloom_bits=1 << 12)
    assert fresh.count() == 0 and delta2.count() == 0
    # and a genuinely new batch still comes through whole
    b1 = _batch(spark, 1000, 10)
    fresh1, _ = incremental_exact_dedup(b1, idx, bloom_bits=1 << 12)
    assert fresh1.count() == 10


def test_compact_sorted_restores_clustering(spark, tmp_path):
    """sort_col compaction rewrites with range clustering: each output
    file's min/max envelope narrows (the data-skipping win compaction
    is the natural moment to restore)."""
    path = str(tmp_path / "frag")
    df = spark.range(0, 400).select(
        F.col("id").cast("int").alias("cell"), F.lit("x").alias("payload")
    )
    # interleaved appends: every file spans nearly the full cell range
    for m in range(4):
        df.where(F.col("cell") % 4 == m).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    before, after = compact_in_place(
        spark, path, target_rows_per_file=100, sort_col="cell"
    )
    assert before == 4 and after == 4
    # per-file ranges must now partition the key space: non-overlapping
    import pyarrow.parquet as pq
    import glob

    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        t = pq.read_table(f, columns=["cell"])
        vals = t.column("cell").to_pylist()
        ranges.append((min(vals), max(vals)))
    ranges.sort()
    for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi < lo2
    assert spark.read.parquet(path).count() == 400


def test_compact_in_place_recovers_from_mid_swap_crash(spark, tmp_path):
    """ADVICE r07 (medium): a crash between the two renames leaves
    ``path`` absent with the only copies at .compact-old (and maybe
    .compact-tmp).  The next invocation must RECOVER the table, not
    rmtree both surviving copies — which would permanently lose the
    index and re-admit every duplicate."""
    import shutil

    path = str(tmp_path / "idx")
    spark.range(0, 100).select(
        F.col("id").cast("int").alias("doc_id")
    ).coalesce(1).write.parquet(path)

    # Simulate the crash window: rename(path, old) done, rename(tmp,
    # path) not — path gone, old holds the original, tmp a rewrite.
    old, tmp = path + ".compact-old", path + ".compact-tmp"
    os.rename(path, old)
    shutil.copytree(old, tmp)
    assert not os.path.exists(path)

    before, after = compact_in_place(spark, path, target_rows_per_file=1000)
    assert os.path.exists(path)
    assert spark.read.parquet(path).count() == 100  # nothing lost
    assert not os.path.exists(old) and not os.path.exists(tmp)
    assert after == 1

    # Variant: only tmp survives (old already cleaned) — still recovers.
    os.rename(path, tmp)
    before, after = compact_in_place(spark, path, target_rows_per_file=1000)
    assert spark.read.parquet(path).count() == 100

    # Nothing to recover from → explicit error, not silent rebuild.
    shutil.rmtree(path)
    with pytest.raises(FileNotFoundError):
        compact_in_place(spark, path, target_rows_per_file=1000)


def test_start_dedup_ingest_stream_compacts_and_dedups(spark, tmp_path):
    """The packaged streaming loop (start_dedup_ingest_stream): exact
    screen over micro-batches, cross-batch dup dropped, and the index
    swap-compacted on the batch_id rhythm — file count bounded by size
    while the corpus and index stay semantically intact."""
    from functools import partial

    from data_engineering_for_e_commerce_logistics_spark.streaming.ingest import (
        start_dedup_ingest_stream,
    )

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    os.makedirs(src)

    def screen(batch_df, idx):
        return incremental_exact_dedup(batch_df, idx, bloom_bits=1 << 12)

    run = partial(
        start_dedup_ingest_stream,
        spark,
        src,
        corpus,
        index,
        str(tmp_path / "ckpt"),
        screen,
        compact_every=2,  # compact on batch_ids 1, 3, ...
        compact_target_rows=TARGET_ROWS,
    )

    # batch 0: two docs
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id int, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)
    assert spark.read.parquet(corpus).count() == 2

    # batch 1: one cross-batch dup (normalized match) + one new doc —
    # batch_id 1 triggers compaction afterwards
    spark.createDataFrame(
        [(10, "ALPHA  beta"), (11, "epsilon zeta")], "doc_id int, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)

    kept = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert kept == [1, 2, 11], kept
    assert spark.read.parquet(index).count() == 3
    # the compaction on batch_id 1 left the whole index in one file
    assert parquet_file_count(index) == 1
    assert not os.path.exists(index + ".compact-tmp")

    # batch 2: replay everything — zero fresh, no compaction this batch
    spark.createDataFrame(
        [(20, "alpha beta"), (21, "epsilon  ZETA")], "doc_id int, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)
    assert sorted(
        r.doc_id for r in spark.read.parquet(corpus).collect()
    ) == [1, 2, 11]
    assert spark.read.parquet(index).count() == 3


def test_dedup_ingest_stream_replay_is_corpus_exactly_once(spark, tmp_path):
    """ADVICE r07 (low): micro-batch REPLAY must not duplicate corpus
    rows.  Simulate the worst crash window — corpus committed, index
    appended, checkpoint commit lost — by wiping the checkpoint AND
    the index after a run, then re-running the same source: every
    batch_id replays, the recomputed ``fresh`` is non-empty (the
    index is gone), yet the committed batch partitions are skipped so
    the corpus holds each doc exactly once."""
    import shutil
    from functools import partial

    from data_engineering_for_e_commerce_logistics_spark.streaming.ingest import (
        start_dedup_ingest_stream,
    )

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def screen(batch_df, idx):
        return incremental_exact_dedup(batch_df, idx, bloom_bits=1 << 12)

    run = partial(
        start_dedup_ingest_stream, spark, src, corpus, index, ckpt, screen
    )

    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id int, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)
    assert spark.read.parquet(corpus).count() == 2

    # replay-from-zero: checkpoint and index gone, corpus partitions
    # committed — the _SUCCESS guard must skip the rewrite
    shutil.rmtree(ckpt)
    shutil.rmtree(index)
    run().awaitTermination(120)
    rows = spark.read.parquet(corpus).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]  # no duplicates
    # the discovered batch_id lineage column is present and prunable
    assert "batch_id" in spark.read.parquet(corpus).columns
    assert spark.read.parquet(index).count() == 2  # index rebuilt


def test_semdedup_ingest_stream_with_cell_sorted_compaction(spark, tmp_path):
    """The SEMANTIC family through the packaged streaming loop:
    incremental_semdedup as the screen partial, cell-sorted swap
    compaction, cross-batch semantic dup dropped while the orthogonal
    vector passes."""
    from functools import partial

    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        incremental_semdedup,
    )
    from data_engineering_for_e_commerce_logistics_spark.streaming.ingest import (
        start_dedup_ingest_stream,
    )

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    os.makedirs(src)

    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "centroid_id long, cv array<double>",
    )

    def screen(batch_df, idx):
        return incremental_semdedup(batch_df, idx, centroids, tau=0.9)

    run = partial(
        start_dedup_ingest_stream,
        spark,
        src,
        corpus,
        index,
        str(tmp_path / "ckpt"),
        screen,
        schema="vec_id long, embedding array<double>",
        compact_every=2,
        compact_target_rows=TARGET_ROWS,
        compact_sort_col="cell",
    )

    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)
    assert spark.read.parquet(corpus).count() == 2

    # batch 1: a near-parallel re-embed of vec 0 (cosine ≈ 1 > tau)
    # plus a genuinely new direction; batch_id 1 → compaction after
    spark.createDataFrame(
        [(10, [0.999, 0.01, 0.0]), (11, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)

    kept = sorted(r.vec_id for r in spark.read.parquet(corpus).collect())
    assert kept == [0, 1, 11], kept
    idx_df = spark.read.parquet(index)
    assert idx_df.count() == 3
    assert set(idx_df.columns) == {"vec_id", "v", "nrm", "cell"}
    assert parquet_file_count(index) == 1  # cell-sorted compaction ran


def test_minhash_ingest_stream_with_banded_sidecar(spark, tmp_path):
    """The MinHash family through the packaged loop, exercising the
    sidecar machinery: the banded-index projection appends alongside
    the signature index, the screen consumes it (skipping index
    re-banding), and both paths compact on the same rhythm.  A
    one-token edit arriving batches later is dropped (near-dup) while
    new content passes."""
    from functools import partial

    from data_engineering_for_e_commerce_logistics_spark.operators.dedup import (
        bands_of,
        incremental_minhash_dedup,
    )
    from data_engineering_for_e_commerce_logistics_spark.streaming.ingest import (
        start_dedup_ingest_stream,
    )

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    bands = str(tmp_path / "bands")
    os.makedirs(src)

    def screen(batch_df, idx, sidecar_frames):
        return incremental_minhash_dedup(
            batch_df,
            idx,
            threshold=0.6,
            banded_index=sidecar_frames["bands"],
        )

    run = partial(
        start_dedup_ingest_stream,
        spark,
        src,
        corpus,
        index,
        str(tmp_path / "ckpt"),
        screen,
        compact_every=2,
        compact_target_rows=TARGET_ROWS,
        sidecars={"bands": (bands, bands_of)},
    )

    toks = [f"tok{i}" for i in range(40)]
    spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id int, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)
    assert spark.read.parquet(corpus).count() == 1
    assert os.path.exists(bands)

    # batch 1: near-dup (one appended token) + unrelated doc;
    # batch_id 1 → both paths compact afterwards
    other = [f"zz{i}" for i in range(40)]
    spark.createDataFrame(
        [(10, " ".join(toks + ["extra"])), (11, " ".join(other))],
        "doc_id int, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)

    kept = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert kept == [1, 11], kept
    assert spark.read.parquet(index).count() == 2
    # bands sidecar: 8 band rows per indexed signature, one file after
    # the rhythm compaction
    assert spark.read.parquet(bands).count() == 16
    assert parquet_file_count(index) == 1
    assert parquet_file_count(bands) == 1


def test_simhash_ingest_stream(spark, tmp_path):
    """Fourth of four: the SimHash family through the packaged loop
    (no sidecar — its band keys derive from the 64-bit fingerprint in
    the index itself), completing the all-families matrix."""
    from functools import partial

    from data_engineering_for_e_commerce_logistics_spark.operators.dedup import (
        incremental_simhash_dedup,
    )
    from data_engineering_for_e_commerce_logistics_spark.streaming.ingest import (
        start_dedup_ingest_stream,
    )

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    os.makedirs(src)

    def screen(batch_df, idx):
        return incremental_simhash_dedup(batch_df, idx, max_hamming=3)

    run = partial(
        start_dedup_ingest_stream,
        spark,
        src,
        corpus,
        index,
        str(tmp_path / "ckpt"),
        screen,
        compact_every=2,
        compact_target_rows=TARGET_ROWS,
    )

    toks = [f"w{i}" for i in range(120)]
    spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id int, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)

    # later batch: a one-token edit (hamming <= 3 of doc 1) + new text
    spark.createDataFrame(
        [
            (10, " ".join(toks[:-1] + ["edited"])),
            (11, " ".join(f"q{i}" for i in range(120))),
        ],
        "doc_id int, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    run().awaitTermination(120)

    kept = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert kept == [1, 11], kept
    assert spark.read.parquet(index).count() == 2
    assert parquet_file_count(index) == 1  # batch_id-1 compaction ran
