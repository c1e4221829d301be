"""Hadoop-FileSystem portability layer (ADVICE r12): the driver-side
state-maintenance loops (sketch segments, incremental indexes,
in-place compaction, the MERGE swap) must do their path work through
the Hadoop FS API — the same abstraction Spark reads/writes through —
so they run unchanged against HDFS/S3A.  Locally the API resolves to
LocalFileSystem, so these tests exercise the production code path."""

import os

import pytest

from data_engineering_for_e_commerce_logistics_spark import fsio


def test_fs_join_is_uri_safe():
    assert fsio.fs_join("s3a://bucket/prefix/", "batch_id=3", "_SUCCESS") == (
        "s3a://bucket/prefix/batch_id=3/_SUCCESS"
    )
    assert fsio.fs_join("/local/dir", "x.parquet") == "/local/dir/x.parquet"


def test_exists_delete_roundtrip(spark, tmp_path):
    d = str(tmp_path / "t")
    assert not fsio.fs_exists(spark, d)
    spark.range(3).write.parquet(d)
    assert fsio.fs_exists(spark, d)
    assert fsio.fs_exists(spark, fsio.fs_join(d, "_SUCCESS"))
    fsio.fs_delete(spark, d)
    assert not fsio.fs_exists(spark, d)
    fsio.fs_delete(spark, d)  # missing-path tolerant


def test_rename_moves_directory_and_rejects_existing_dst(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(5).write.parquet(src)
    fsio.fs_rename(spark, src, dst)
    assert not fsio.fs_exists(spark, src)
    assert spark.read.parquet(dst).count() == 5
    # os.rename contract: never silently merge/move-into — an existing
    # destination is a swap-logic bug upstream, so it must raise
    spark.range(2).write.parquet(src)
    with pytest.raises(FileExistsError):
        fsio.fs_rename(spark, src, dst)


def test_list_names_and_parquet_file_count(spark, tmp_path):
    from data_engineering_for_e_commerce_logistics_spark.operators.layout import (
        parquet_file_count,
    )

    d = str(tmp_path / "frag")
    spark.range(100).repartition(4).write.parquet(d)
    names = fsio.fs_list_names(spark, d)
    assert "_SUCCESS" in names
    # Hadoop's count must agree with the driver-local glob (and must
    # not count LocalFileSystem's .crc sidecars)
    want = len([n for n in os.listdir(d) if n.endswith(".parquet")])
    assert parquet_file_count(d, spark) == want == 4
    assert fsio.fs_list_names(spark, str(tmp_path / "absent")) == []
