"""Hadoop-FileSystem-portable path operations for driver-side state
maintenance — the streaming sketch segment store, the incremental
dedup index, and in-place compaction (ADVICE r12: those loops were
``os``/``shutil``-based, i.e. driver-local-filesystem only).

Why not ``os``/``shutil``: they see only the DRIVER's local disk.  On
a real cluster the persisted state lives on HDFS / S3A / ABFS — the
same URIs Spark itself reads and writes.  Routing the maintenance
calls through Hadoop's FileSystem API (already on the driver's JVM
classpath; resolved PER PATH, so mixed schemes in one job work) makes
the ingest loops run unchanged against any Hadoop-compatible store.
In local mode the calls resolve to ``LocalFileSystem`` (file:/), so
every existing test exercises exactly the production code path.

Atomicity is per-store, stated not hidden: ``rename`` is atomic on
HDFS and POSIX file:/ — the write-new + two-rename swap in
``layout.compact_in_place`` / ``streaming.ingest`` relies on that.
On S3A, rename is a non-atomic server-side copy+delete; point the
swap-based loops at a rename-capable layer there (HDFS scratch,
S3Guard-era committers' successors), or keep segments individually
and compact through a manifest instead of a directory swap.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path``'s scheme — LocalFileSystem for
    bare /paths under the default file:/ conf, HDFS/S3A/... for URIs."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_join(*parts: str) -> str:
    """URI-safe path join (``os.path.join`` would mangle ``s3a://``
    authorities on non-POSIX platforms and never belonged in URI
    space): right-strip slashes, join with '/'."""
    head, *rest = parts
    return "/".join([head.rstrip("/")] + [p.strip("/") for p in rest])


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic-on-HDFS/local directory rename with ``os.rename``'s
    contract (raise, never silently no-op): Hadoop's rename returns
    False instead of raising on most failures, and moves src INTO dst
    when dst is an existing directory — both are swap-logic hazards,
    so an existing destination is rejected up front."""
    fs, s = _fs(spark, src)
    _, d = _fs(spark, dst)
    if fs.exists(d):
        raise FileExistsError(f"fs_rename: destination exists: {dst}")
    if not fs.rename(s, d):
        raise OSError(f"fs_rename: {src} -> {dst} failed")


def fs_delete(spark: SparkSession, path: str) -> None:
    """Recursive delete, missing-path tolerant (``shutil.rmtree(...,
    ignore_errors=True)`` semantics)."""
    fs, p = _fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def fs_list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory (empty list if absent)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]
