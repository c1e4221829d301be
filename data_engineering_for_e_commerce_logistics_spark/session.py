"""SparkSession factory.

Reference parity: src/utils/config.py:33-99 builds a process-wide
singleton; here the singleton is the SparkSession itself.  Settings
are chosen for correctness parity with the pandas reference
(UTC session timezone ~ cleaners.py:162-163 tz normalization) and for
scale (AQE, Arrow, tuned shuffle partitions).

Local-mode notes: tests/bench run on local[N] where the driver is the
only JVM; on a real cluster the same builder settings apply per-app.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_engineering_for_e_commerce_logistics_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Env overrides:
        SPARK_GRAFT_CPUS        -> local[N] parallelism (default *)
        SPARK_GRAFT_DRIVER_MEM  -> driver memory in local mode
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # UTC everywhere: the reference normalizes tz-aware stamps to UTC
        # (cleaners.py:162-163); a fixed session tz also makes the DuckDB
        # oracle comparison timezone-stable.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas_udf / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Whole-stage-codegen class cache: the default 100 entries
        # thrashes in long many-query sessions (a 60-query benchmark
        # generates far more compiled stages), re-compiling hot stages
        # and inflating late-session queries up to 10×.  Sized for an
        # analytics session, not a single query.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        # Let AQE coalesce the output partitioning of cached plans
        # (off by default, SPARK-35332): iterative operators cache a
        # small derived table (pagerank's edge list, k-means
        # assignments) and without this the cache pins the full
        # shuffle-partition fan-out on every downstream read.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # ANSI off: null-on-error arithmetic matches the pandas reference's
        # coerce-to-NaN behavior (e.g. to_datetime(errors="coerce")).
        .config("spark.sql.ansi.enabled", "false")
        # Parquet TIMESTAMP(NANOS) (e.g. events.ts in the test data) is
        # unreadable by Spark natively; surface it as LongType ns and let
        # the catalog convert to TimestampType losslessly (catalog.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
