"""Temporal operators Spark lacks natively — as-of joins.

The as-of join (each left row matched to the latest right row with
right.time <= left.time per key) has no Spark primitive.  The
distributed-native construction is the union-and-carry trick:

    tag both sides → union on (key, time) → per-key window sorted by
    (time, side) carrying the last non-null right payload forward →
    keep left rows.

One shuffle on the key, one in-partition sort — the same cost as a
window aggregate, with none of the per-row range probing a naive
theta-join (`left.t >= right.t` + row_number) would do: Spark plans
that as a broadcast nested loop, O(|L|·|R|) per key.

Ref parity note: the reference has no as-of/range joins (SURVEY §2.4);
this is part of the engine's beyond-reference time-series surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_self_join(
    df: DataFrame,
    key: str,
    time_col: str,
    id_col: str,
    max_gap_seconds: float,
) -> DataFrame:
    """All (a, b) row pairs sharing ``key`` with
    0 <= time_b - time_a <= max_gap and (time, id)_a < (time, id)_b.

    A naive `ON a.t BETWEEN b.t AND b.t + gap` inequality join plans
    as a broadcast nested loop — O(|rows|²) per key.  The distributed
    form grids time into gap-width buckets and explodes one side to
    its 3 adjacent buckets: any qualifying pair differs by ≤1 bucket,
    so an equi-join on (key, bucket) finds each pair exactly once,
    then the exact time filter trims the grid slop.  Cost: 3× one
    side + a hash join on a short compound key."""
    sec = F.col(time_col).cast("timestamp").cast("double")
    bucket = F.floor(sec / F.lit(max_gap_seconds)).cast("long")

    a = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id_a"),
        sec.alias("t_a"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("b"),
    )
    b = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id_b"),
        sec.alias("t_b"),
        bucket.alias("b"),
    )
    gap = F.col("t_b") - F.col("t_a")
    ordered = (F.col("t_a") < F.col("t_b")) | (
        (F.col("t_a") == F.col("t_b")) & (F.col("id_a") < F.col("id_b"))
    )
    return (
        a.join(b, ["k", "b"])
        .filter(ordered & (gap >= 0) & (gap <= max_gap_seconds))
        .select(
            F.col("k").alias(key),
            "id_a",
            "id_b",
            (gap / F.lit(86400.0)).alias("gap_days"),
        )
        .distinct()
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row: the latest right row with
    right_time <= left_time (direction="backward"), or the earliest
    with right_time >= left_time ("forward"), matched per `on` key.

    right must be unique per (on, right_time) — pre-aggregate it if
    not, otherwise the carried row would be an arbitrary member of the
    tie.  Left columns are preserved; payload columns arrive as
    `asof_<name>` plus `asof_time`.
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
        F.col(right_time).alias("__rt"),
    )
    u = l.unionByName(r)

    if direction == "backward":
        # right rows sort before left rows at equal time: a quote AT
        # the event time is visible to the event (<= semantics).
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    elif direction == "forward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    carried = u.select(
        *u.columns,
        *[carry(F.col(f"__p_{c}")).alias(f"asof_{c}") for c in payload],
        carry(F.col("__rt")).alias("asof_time"),
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *lcols, *[f"asof_{c}" for c in payload], "asof_time"
    )
