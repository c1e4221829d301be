"""Batch-refresh entry for the streaming rollup (availableNow):
processes whatever new event files have landed since the last
checkpoint, upserts the hourly rollup, and exits — the DAG's
incremental-refresh task.

    python tools/run_rollup_stream.py [events_dir] [sink_dir] [checkpoint_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from data_engineering_for_e_commerce_logistics_spark.session import get_spark
    from data_engineering_for_e_commerce_logistics_spark.streaming.ingest import (
        start_rollup_stream,
    )

    events_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/logiflow_events"
    sink = sys.argv[2] if len(sys.argv) > 2 else "/tmp/logiflow_rollup"
    ckpt = sys.argv[3] if len(sys.argv) > 3 else "/tmp/logiflow_rollup_ckpt"

    spark = get_spark(app_name="logiflow-rollup-refresh")
    query = start_rollup_stream(spark, events_dir, sink, ckpt)
    query.awaitTermination()
    print(f"rollup refreshed: {sink}")


if __name__ == "__main__":
    main()
