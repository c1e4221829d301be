from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_for_e_commerce_logistics_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Tests run sf0.001-sized frames through thousands of tiny
    # actions; at local[32] every stage schedules 32 near-empty tasks
    # and the suite's wall-clock is task-scheduling overhead (measured
    # r14: the two slowest property tests 101s at local[32] vs 73s at
    # local[6]).  Pin a small test-session width — overridable via
    # SPARK_GRAFT_TEST_CPUS — so the full suite fits the driver's
    # verify budget (r13 timed it out); bench/driver sessions are
    # unaffected (they build their own via $SPARK_GRAFT_CPUS).
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "6")
    spark = get_spark(
        app_name="des-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)
