"""Differential correctness: every registered QuerySpec vs its DuckDB
oracle at sf0.001 (fast); set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's exact scale."""

from __future__ import annotations

import pytest

from data_engineering_for_e_commerce_logistics_spark.plans.registry import all_specs
from tests.oracle import run_pair

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = run_pair(spark, SPECS[name], sf_dir)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    for name in os_:
        assert name in qs, f"oracle {name} has no query"


def test_entry_idempotent_and_stable_schema(spark):
    """Calling entry twice (the driver may) returns the same rows and
    the same schema — no state leaks between invocations."""
    import __spark_entry__ as e

    a, b = e.entry(spark), e.entry(spark)
    assert a.schema == b.schema
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
