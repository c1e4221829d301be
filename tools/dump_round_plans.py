"""Dump `.explain("formatted")` for contract queries into plans/r{N}/.

Optimization-round evidence: `plans/r13/<query>_before.txt` and
`..._after.txt` are the committed plan artifacts the judge diffs
against OPTIMIZATION_r13.md's claims (Exchange counts, join strategy,
PushedFilters, Python-eval nodes).

Usage: python tools/dump_round_plans.py --suffix before [name ...]
(default: every bench HEADLINE query). Plans are built, not executed.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

ROUND = 14


def main() -> None:
    argv = list(sys.argv[1:])
    suffix = "before"
    if "--suffix" in argv:
        i = argv.index("--suffix")
        suffix = argv[i + 1]
        del argv[i : i + 2]

    import bench
    from data_engineering_for_e_commerce_logistics_spark.plans.registry import (
        all_specs,
    )
    from data_engineering_for_e_commerce_logistics_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump-round-plans")
    specs = all_specs()
    names = argv or [n for n in bench.HEADLINE if n in specs]
    out_dir = os.path.join(_REPO, "plans", f"r{ROUND}")
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = specs[name].build(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
