"""Per-query stage profiler (optimization-round instrument, guide §1/§7).

For each named contract query (default: the full bench HEADLINE), runs
one untimed warmup + one timed noop-sink execution under a dedicated
job group, then pulls the Spark UI REST API for per-stage metrics:
executor run time, input bytes, shuffle read/write bytes, task count.
This is the "which stage is the time going to" step the optimization
guide asks for before touching any operator — the SQL-tab view, made
scriptable (the bench session runs with the UI off, so this tool
builds its own UI-enabled session).

Usage: python tools/profile_query.py [--json PATH] [name ...]
Solo — nothing else on the box, or stage times are contention noise.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

UI_PORT = 4099


def _rest(app_id: str, path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def main() -> None:
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]

    import bench
    from data_engineering_for_e_commerce_logistics_spark.plans.registry import (
        all_specs,
    )
    from data_engineering_for_e_commerce_logistics_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    specs = all_specs()
    names = argv or [n for n in bench.HEADLINE if n in specs]
    unknown = [n for n in names if n not in specs]
    if unknown:
        sys.exit(f"unknown specs: {unknown}")

    report: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        spark.catalog.clearCache()
        try:
            sc._jvm.System.gc()
        except Exception:
            pass
        # untimed warmup (codegen compile + parquet footer cache)
        spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        group = f"prof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        sc.setJobGroup("", "")

        job_ids = sorted(sc.statusTracker().getJobIdsForGroup(group))
        stage_ids: set[int] = set()
        for jid in job_ids:
            info = sc.statusTracker().getJobInfo(jid)
            if info:
                stage_ids.update(info.stageIds)
        stages = []
        for sid in sorted(stage_ids):
            try:
                for att in _rest(app_id, f"stages/{sid}"):
                    stages.append(
                        {
                            "stage": sid,
                            "name": att.get("name", "")[:90],
                            "tasks": att.get("numCompleteTasks"),
                            "run_ms": att.get("executorRunTime"),
                            "cpu_ms": round(
                                (att.get("executorCpuTime") or 0) / 1e6
                            ),
                            "input_mb": round(
                                (att.get("inputBytes") or 0) / 1e6, 1
                            ),
                            "sh_read_mb": round(
                                (att.get("shuffleReadBytes") or 0) / 1e6, 2
                            ),
                            "sh_write_mb": round(
                                (att.get("shuffleWriteBytes") or 0) / 1e6, 2
                            ),
                        }
                    )
            except Exception:
                pass
        stages.sort(key=lambda s: -(s["run_ms"] or 0))
        entry = {
            "sec": round(wall, 3),
            "n_jobs": len(job_ids),
            "n_stages": len(stage_ids),
            "total_run_ms": sum(s["run_ms"] or 0 for s in stages),
            "total_tasks": sum(s["tasks"] or 0 for s in stages),
            "sh_write_mb": round(
                sum(s["sh_write_mb"] or 0 for s in stages), 2
            ),
            "stages": stages[:12],
        }
        report[name] = entry
        print(
            f"{name}: {wall:.2f}s jobs={entry['n_jobs']} "
            f"stages={entry['n_stages']} tasks={entry['total_tasks']} "
            f"run={entry['total_run_ms']}ms shW={entry['sh_write_mb']}MB"
        )
        for s in stages[:5]:
            print(
                f"    stage {s['stage']:>4} run={s['run_ms']:>6}ms "
                f"tasks={s['tasks']:>3} in={s['input_mb']}MB "
                f"shR={s['sh_read_mb']}MB shW={s['sh_write_mb']}MB  {s['name']}"
            )

    if json_path:
        with open(json_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")


if __name__ == "__main__":
    main()
