"""incremental_semdedup routed-default rehearsal (VERDICT r07 ask #8).

The r08 default flip makes ``incremental_semdedup(routed="auto")``
count the codebook and swap the flat n·k broadcast assignment for the
two-stage routed plan once k > ROUTED_EXACT_MAX_SUPERS.  This script
measures the flip's effect where it matters — the per-batch ingest
screen — on the sf0.5 rehearsal corpus (10 K embeddings, 5 replica
batches) under the production sqrt-rule codebook k = ceil(sqrt(n)) =
100 (n_super = 10: the EXACT routed regime, so both plans are
bit-identical and the comparison is pure cost):

* batch 1 = replicas 0-2 (6 K vectors) builds the index from empty;
* batch 2 = replicas 3-4 (4 K vectors) screens against the 6 K-row
  index — the steady-state shape;
* each batch timed min-of-3 under routed=False (the old default) and
  routed="auto" (the new default, resolving to the two-stage plan),
  with kept-counts asserted equal across modes.

Usage: python tools/inc_semdedup_auto_rehearsal.py   (solo; builds
.scale/sf0.5 via tools/scale_rehearsal.py --build if missing)
Prints one JSON line; copy the row into SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

SF05 = os.path.join(_REPO, ".scale", "sf0.5")
SHIFT = 10**8  # replica id offset, same as scale_rehearsal


def main() -> None:
    if not os.path.exists(os.path.join(SF05, "embeddings.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(_HERE, "scale_rehearsal.py"), "--build"],
            check=True,
        )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        ROUTED_EXACT_MAX_SUPERS,
        incremental_semdedup,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("inc-semdedup-auto-rehearsal")
        .getOrCreate()
    )
    emb = spark.read.parquet(os.path.join(SF05, "embeddings.parquet"))
    n = emb.count()
    k = math.ceil(math.sqrt(n))
    assert k > ROUTED_EXACT_MAX_SUPERS, (k, ROUTED_EXACT_MAX_SUPERS)
    centroids = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    b1 = emb.where(F.floor(F.col("vec_id") / SHIFT) < 3)
    b2 = emb.where(F.floor(F.col("vec_id") / SHIFT) >= 3)

    def run(routed):
        t0 = time.time()
        _, d1 = incremental_semdedup(b1, None, centroids, tau=0.95, routed=routed)
        d1 = d1.localCheckpoint()
        n1 = d1.count()
        t1 = time.time()
        _, d2 = incremental_semdedup(b2, d1, centroids, tau=0.95, routed=routed)
        n2 = d2.count()
        t2 = time.time()
        return {"batch1_sec": round(t1 - t0, 3), "batch2_sec": round(t2 - t1, 3),
                "kept1": n1, "kept2": n2}

    out = {"n": n, "k": k, "modes": {}}
    for mode in (False, "auto"):
        samples = [run(mode) for _ in range(3)]
        best = min(samples, key=lambda s: s["batch1_sec"] + s["batch2_sec"])
        kept = {(s["kept1"], s["kept2"]) for s in samples}
        assert len(kept) == 1, kept
        out["modes"][str(mode)] = {
            "min_of_3": best,
            "samples": [
                round(s["batch1_sec"] + s["batch2_sec"], 3) for s in samples
            ],
        }
    f, a = out["modes"]["False"]["min_of_3"], out["modes"]["auto"]["min_of_3"]
    assert (f["kept1"], f["kept2"]) == (a["kept1"], a["kept2"])  # bit-identical
    out["speedup_total"] = round(
        (f["batch1_sec"] + f["batch2_sec"]) / (a["batch1_sec"] + a["batch2_sec"]), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
