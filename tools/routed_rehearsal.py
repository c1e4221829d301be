"""Routed-vs-flat SemDeDup rehearsal at sf0.5 (VERDICT r05 ask #4,
extended per VERDICT r06 ask #3 to sweep until pair recall >= 0.9).

The r05 unit measurement (n=10K, k=100, synthetic clusters) showed the
two-level router cutting the flat n·k assignment ~4×; this script
re-measures on the sf0.5 REHEARSAL corpus (10K perturbed-replica
embeddings from tools/scale_rehearsal.py, k=ceil(sqrt(n))=100 seed
centroids — the SemDeDup cell rule) and sweeps the recall knobs
(``train_supers`` Lloyd rounds × ascending ``n_probe``), reporting
for each configuration:

* assignment wall-clock (the stage routing accelerates),
* agreement with the exact flat assignment (cell-level recall),
* end-to-end mining wall (assignment + per-cell top-k pair mining),
* pair recall: |routed pairs ∩ flat pairs| / |flat pairs| — the
  SemDeDup-relevant metric (a mis-routed vector mines in an adjacent
  cell; what matters is which near-dup PAIRS survive).

The claim that matters at 100 TB is "cheaper at the SAME recall", not
just "cheaper": the sweep walks n_probe upward per training depth and
reports the cheapest configuration whose pair recall clears
RECALL_TARGET, which becomes the documented production default
(similarity.ROUTED_DEFAULTS).  n_probe == n_super recovers the exact
assignment (every live super probed), so the sweep always terminates
at recall 1.0.

Usage: python tools/routed_rehearsal.py   (solo — no concurrent Spark)
Appends nothing; copy the printed JSON/table into SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF05 = os.path.join(_REPO, ".scale", "sf0.5")
TOPK = 3  # per-cell pair budget, same as SEMDEDUP_TOPK


def flat_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Exact nearest centroid by broadcast scan — the n·k baseline."""
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        _fold_sum,
    )

    scored = F.broadcast(cents).crossJoin(vecs).withColumn(
        "__dist",
        _fold_sum(
            F.zip_with(F.col("v"), F.col("__cv"), lambda x, y: (x - y) * (x - y))
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__dist").asc(), F.col("__cid").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", F.col("__cid").alias("cell"))
    )


def mine_pairs(vecs: DataFrame, cells: DataFrame) -> DataFrame:
    """Per-cell top-k cosine pairs over an assignment — the SemDeDup
    miner body shared by the flat and routed paths."""
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        _fold_sum,
    )

    normed = vecs.withColumn(
        "nrm", F.sqrt(_fold_sum(F.transform(F.col("v"), lambda x: x * x)))
    )
    assigned = normed.join(cells, "vec_id")
    a = assigned.select(
        "cell",
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        "cell",
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            _fold_sum(F.zip_with("va", "vb", lambda x, y: x * y))
            / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("cell", "id_a", "id_b")
    )


def main() -> None:
    from data_engineering_for_e_commerce_logistics_spark.operators.similarity import (
        _as_double_vec,
        two_level_assign,
    )
    from data_engineering_for_e_commerce_logistics_spark.session import get_spark

    if not os.path.exists(os.path.join(SF05, "embeddings.parquet")):
        sys.exit("run tools/scale_rehearsal.py first to build .scale/sf0.5")

    spark = get_spark(app_name="routed-rehearsal")
    emb = spark.read.parquet(os.path.join(SF05, "embeddings.parquet"))
    n = emb.count()
    k = math.ceil(math.sqrt(n))
    centroids = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    vecs = emb.select("vec_id", _as_double_vec("embedding").alias("v"))
    cents = centroids.select(
        F.col("centroid_id").alias("__cid"), _as_double_vec("cv").alias("__cv")
    )
    print(f"n={n} k={k} n_super=ceil(sqrt(k))={math.ceil(math.sqrt(k))}")

    def timed_collect(df: DataFrame) -> tuple[float, list]:
        spark.catalog.clearCache()
        t0 = time.time()
        rows = df.collect()
        return time.time() - t0, rows

    # warmup (codegen) then timed flat baseline
    flat_assign(vecs, cents).write.format("noop").mode("overwrite").save()
    t_flat, flat_rows = timed_collect(flat_assign(vecs, cents))
    flat_map = {r.vec_id: r.cell for r in flat_rows}
    flat_cells = spark.createDataFrame(flat_rows)
    t_flat_mine, flat_pairs_rows = timed_collect(mine_pairs(vecs, flat_cells))
    flat_pairs = {(r.id_a, r.id_b) for r in flat_pairs_rows}
    out = {
        "flat": {
            "assign_sec": round(t_flat, 2),
            "mine_sec": round(t_flat_mine, 2),
            "pairs": len(flat_pairs),
        }
    }
    print("flat:", out["flat"])

    RECALL_TARGET = 0.9
    n_super = math.ceil(math.sqrt(k))
    at_target: list[tuple[str, dict]] = []
    for train in (0, 1, 3):
        for n_probe in (1, 2, 3, 4, 5, 6, 8, n_super):
            if n_probe > n_super:
                break
            name = f"routed_p{n_probe}" + (f"_trained{train}" if train else "")
            cfg = dict(n_probe=n_probe, train_supers=train, exact_means=bool(train))
            two_level_assign(emb, centroids, **cfg).write.format("noop").mode(
                "overwrite"
            ).save()  # warmup
            t_asg, rows = timed_collect(two_level_assign(emb, centroids, **cfg))
            agree = sum(1 for r in rows if flat_map.get(r.vec_id) == r.cell)
            cells = spark.createDataFrame(rows)
            t_mine, pair_rows = timed_collect(mine_pairs(vecs, cells))
            pairs = {(r.id_a, r.id_b) for r in pair_rows}
            out[name] = {
                "n_probe": n_probe,
                "train_supers": train,
                "assign_sec": round(t_asg, 2),
                "mine_sec": round(t_mine, 2),
                "assign_agreement": round(agree / n, 3),
                "pairs": len(pairs),
                "pair_recall_vs_flat": round(
                    len(pairs & flat_pairs) / max(len(flat_pairs), 1), 3
                ),
            }
            print(name, out[name])
            if out[name]["pair_recall_vs_flat"] >= RECALL_TARGET:
                at_target.append((name, out[name]))
                break  # recall is monotone in n_probe; cheapest found

    print(json.dumps(out, indent=1))
    if at_target:
        flat_total = out["flat"]["assign_sec"] + out["flat"]["mine_sec"]
        best = min(
            at_target, key=lambda kv: kv[1]["assign_sec"] + kv[1]["mine_sec"]
        )
        bt = best[1]["assign_sec"] + best[1]["mine_sec"]
        print(
            f"\nCHEAPEST AT RECALL>={RECALL_TARGET}: {best[0]} "
            f"(n_probe={best[1]['n_probe']}, train_supers={best[1]['train_supers']}) "
            f"end-to-end {bt:.2f}s vs flat {flat_total:.2f}s "
            f"({flat_total / max(bt, 1e-9):.2f}x cheaper at equal recall), "
            f"pair_recall={best[1]['pair_recall_vs_flat']}"
        )
        print(
            "suggested ROUTED_DEFAULTS: "
            f"dict(n_probe={best[1]['n_probe']}, "
            f"train_supers={best[1]['train_supers']}, exact_means=True)"
        )
    else:
        print(f"\nNO CONFIG reached recall {RECALL_TARGET} — raise n_probe grid")


if __name__ == "__main__":
    main()
