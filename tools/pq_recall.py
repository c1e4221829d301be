"""Measure pq_suite's retrieval quality against exact ground truth.

Runs the suite's own Spark plan (adc + rerank variants) at the given
scale dir, computes exact L2 top-k per query with numpy, and prints
recall@k for both stages plus the codebook's quantization stats.
This is the honest-recall companion to the DuckDB differential: the
differential proves the plan computes PQ correctly; this measures
what PQ buys on THIS corpus (near-i.i.d. synthetic — the quantizer's
worst case; see SCALE.md round-8 PQ section).

Usage: python tools/pq_recall.py [sf_dir ...]   (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)


def main() -> None:
    from data_engineering_for_e_commerce_logistics_spark.catalog import read_parquet_table
    from data_engineering_for_e_commerce_logistics_spark.plans import graph_queries as gq
    from data_engineering_for_e_commerce_logistics_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="pq-recall")
    out: dict[str, dict] = {}
    for sf_dir in dirs:
        suite = gq.pq_suite(spark, sf_dir).toPandas()
        emb = read_parquet_table(
            spark, os.path.join(sf_dir, "embeddings.parquet")
        ).select("vec_id", "embedding").collect()
        ids = np.array([r.vec_id for r in emb])
        V = np.array([r.embedding for r in emb], dtype=np.float64)
        order = np.argsort(ids)
        ids, V = ids[order], V[order]
        row: dict[str, float] = {"n": int(len(ids))}
        enc = suite[suite.variant == "encode"]
        row["mean_quant_err"] = float(
            enc.groupby("vec_id")["dist"].sum().mean()
        )
        def _recall(part) -> float:
            # denominator over EVERY query the suite convention defines
            # (vec_id < PQ_N_QUERIES), not just queries that returned
            # rows — a query whose probed cells held no candidates must
            # count as 0/topk misses, not silently drop out
            hits = total = 0
            for qid in [i for i in ids if i < gq.PQ_N_QUERIES]:
                q = V[np.searchsorted(ids, qid)]
                exact = ((V - q) ** 2).sum(1)
                exact[np.searchsorted(ids, qid)] = np.inf
                gt = set(
                    ids[np.lexsort((ids, exact))[: gq.PQ_TOPK]].tolist()
                )
                got = set(part[part.query_id == qid].vec_id.astype(int))
                hits += len(gt & got)
                total += gq.PQ_TOPK
            return round(hits / total, 3)

        for variant in ("adc", "rerank"):
            row[f"recall@{gq.PQ_TOPK}_{variant}"] = _recall(
                suite[suite.variant == variant]
            )
        # IVF-PQ probe sweep at the registered codebook parameters
        # (VERDICT r09 ask #7): nprobe is the only knob the registered
        # spec fixes (IVFPQ_PROBE); sweep it so SCALE.md's quality
        # claim is measured at — and around — the driver-checked
        # config.  n_cells = N_CENTROIDS total, so nprobe = n_cells is
        # exhaustive-PQ (the IVF pruning fully off).
        for nprobe in (1, gq.IVFPQ_PROBE, 4, gq.N_CENTROIDS):
            # each suite invocation caches its assignment/code frames;
            # drop them between sweep points so a multi-dir sweep
            # doesn't accumulate pinned storage in the session
            spark.catalog.clearCache()
            ivf = gq.ivfpq_suite(spark, sf_dir, nprobe=nprobe).toPandas()
            row[f"ivfpq_recall@{gq.PQ_TOPK}_nprobe{nprobe}"] = _recall(
                ivf[ivf.variant == "adc"]
            )
        out[sf_dir] = row
        print(sf_dir, row)
    print(json.dumps(out, indent=1))
    art = os.path.join(_REPO, "PQ_RECALL.json")
    with open(art, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {art}")


if __name__ == "__main__":
    main()
