"""Distributed graph primitives over DataFrame edge lists.

The engine's graph surface (duplicate-cluster connected components in
`plans/graph_queries.py`, PageRank in the same module) works on plain
(src, dst) DataFrames — no graph library, no driver-side adjacency.
This module adds the reusable primitives: degree profiles and
degree-ordered triangle counting.

Scale notes (the part that matters at 100 TB):

* Triangle counting uses the compact-forward orientation: every
  undirected edge is directed from its lower-(degree, id) endpoint to
  the higher one, so each wedge is generated exactly once and the
  per-node wedge fanout is bounded by min(degree, sqrt(2m)) — the
  standard mitigation for the high-degree-hub blowup that kills the
  naive E⋈E⋈E plan.  See Latapy, "Main-memory triangle computations
  for very large (sparse (power-law)) graphs", TCS 2008 — the
  orientation trick is engine-independent.
* The oriented edge list is built once and cached by the caller if
  reused; the count itself is two hash joins and one aggregate —
  all key-partitioned, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node degree of an undirected edge list (each edge stored
    once, canonical src<dst).  One explode-free union + count."""
    return (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def orient_by_degree(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Direct each undirected edge from its lower-(degree, id) endpoint
    to the higher one (total order, so orientation is deterministic).
    Returns columns (lo, hi).  Two broadcast-sized joins when the
    degree table is small, hash joins otherwise — Spark picks via AQE.
    """
    deg = degrees(edges, src, dst)
    e = (
        edges.join(deg.withColumnRenamed("node", src), src)
        .withColumnRenamed("degree", "deg_src")
        .join(deg.withColumnRenamed("node", dst), dst)
        .withColumnRenamed("degree", "deg_dst")
    )
    src_first = (F.col("deg_src") < F.col("deg_dst")) | (
        (F.col("deg_src") == F.col("deg_dst")) & (F.col(src) < F.col(dst))
    )
    return e.select(
        F.when(src_first, F.col(src)).otherwise(F.col(dst)).alias("lo"),
        F.when(src_first, F.col(dst)).otherwise(F.col(src)).alias("hi"),
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact global triangle count of an undirected graph given as a
    canonical (src<dst, each edge once) edge list.  Returns a 1-row
    DataFrame with column ``triangles``.

    Plan: orient by degree, self-join the oriented list on the wedge
    pivot (lo), and close each wedge against the oriented edges — two
    shuffles on node keys plus one count.  Each triangle is counted
    exactly once because the orientation is acyclic and every triangle
    has exactly one node with two out-edges in it."""
    oriented = orient_by_degree(edges, src, dst)
    e1 = oriented.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = oriented.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    # a wedge (b, c) closes iff (b→c) or (c→b) is an oriented edge;
    # normalize the probe to the canonical orientation-free pair.
    closing = oriented.select(
        F.least("lo", "hi").alias("b"), F.greatest("lo", "hi").alias("c")
    )
    tris = wedges.join(
        closing, ["b", "c"]
    )
    return tris.agg(F.count(F.lit(1)).alias("triangles"))


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Connected components over an undirected pair list via min-label
    propagation to fixpoint (the standard Pregel-less Spark pattern,
    extracted r07 from the ``dedup_clusters`` spec so the leakage-safe
    split can reuse it): labels start as own id; each iteration takes
    the min of own and neighbors' labels; stop when nothing changes.
    Returns ``(node, label)`` for every node APPEARING IN A PAIR —
    isolated items are absent by construction (callers left-join and
    coalesce to own id).

    Iterations = component diameter — each is one join + one
    aggregate.  The edge list is cached before looping (every fixpoint
    action otherwise re-executes the whole upstream pair miner —
    measured 32s → ~3s at sf0.01 for the LSH pipeline); edges are
    O(duplicate pairs), tiny relative to the corpus.  At billion-edge
    scale checkpoint per iteration to truncate lineage, semantics
    unchanged."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges = edges.cache()
    n_edges = edges.count()
    # Size the fixpoint's partitioning from the MEASURED edge count
    # (r08): the loop's joins inherit the session shuffle width, and on
    # a small duplicate-pair graph each of the ~3 jobs/iteration then
    # pays 32-200 near-empty tasks of scheduling overhead — measured
    # 0.5s/iteration for a 477-node graph at sf0.1.  ~2M edges per
    # partition keeps a billion-edge graph at cluster width while a
    # small one runs in a handful of tasks; edges and labels hash-
    # partition on their join keys (dst ↔ node) with the SAME width so
    # each iteration's join avoids re-exchanging the cached sides.
    p = max(1, min(n_edges // 2_000_000 + 1,
                   edges.sparkSession.sparkContext.defaultParallelism))
    raw = edges
    edges = raw.repartition(p, "dst").cache()
    edges.count()  # materializes FROM the still-cached raw frame
    raw.unpersist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .repartition(p, "node")
    )
    labels.cache()
    labels.count()

    # Handle to the frame currently pinned in the block manager.  The
    # loop reassigns ``labels`` to a 2-col PROJECTION of the cached
    # 3-col new_labels, and unpersisting the projection does NOT
    # release the cached plan (sameResult fails, cascade=false) — so
    # the unpersist must target this handle, not ``labels``.
    cached = labels

    while True:
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = F.least(
            labels.label, F.coalesce(F.col("nlabel"), labels.label)
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                labels.node.alias("node"),
                updated.alias("label"),
                # the convergence flag is decidable inside this join's
                # projection (old label is a join input), so the changed
                # count needs no second labels join per iteration
                (updated < labels.label).alias("__changed"),
            )
            # keep the label frame node-partitioned at the measured
            # width so the NEXT iteration's dst↔node join reuses the
            # layout instead of re-exchanging both cached sides
            .repartition(p, "node")
        )
        new_labels.cache()
        changed = new_labels.filter(F.col("__changed")).count()
        cached.unpersist()
        cached = new_labels
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    edges.unpersist()
    # ``cached`` (the final iteration's frame) stays pinned on purpose:
    # the returned labels project from it, and unpersisting here would
    # force a full fixpoint recomputation at the caller's first action.
    return labels
