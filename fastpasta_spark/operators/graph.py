"""Iterative graph operators: duplicate-cluster resolution.

A dedup pipeline's last step: candidate PAIRS (from exact hashes,
MinHash-LSH, SimHash or Jaccard — operators/dedup.py) must become
CLUSTERS so exactly one canonical document per group survives. Pairs
alone under-delete: A~B and B~C does not list (A, C), so per-pair
deletion can keep both A and C. The reference's dedup stops at distinct
key counting (`/root/reference/fastpasta/src/stats/rdh_stats.rs:93-98`);
clustering is a north_rule/training-pipeline extension.

Algorithm: hash-min label propagation (each node repeatedly adopts the
minimum label among itself and its neighbours) — converges in
O(graph diameter) rounds. Near-duplicate clusters are dense and shallow
(a boilerplate family is almost a clique), so 3-5 rounds is typical.
For adversarial long-path graphs at 100 TB scale the published
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) converges in O(log n)
rounds with the same per-round shuffle shape; hash-min is the simpler
baseline and is exact regardless — only round COUNT differs.

Scale notes:
  * per round, ONE shuffle of |E| (node, label) rows + a groupBy min
    with map-side partial agg; document text never enters the graph
  * labels are localCheckpoint'ed each round — iterative lineage would
    otherwise grow the plan (and recompute the whole chain) per round
  * convergence test is an .isEmpty() on the changed-label set (cheap:
    |V| rows, early-exits on the first changed row)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 50) -> DataFrame:
    """(src, dst) undirected pair table -> (node, cluster) labels, where
    cluster = the minimum node id reachable from `node` (a deterministic
    canonical representative). Isolated nodes never appear in `pairs`
    and keep themselves as implicit singleton clusters.

    Raises RuntimeError if labels have not converged after max_iter
    rounds (component diameter > max_iter) — silently returning partial
    labels would split one duplicate family into several keepers. Feed
    STAR-shaped exact-dup edges (plans/curate.exact_dup_star_edges,
    diameter 2) rather than long paths when families can be large.
    """
    from fastpasta_spark.functions.cache import (
        release_local_checkpoint,
        track_release,
    )

    edges = (
        pairs.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
        .union(pairs.select(F.col(dst).alias("_u"), F.col(src).alias("_v")))
        .distinct()
        .persist()
    )
    # per-round checkpoints are freed as soon as the NEXT round is
    # materialized (only the convergence check reads both) — without
    # the eager release every round's label table stayed pinned in
    # executor storage for the session's lifetime. The FINAL round's
    # checkpoint backs the returned DataFrame, so it is registered for
    # the session-level release_tracked() instead.
    labels = (
        edges.select(F.col("_u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        # min over neighbours' labels, then min with own label
        prop = (
            edges.join(labels, edges["_v"] == labels["node"])
            .select(F.col("_u").alias("node"), "label")
            .union(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels = prop.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
        )
        converged = changed.isEmpty()
        try:  # best-effort (private plan internals), like the registry
            release_local_checkpoint(labels)  # prev round: consumed above
        except Exception:
            pass
        labels = new_labels
        if converged:
            break
    edges.unpersist()
    track_release(lambda lb=labels: release_local_checkpoint(lb))
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter too large) — raise max_iter or feed "
            "star-shaped exact-dup edges (diameter 2) instead of paths")
    return labels.select("node", F.col("label").alias("cluster"))


def duplicate_clusters(pairs: DataFrame, src: str = "doc_a",
                       dst: str = "doc_b") -> DataFrame:
    """Pairs -> (node, cluster, csize, is_keeper): full cluster
    assignment with the deterministic keeper flag (minimum id). Feed the
    union of exact-dup pairs and near-dup pairs; delete ``NOT is_keeper``.
    """
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("cluster").agg(F.count(F.lit(1)).alias("csize"))
    return (
        cc.join(sizes, "cluster")
        .select(
            "node", "cluster", "csize",
            (F.col("node") == F.col("cluster")).alias("is_keeper"),
        )
    )
