"""Distributed graph clustering for the dedup pipeline (SURVEY §2.11).

Near-duplicate candidate generation (MinHash / SimHash banding) emits PAIRS;
a training-data pipeline needs GROUPS so it can keep one representative per
duplicate cluster. The bridge is connected components over the pair graph.
The reference engine has no graph stage (its duplicate handling is per-file
identity, reference processor.py duplicate policies) — this is a §2.11
training-data-pipeline extension.

Algorithm: iterative min-label propagation. Every node starts labelled with
its own id; each round, a node adopts the minimum label among itself and its
neighbours; at fixpoint each component carries the minimum node id in the
component as its label. Duplicate clusters are near-cliques, so the graph
diameter — and therefore the round count — is tiny (2-4) even when the
corpus is enormous.

100 TB shape:
  - one round = one shuffle (edge-label join on ``dst`` + min-aggregate on
    ``src``); no global structure, no driver-side graph;
  - lineage is cut per round with ``localCheckpoint`` so the plan stays O(1)
    deep regardless of iteration count (on a cluster with an HDFS checkpoint
    dir, ``checkpoint`` gives the same truncation with storage durability);
  - convergence is detected with a LIMIT-1 anti-check (stop after the first
    changed row is found, not a full count);
  - only nodes that appear in an edge are labelled — in a dedup flow the
    pair set is collision-bounded by banding, so the label frame is orders
    of magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum node id
    reachable from it. Returns ``(node, component)``.

    ``max_iter`` bounds the worst case (a path graph); label propagation
    needs ``diameter`` rounds and duplicate clusters have tiny diameters.
    """
    sym = edges.select(
        F.col(a).cast("long").alias("src"), F.col(b).cast("long").alias("dst")
    )
    sym = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iter):
        neighbour = sym.join(
            labels, sym["dst"] == labels["node"], "inner"
        ).select(sym["src"].alias("node"), F.col("lbl"))
        new_labels = (
            labels.select("node", "lbl")
            .union(neighbour)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break

    if not converged:
        # a silently split component would poison every downstream keep-one
        # decision — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (graph diameter exceeds the bound); raise max_iter"
        )

    return labels.select(F.col("node"), F.col("lbl").alias("component"))
