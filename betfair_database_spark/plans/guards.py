"""Plan-shape guards: runtime assertions that a DataFrame's logical plan
carries the structural property an operator's scale story depends on.

``assert_bounded_frame`` is the real form of the round-5 'global windows
only on bounded frames' invariant: a ``Window`` with no ``partitionBy``
funnels its whole input through ONE task — acceptable only on
aggregation-collapsed or limited frames (bin tables, top-k outputs),
fatal on corpus-sized ones at 100 TB. Round 6 pinned the invariant with
a marker-comment lint; round 7 replaces the honor system with a walk of
the ACTUAL analyzed plan, so a mislabeled corpus-sized frame fails at
query-build time (and the lint now requires the guard call itself).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

# Nodes that collapse row count on their output side. Aggregate output is
# one row per GROUP — boundedness then rests on the grouping key's
# cardinality, which is the operator author's explicit modeling choice
# (bin ids, sport ids), not an accident of passing a raw corpus through.
_BOUNDING = {"Aggregate", "GlobalLimit"}
# Leaves that are bounded by construction (driver-side literal data;
# Range carries literal bounds).
_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation", "Range"}


def _simple_name(cls: str) -> str:
    return cls.rsplit(".", 1)[-1]


def _build_tree(nodes: list[dict], pos: int = 0):
    """Reconstruct the preorder-flattened tree Spark's ``toJSON`` emits.
    Returns (node, children, next_pos)."""
    node = nodes[pos]
    pos += 1
    children = []
    for _ in range(int(node.get("num-children", 0))):
        child, pos = _build_tree(nodes, pos)
        children.append(child)
    return (node, children), pos


def _all_paths_bounded(tree) -> bool:
    (node, children) = tree
    name = _simple_name(node["class"])
    if name in _BOUNDING:
        return True  # everything below is collapsed by this node
    if not children:
        return name in _BOUNDED_LEAVES
    return all(_all_paths_bounded(c) for c in children)


def assert_bounded_frame(df: DataFrame, context: str = "") -> DataFrame:
    """Require that EVERY source-to-root path of ``df``'s analyzed plan
    crosses an aggregation or global limit (or bottoms out in literal
    data) — the structural evidence that a global window over it cannot
    be corpus-sized. Raises ValueError otherwise (including for
    checkpointed/RDD-backed frames, whose lineage no longer proves
    anything). Returns ``df`` so call sites can wrap inline."""
    analyzed = df._jdf.queryExecution().analyzed()
    tree, _ = _build_tree(json.loads(analyzed.toJSON()))
    if not _all_paths_bounded(tree):
        raise ValueError(
            "global-window input is not provably bounded: no aggregation "
            "or limit between the window and its sources"
            + (f" ({context})" if context else "")
            + ". A Window with no partitionBy funnels its whole input "
            "through one task — aggregate or limit the frame first."
        )
    return df
