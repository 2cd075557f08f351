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


# ---- candidate-pair budget (round 13) -----------------------------------
# Blocked pair-domain operators (LSH bucket self-joins, fuzzy-match block
# joins, ER blocking) are quadratic in BLOCK size by semantics. A
# blocking key whose blocks grow with the data ("every doc is a 100-way
# replica") turns one join into a disk-filling shuffle — observed on the
# round-12 sf10 sweep (SCALE.md). The block-size aggregate already
# implicit in these plans prices the join exactly: Σ n·(n-1)/2 for a
# self-join with a < b, Σ n_left·n_right for a probe join. The guard
# runs that aggregate as a cheap pre-flight (counts only — no pair is
# materialized) and refuses loudly above the configured budget, turning
# "blocking keys must keep expected block size flat" from docstring
# prose into a runtime check — the same philosophy as
# ``assert_bounded_frame`` for global windows.

PAIR_BUDGET_CONF = "spark.bfdb.maxCandidatePairs"
# Default: 1e9 candidate pairs. Far above any gate/bench SF (the largest
# measured candidate domain is 16.9M at sf1) yet below the regime that
# filled the disk at sf10; each surviving pair costs a verify
# (levenshtein / exact-Jaccard), so 1e9 candidates is already hours of
# cluster work that deserves an explicit opt-in.
DEFAULT_MAX_CANDIDATE_PAIRS = 1_000_000_000


def estimate_candidate_pairs(
    df: DataFrame, block_cols: list, right_df: DataFrame | None = None
) -> int:
    """Exact candidate-pair count of a blocked join, computed from the
    block-size aggregate (one partial-agg shuffle over the block keys —
    never over pairs). ``right_df=None`` prices the self-join with
    ``a < b`` dedup (Σ n·(n-1)/2); otherwise the bipartite probe join
    (Σ n_left·n_right over matching keys). Doubles are exact for counts
    below 2^53 — far beyond any budget worth configuring."""
    from pyspark.sql import functions as F

    left = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_na"))
    if right_df is None:
        est = left.agg(
            F.sum(
                F.col("_na").cast("double")
                * (F.col("_na").cast("double") - 1.0)
                / 2.0
            ).alias("_p")
        ).first()["_p"]
    else:
        right = right_df.groupBy(*block_cols).agg(
            F.count(F.lit(1)).alias("_nb")
        )
        est = (
            left.join(right, list(block_cols))
            .agg(
                F.sum(
                    F.col("_na").cast("double") * F.col("_nb").cast("double")
                ).alias("_p")
            )
            .first()["_p"]
        )
    return int(est or 0)


def assert_pair_budget(
    df: DataFrame,
    block_cols: list,
    *,
    right_df: DataFrame | None = None,
    context: str = "",
    remediation: str = "",
) -> int:
    """Pre-flight refusal of an over-budget blocked pair join: estimate
    the candidate-pair count (``estimate_candidate_pairs``) and raise
    ``PairBudgetError`` when it exceeds ``spark.bfdb.maxCandidatePairs``
    (default 1e9; 0 disables). Returns the estimate so call sites can
    log it. Call on the PERSISTED block frame where one exists — the
    counting job then doubles as the cache materializer and the real
    join reads the cached blocks."""
    from betfair_database_spark.exceptions import PairBudgetError

    budget = int(
        df.sparkSession.conf.get(
            PAIR_BUDGET_CONF, str(DEFAULT_MAX_CANDIDATE_PAIRS)
        )
    )
    if budget <= 0:
        return -1
    est = estimate_candidate_pairs(df, block_cols, right_df)
    if est > budget:
        raise PairBudgetError(est, budget, context, remediation)
    return est
