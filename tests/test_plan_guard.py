"""Engine-wide physical-plan regression guard.

The round-7/8 shuffle audits were manual plan reads; this pins their
outcome: across EVERY suite row's executed plan,

- ``CartesianProduct`` never appears (nothing in the engine is allowed
  to fall back to an unbroadcast cross product), and
- ``BroadcastNestedLoopJoin`` appears only in the audited allowlist —
  rows whose plan deliberately crossJoins a BROADCAST side that is
  bounded by construction (a 1-row global aggregate, a quantile/stats
  table, a fitted model, a query-vector frame). A new row that
  accidentally introduces a nested-loop join fails here with its name.

Plan building executes whatever driver-side work a row does at
construction time (k-means fits, ANN index builds), so this runs at
sf0.001 and takes a few minutes — the same order as one gate chunk.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

# Audited rows whose BroadcastNestedLoopJoin is a broadcast
# scalar-subquery / bounded-stats-side cross join (see PLANS.md round-8
# anti-pattern sweep). Keep sorted; additions need the same audit.
BNLJ_ALLOWED = {
    # round 10: two crossJoin(broadcast(...)) of ONE-ROW aggregates (the
    # global baseline and the normalizer) — bounded by construction
    "sample_doremi_reweight",
    "dedup_minhash_recall",
    # round 14: the ssjoin prefix screen crossJoins broadcast(nmin) — a
    # 1-ROW global aggregate (dedup.py `base.agg(min(size(hs)))`), bounded
    # by construction. The BNLJ existed before the round-14 tier-2 rewrite
    # but was invisible to this guard: the eager survivors checkpoint
    # split the row into two plans and the guard only saw the second.
    "dedup_containment_ssjoin",
    "dedup_jaccard_ssjoin",
    "ev_type_drift_kl",
    "ev_value_drift_ks",
    "graph_triangle_count",
    "heavy_hitters_tokens",
    "kmeans_update_step",
    "knn_batch_top3",
    "knn_hard_negatives",
    "knn_ivf_top10",
    "knn_recall_at_10",
    "knn_recall_quantized",
    "pipeline_cluster_balance",
    "pipeline_gopher_dedup_summary",
    "q11_share_of_total",
    "q22_scalar_subquery_anti",
    "quantile_histogram_price",
    "sample_dsir_importance_topk",
    "sample_match_target_mix",
    "sample_temperature_mix",
    "sample_waterfill_budget",
    "sketch_kmv_distinct",
    "sketch_kmv_union",
    "text_bigram_lift",
    "text_bigram_lm_logprob",
    "text_bm25_topk",
    "text_unigram_logprob",
    "tfidf_top_terms",
}


def test_no_cartesian_and_bnlj_only_where_audited(spark):
    from betfair_database_spark.suite import SUITE

    cartesian, rogue_bnlj, errors = [], [], []
    for name, spec in SUITE.items():
        try:
            plan = (
                spec.fn(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # a row failing to PLAN is itself a bug
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            rogue_bnlj.append(name)
    assert not errors, errors
    assert not cartesian, f"CartesianProduct in: {cartesian}"
    assert not rogue_bnlj, (
        "unaudited BroadcastNestedLoopJoin in: "
        f"{rogue_bnlj} — audit the build side (must be bounded by "
        "construction) and add to BNLJ_ALLOWED, or fix the join"
    )
