"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>}

Each query is forced through the noop sink (full materialization, no driver
collect cost). Session startup is excluded; per-query time includes planning.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "sample_domain_cap",
    "knn_pq_adc_top10",
    "sample_dsir_importance_topk",
    "pipeline_classifier_domain_cap",
    "p8b_datetime_modifiers",
    "text_classifier_score",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q4_exists_semijoin",
    "q16_notin_distinct_suppliers",
    "q22_scalar_subquery_anti",
    "q2_min_cost_supplier",
    "pivot_event_types",
    "ev_funnel_conversion",
    "ev_cohort_retention",
    "embed_random_projection",
    "sample_weighted_topk",
    "p4_between",
    "j1_inner_join",
    "j4_nonequi_join",
    "skew_salted_join_agg",
    "a3_group_having",
    "w1_topk_per_group",
    "w2_running_sum",
    "ev_hourly_window",
    "ev_sessionize",
    "asof_join_last_order",
    "ts_interpolate_linear",
    "range_interval_union",
    "dedup_exact_stats",
    "dedup_minhash_pairs",
    "dedup_minhash_incremental",
    "dedup_simhash_fingerprints",
    "multimodal_decode_meta",
    "knn_cosine_top10",
    "knn_lsh_bucket_top10",
    "text_quality",
    "text_lang_id",
    "sample_stratified_hash",
    "corpus_token_budget",
    # round-2 batch: deep TPC-H shapes + graph/batch-ANN/curation ops
    "q7_nation_volume",
    "q17_small_quantity_revenue",
    "dedup_cluster_components",
    "knn_batch_top3",
    "text_pii_redaction",
    "text_repetition_ratio",
    "curation_decontaminate",
    # round-2 batch 3: remaining TPC-H shapes + TF-IDF + k-means step
    "q8_market_share",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    "tfidf_top_terms",
    "kmeans_update_step",
    # round-4 batch: hyperplane LSH (point probe + near-dup), IVF, as-of
    # directions, JPEG/MP3 header decode
    "knn_hyperplane_top10",
    "knn_ivf_top10",
    "knn_recall_at_10",
    "knn_recall_quantized",
    "knn_hard_negatives",
    "embed_dominant_component",
    "embed_remove_top_component",
    "dedup_embedding_lsh_top10",
    "dedup_embedding_lsh_collapsed",
    "asof_join_nearest_order",
    "multimodal_decode_jpeg_mp3",
    "multimodal_resize_png",
    "text_bigram_lift",
    "pipeline_curate_sample",
    "w5_range_interval_sum",
    "sample_group_reservoir",
    "sketch_kmv_distinct",
    "sketch_countmin_counts",
    "agg_filtered_conditional",
    "agg_ordered_listagg",
    "multimodal_decode_mp4_avi",
    # round-4 batch 2: bucketized range joins, gap-fill, heavy hitters,
    # int8-quantized ANN
    "range_events_in_windows",
    "range_window_overlap_pairs",
    "ts_gapfill_hourly_ffill",
    "heavy_hitters_tokens",
    "knn_quantized_top10",
    "graph_triangle_count",
    "scd2_event_type_intervals",
    "ts_ewma_user_value",
    "quantile_histogram_price",
    "layout_zorder_key_top20",
    "pipeline_semdedup_cells",
    "sketch_kmv_by_group",
    "multimodal_frame_sample",
    "dedup_jaccard_ssjoin",
    "ev_value_outliers",
    "agg_corr_exact_moments",
    # round-4 batch 3: corpus-rewrite, tokenizer train/apply, target mixing
    "dedup_span_c4_stats",
    "text_bpe_top_merges",
    "text_bm25_topk",
    "text_bpe_apply_counts",
    "sample_match_target_mix",
    "ev_type_drift_kl",
    "ev_value_drift_ks",
    "dedup_containment_ssjoin",
    "sample_leakage_safe_split",
    "sample_temperature_mix",
    "sample_balanced_shards",
    # round-7 batch: conditional-LM scoring, greedy packing, cluster balance
    "text_bigram_lm_logprob",
    "pack_nextfit_decreasing",
    "pipeline_cluster_balance",
    "text_logreg_train_weights",
    "dedup_cdc_chunk_stats",
    "text_char_entropy",
    "pipeline_video_frame_dedup",
    "graph_pagerank_top20",
    "dedup_cdc_rewrite",
    "curation_corpus_diff",
    "sample_waterfill_budget",
    # round-8 batch: OHLC rollup, path mining, Gopher gate, k-center
    # diversity, inter-arrival quantiles, exact-substring dedup
    "ts_resample_ohlc",
    "ev_path_trigrams",
    "text_gopher_filter",
    "sample_kcenter_diversity",
    "ev_interarrival_quantiles",
    "dedup_substring_stats",
    "dedup_substring_rewrite",
    "knn_mmr_diverse_top5",
    "ts_rolling_zscore",
    "graph_label_propagation",
    "graph_jaccard_similar_pairs",
    "ev_markov_transitions",
    "pipeline_gopher_dedup_summary",
    "text_zipf_slope",
    "curation_dataset_card",
    "ev_anomaly_mad",
    "pipeline_markov_eval",
    "multimodal_audio_rms",
    "ts_autocorrelation",
    "text_rake_keywords",
    "ev_burstiness",
    "ml_quantile_binning",
    "pipeline_entity_resolution",
    "unpivot_lineitem_measures",
    "graph_negative_samples",
    "asof_join_tolerance",
    "ev_peak_concurrency",
    # round-10: rollup routing merge path (partials parquet round trip);
    # the ANN delete lifecycle row stays gate-only like the append one
    "rollup_route_events_agg",
    "dedup_url_canonical_stats",
    "sample_doremi_reweight",
    "rollup_route_avg_derived_where",
    # round-12: variance family served from (count, sum, sumsq) partials
    "rollup_route_stddev_var",
    "rollup_route_hist_percentile",
    "pipeline_semdedup_autok",
    "p8c_dynamic_modifiers",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    from betfair_database_spark.session import get_spark
    from betfair_database_spark.suite import SUITE

    # Host load at start/end (round 10): a loaded box inflates wall times
    # ~uniformly; recording it makes a "regression" adjudicable from the
    # artifact alone (the round-9 driver headline ran at load 5-7 and
    # read +8% against the committed clean run). Quiet-window guidance:
    # compare rounds only when load_1m is < ~1.5 on this 32-core box.
    def _load() -> dict:
        try:
            l1, l5, l15 = os.getloadavg()
        except OSError:
            return {}
        return {"load_1m": round(l1, 2), "load_15m": round(l15, 2)}

    def _cpu_stat() -> "tuple[int, int] | None":
        # (steal_ticks, total_ticks) from /proc/stat — loadavg cannot
        # distinguish this VM's own 32 busy threads from HOST contention,
        # but steal% can: it counts ticks the hypervisor withheld.
        try:
            vals = [int(v) for v in open("/proc/stat").readline().split()[1:]]
            return vals[7], sum(vals)
        except (OSError, ValueError, IndexError):
            return None

    load_start = _load()

    # Steal pre-flight gate (round 14, verdict #7): round 13's two
    # "regressed" flags and the inverted 8-vs-32-core scaling ratios all
    # traced to a main pass that ran under 4.73% hypervisor steal. External
    # load on this box arrives in waves (observed load_1m 0.1 -> 19 within
    # minutes), so a short bounded wait for a quiet window buys comparable
    # numbers far more often than it costs budget. The gate runs BEFORE the
    # timed region and before session startup, never inside it; methodology
    # of the timed queries is unchanged. Bounded: default 45 s max (the
    # driver's hard timeout is 590 s; a full first pass needs ~200 s).
    def _steal_sample(window: float = 1.5) -> "float | None":
        s0 = _cpu_stat()
        time.sleep(window)
        s1 = _cpu_stat()
        if not (s0 and s1 and s1[1] > s0[1]):
            return None
        return 100.0 * (s1[0] - s0[0]) / (s1[1] - s0[1])

    gate_budget = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_WAIT", "45"))
    gate_thresh = float(
        os.environ.get("SPARK_GRAFT_BENCH_STEAL_THRESH", "1.5")
    )
    gate_wait = 0.0
    if gate_budget > 0:
        g0 = time.perf_counter()
        while True:
            s = _steal_sample()
            if s is None or s <= gate_thresh:
                break
            if time.perf_counter() - g0 + 5.0 > gate_budget:
                break
            time.sleep(3.5)
        gate_wait = round(time.perf_counter() - g0, 1)

    cpu_start = _cpu_stat()

    spark = get_spark("bench")
    # warm the session (JVM + codegen paths) outside the timed region
    spark.range(1000).selectExpr("sum(id)").collect()
    # spawn the Python/Arrow worker pool too: mapInPandas queries should
    # measure steady-state throughput, not one-time interpreter startup
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    wall0 = time.perf_counter()
    # the driver invokes bench under `timeout 590`; once the wall budget is
    # tight, stop repeating and take first-run numbers for the remainder —
    # a slightly noisy tail beats a killed process with NO output
    wall_budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "460"))

    steals_by: dict[str, list] = {}

    def timed(name: str) -> float:
        s0 = _cpu_stat()
        t0 = time.perf_counter()
        SUITE[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        s1 = _cpu_stat()
        # per-RUN steal (round 12, verdict #7): row-level confidence —
        # a regression call on a row whose runs saw hypervisor steal is
        # adjudicated against that, not just the whole-bench average
        if s0 and s1 and s1[1] > s0[1]:
            steals_by.setdefault(name, []).append(
                round(100.0 * (s1[0] - s0[0]) / (s1[1] - s0[1]), 2)
            )
        return dt

    # Pass-based scheduling (round 9). Round 8's per-query repeat loop
    # had a structural tail bias: once the wall budget ran out, every
    # REMAINING query kept its first-run number (one-time Janino codegen
    # included) — a loaded box inflated the tail by several seconds
    # each. Now pass 1 gives every query its codegen-paying first run;
    # refresh passes then re-run queries in DESCENDING first-run order
    # (heaviest first — where absolute variance lives), so budget
    # exhaustion costs sub-second steady-state refreshes (~0.1-0.3 s
    # bias each), never multi-second cold numbers. Third runs only for
    # >=1 s queries (measured: dedup queries swing seconds back-to-back,
    # sub-second queries are noise on the sum).
    runs_by: dict[str, list[float]] = {}
    for name in HEADLINE:
        runs_by[name] = [timed(name)]
    refresh = sorted(HEADLINE, key=lambda n: -runs_by[n][0])
    for name in refresh:
        if time.perf_counter() - wall0 > wall_budget:
            break
        runs_by[name].append(timed(name))

    def _median(runs: list[float]) -> float:
        runs = sorted(runs)
        mid = len(runs) // 2
        return (
            runs[mid]
            if len(runs) % 2
            else (runs[mid - 1] + runs[mid]) / 2.0
        )

    # Dispersion hygiene (round 12, verdict #7): round-over-round
    # per-query comparison is noise-limited exactly on the rows whose
    # spread rivals their median (round-11 artifact had n=2 rows with
    # spread > median) — any such row is re-run until n >= 3 so the next
    # verdict can cite a median, not a coin flip. This pass runs BEFORE
    # the steady-state third pass (an n>=3 median on an unstable row is
    # worth more than a third run of a stable one — the first cut ran it
    # last and the budget starved it); unstable rows heaviest-first,
    # budget-guarded like the refresh passes.
    flagged = [
        n
        for n in HEADLINE
        if len(runs_by[n]) == 2
        and max(runs_by[n]) - min(runs_by[n])
        > 0.5 * max(_median(runs_by[n]), 0.05)
    ]
    for name in sorted(flagged, key=lambda n: -max(runs_by[n])):
        if time.perf_counter() - wall0 > wall_budget:
            break
        runs_by[name].append(timed(name))
    # steady-state third runs for >= 1 s rows (measured: dedup queries
    # swing seconds back-to-back, sub-second queries are noise on the sum)
    for name in refresh:
        if time.perf_counter() - wall0 > wall_budget:
            break
        if len(runs_by[name]) >= 3 or min(runs_by[name]) < 1.0:
            continue
        runs_by[name].append(timed(name))

    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    for name in HEADLINE:
        runs = sorted(runs_by[name])
        timings[name] = round(runs[0], 3)
        # Per-query dispersion (round 9): median/spread/n make a
        # sub-second "regression" falsifiable from the artifact alone —
        # a real plan change moves the MEDIAN beyond the recorded SPREAD;
        # box noise does not. `queries` keeps best-of semantics so
        # cross-round comparisons stay apples-to-apples.
        median = _median(runs)
        spread = runs[-1] - runs[0]
        row_steals = [s for s in steals_by.get(name, []) if s is not None]
        # Row confidence (round 12, verdict #7): "low" when the row's
        # own runs saw hypervisor steal (>1.5% — the measured +11%
        # inflation point from round 10's calibration) or its spread
        # still rivals the median after the dispersion re-runs. The
        # next verdict trusts "ok" medians and discounts "low" ones.
        steal_max = max(row_steals) if row_steals else None
        confidence = (
            "low"
            if (steal_max is not None and steal_max > 1.5)
            or spread > max(median, 0.05)
            else "ok"
        )
        stats[name] = {
            "median": round(median, 3),
            "spread": round(spread, 3),
            "n": len(runs),
            "runs": [round(r, 3) for r in runs],
            "confidence": confidence,
            **(
                {"steal_pct_max": steal_max}
                if steal_max is not None
                else {}
            ),
        }

    total = round(sum(timings.values()), 3)
    # The driver's stdout capture keeps only the LAST 2000 chars (every
    # BENCH_r*.json "tail" is exactly 2000 chars; rounds 4-5 printed the
    # full ~93-query line and got "parsed": null because the line's FRONT
    # fell outside that window). Round 13's PERF comparison collapsed to
    # n_common=2 because only the 5 slowest queries were printed, so
    # (round 14, verdict #2, additions-only): pack as MANY of the slowest
    # queries as fit while keeping the whole line safely inside the
    # window; the full 147-row map still goes to BENCH_DETAIL.json.
    load_end = _load()
    cpu_end = _cpu_stat()
    load_fields = {
        "load_start": load_start,
        "load_end": load_end,
    }
    if cpu_start and cpu_end and cpu_end[1] > cpu_start[1]:
        load_fields["steal_pct"] = round(
            100.0
            * (cpu_end[0] - cpu_start[0])
            / (cpu_end[1] - cpu_start[1]),
            2,
        )
    detail = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "stats": stats,
        "sf": sf,
        "n_queries": len(timings),
        **load_fields,
    }
    Path(__file__).resolve().parent.joinpath("BENCH_DETAIL.json").write_text(
        json.dumps(detail, indent=1) + "\n"
    )
    if gate_wait:
        load_fields["steal_gate_wait_sec"] = gate_wait
    ranked_q = sorted(timings.items(), key=lambda kv: -kv[1])

    def _line(n: int) -> str:
        return json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": dict(ranked_q[:n]),
                "sf": sf,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
                **load_fields,
            },
            separators=(",", ":"),
        )

    # never fewer than the historical top-5; then grow while the line
    # stays under 1850 chars (150-char margin inside the 2000-char tail)
    n_fit = 5
    while n_fit < len(ranked_q) and len(_line(n_fit + 1)) <= 1850:
        n_fit += 1
    print(_line(n_fit))


if __name__ == "__main__":
    main()
