"""Suite extension 13 (round 12): the variance family served from
(count, sum, sumsq) rollup partials, under DuckDB hash scrutiny.

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py`` (aliases identical on both
sides, doubles rounded before compare, deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betfair_database_spark.suite import _q, _t

# =========================================================================
# rollup_route_stddev_var — round-12 verdict #4
# =========================================================================
#
# stddev/var(col) select() queries route to a spec rollup that stores the
# sumsq(col) partial next to sum/count; the routed merge and the scan twin
# both compute ONE moment formula (rollup.moment_sql):
#
#     var = greatest(0, sumsq - sum^2/n) / (n - 1 | n)
#
# from EXACT integer partials (millis as BIGINT — the recorded
# cross-engine fixed-point rule; value <= 491 so sum(v*v) stays far from
# BIGINT overflow even at sf100), so routed == scan == this oracle
# bit-for-bit before the final rounding. Spark's native stddev/var use a
# streaming (Welford) recurrence and would NOT hash-match — which is
# exactly why the engine's scan twin uses the moment form too.
#
# A lost sumsq partial, a count(*)-instead-of-count(col) denominator, or
# a pop/samp mixup all change the hash.

_STDDEV_ROUTE_ORACLE = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       count(v) AS n_vals,
       round(CASE WHEN count(v) > 1 THEN
           sqrt(greatest(CAST(0 AS DOUBLE),
                CAST(sum(v * v) AS DOUBLE)
                - CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE) / count(v))
             / (count(v) - 1)) END, 4) AS sd_millis,
       round(CASE WHEN count(v) > 0 THEN
           greatest(CAST(0 AS DOUBLE),
                CAST(sum(v * v) AS DOUBLE)
                - CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE) / count(v))
             / count(v) END, 4) AS varp_millis
FROM (
    SELECT ts, CAST(round(value * 1e3) AS BIGINT) AS v FROM events
)
GROUP BY day
"""


@_q("rollup_route_stddev_var", _STDDEV_ROUTE_ORACLE)
def rollup_route_stddev_var(spark, sf):
    """Second moments over materialized partials: one bucketed partial
    pass stores count/sum/sumsq of value_millis per (bucket, day) cell,
    an at-rest parquet round trip, then merge_partials — the routed
    physical plan — serves stddev (sample) and var_pop through
    rollup.moment_sql. The raw events are never re-read after the
    partials land."""
    import shutil
    import tempfile

    from betfair_database_spark.rollup import merge_partials, summarize_spec

    spec = {
        "dims": [{"alias": "day", "expr": "to_date(ts)"}],
        "aggs": [
            {"alias": "n", "op": "count", "col": "value_millis"},
            {"alias": "s", "op": "sum", "col": "value_millis"},
            {"alias": "ss", "op": "sumsq", "col": "value_millis"},
        ],
    }
    ev = _t(spark, sf, "events").select(
        "ts",
        F.round(F.col("value") * 1e3).cast("long").alias("value_millis"),
        (F.col("user_id") % 32).cast("int").alias("bucket"),
    )
    internal = summarize_spec(ev, spec, part_col="bucket")
    path = tempfile.mkdtemp(prefix="bfdb_stddev_route_gate_")
    try:
        internal.write.mode("overwrite").parquet(path)
        merged = merge_partials(
            spark.read.parquet(path),
            spec,
            ["day"],
            [
                ("count", "value_millis", "n_vals"),
                ("stddev", "value_millis", "sd_millis"),
                ("var_pop", "value_millis", "varp_millis"),
            ],
        )
        out = merged.select(
            F.col("day").cast("string").alias("day"),
            "n_vals",
            F.round("sd_millis", 4).alias("sd_millis"),
            F.round("varp_millis", 4).alias("varp_millis"),
        ).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


# =========================================================================
# rollup_route_hist_percentile — round 12 (the aggregate after variance)
# =========================================================================
#
# approx_percentile_hist(col, q) is served from a MERGEABLE fixed-bin
# histogram partial (array<bigint> of per-bin counts — exact longs that
# add across partials and streaming folds). The function is DEFINED as
# histogram interpolation (bin-width approximation of the true order
# statistic), and the routed merge, the scan twin and this oracle all
# compute the identical arithmetic tree (rollup.hist_percentile_from_
# array_sql / hist_bin_sql — ONE text for bin assignment), so the three
# agree bit-for-bit: counts are exact in any summation order and the
# interpolation is a single fixed double expression. A NULL leaking into
# bin 0 (greatest() skips NULLs on both engines — the guard in
# hist_bin_sql), an off-by-one in the cumulative pick, or a reordered
# interpolation all change the hash.


def _hist_pctl_oracle(lo: float, hi: float, nb: int, qs) -> str:
    from betfair_database_spark.rollup import hist_bin_sql

    w = (hi - lo) / nb
    b = hist_bin_sql("value", lo, hi, nb)
    hcols = ",\n         ".join(
        f"sum(CASE WHEN {b} = {i} THEN CAST(1 AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END) AS h{i}"
        for i in range(nb)
    )
    total = "(" + " + ".join(f"h{i}" for i in range(nb)) + ")"
    outs = []
    for name, q in qs:
        r = f"(CAST({q!r} AS DOUBLE) * CAST({total} AS DOUBLE))"
        branches = []
        for i in range(nb):
            cum = "(" + " + ".join(f"h{j}" for j in range(i + 1)) + ")"
            cumb = (
                "CAST(0 AS BIGINT)"
                if i == 0
                else "(" + " + ".join(f"h{j}" for j in range(i)) + ")"
            )
            val = (
                f"(CAST({lo!r} AS DOUBLE) + CAST({w!r} AS DOUBLE) * "
                f"CAST({i} AS DOUBLE) + CAST({w!r} AS DOUBLE) * "
                f"({r} - CAST({cumb} AS DOUBLE)) / CAST(h{i} AS DOUBLE))"
            )
            branches.append(f"WHEN {r} <= CAST({cum} AS DOUBLE) THEN {val}")
        outs.append(
            f"CASE WHEN {total} <= 0 THEN NULL "
            + " ".join(branches)
            + f" END AS {name}"
        )
    sel = ",\n       ".join(outs)
    return f"""
WITH h AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         count(value) AS n_vals,
         {hcols}
  FROM events
  GROUP BY day
)
SELECT day, n_vals,
       {sel}
FROM h
"""


_HIST_ROUTE_ORACLE = _hist_pctl_oracle(
    0.0, 500.0, 20, [("p50", 0.5), ("p90", 0.9)]
)


@_q("rollup_route_hist_percentile", _HIST_ROUTE_ORACLE)
def rollup_route_hist_percentile(spark, sf):
    """Histogram-partial percentile serving: one bucketed partial pass
    stores count + a 20-bin histogram of value per (bucket, day) cell,
    an at-rest parquet round trip, then merge_partials — the routed
    physical plan — folds the bin counts element-wise and interpolates
    p50/p90 through hist_percentile_from_array_sql. The raw events are
    never re-read after the partials land."""
    import shutil
    import tempfile

    from betfair_database_spark.rollup import merge_partials, summarize_spec

    spec = {
        "dims": [{"alias": "day", "expr": "to_date(ts)"}],
        "aggs": [
            {"alias": "n", "op": "count", "col": "value"},
            {
                "alias": "vh", "op": "hist", "col": "value",
                "lo": 0.0, "hi": 500.0, "nbins": 20,
            },
        ],
    }
    ev = _t(spark, sf, "events").select(
        "ts", "value", (F.col("user_id") % 32).cast("int").alias("bucket")
    )
    internal = summarize_spec(ev, spec, part_col="bucket")
    path = tempfile.mkdtemp(prefix="bfdb_hist_route_gate_")
    try:
        internal.write.mode("overwrite").parquet(path)
        merged = merge_partials(
            spark.read.parquet(path),
            spec,
            ["day"],
            [
                ("count", "value", "n_vals"),
                ("approx_percentile_hist", "value", "p50", 0.5),
                ("approx_percentile_hist", "value", "p90", 0.9),
            ],
        )
        out = merged.select(
            F.col("day").cast("string").alias("day"), "n_vals", "p50", "p90"
        ).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


# =========================================================================
# pipeline_semdedup_autok — round 12: the SCALE-SHAPED semdedup gate row
# =========================================================================
#
# pipeline_semdedup_cells pins k=8 FIXED so its oracle is a static CTE —
# the shape whose within-cell pair scan is Σ n_c² ≈ N²/8 (measured 26x
# wall at 10x data; SCALE.md). This row is the k ∝ N twin: k =
# ceil(N / 512) — auto_cell_count's formula, the operator default since
# round 12 — which the ORACLE also computes (a scalar subquery in the
# seed CTE), so the scale-correct configuration is itself hash-checked
# at every SF instead of living only in docs. Within-cell pairs stay
# ≈ N · 512 — linear in N at constant cell size.

_SEMDEDUP_AUTOK_ORACLE = """
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings
  WHERE vec_id BETWEEN 1 AND
        (SELECT CAST(ceil(count(*) / 512.0) AS BIGINT) FROM embeddings)
),
sims AS (
  SELECT e.vec_id, c.cid, e.embedding,
         sum(CAST(e.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE))
           / (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
              * sqrt(sum(CAST(c.ce[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))) AS sim
  FROM embeddings e, cents c, range(1, 65) t(i)
  GROUP BY e.vec_id, c.cid, e.embedding
),
assign AS (
  SELECT vec_id, embedding, cid AS cell FROM (
    SELECT vec_id, cid, embedding,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.cell, a.vec_id AS pa, b.vec_id AS pb,
         round(sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
           / (sqrt(sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))
              * sqrt(sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 4) AS cs
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id,
       range(1, 65) t(i)
  GROUP BY 1, 2, 3
),
dropped AS (SELECT DISTINCT pb FROM pairs WHERE cs >= 0.4)
SELECT assign.cell,
       count(*) AS n_vectors,
       CAST(count(dropped.pb) AS BIGINT) AS n_dropped
FROM assign LEFT JOIN dropped ON assign.vec_id = dropped.pb
GROUP BY 1
"""


@_q("pipeline_semdedup_autok", _SEMDEDUP_AUTOK_ORACLE)
def pipeline_semdedup_autok(spark, sf):
    """The k ∝ N semdedup shape under full oracle scrutiny: seed count
    = auto_cell_count's ceil(N / target_cell_size) (the round-12
    operator default), seeds = the first k vec_ids (deterministic, so
    the oracle can reproduce them with a scalar subquery), then the same
    cell-blocked pair scan as pipeline_semdedup_cells. Within-cell work
    is ≈ N · target_cell_size — the configuration that holds at 100 TB —
    and the hash check proves the auto-k path computes the same
    semantics as the fixed-k fixture, not just faster."""
    from betfair_database_spark.operators import similarity

    emb = _t(spark, sf, "embeddings")
    k = similarity.auto_cell_count(emb.count(), spark=spark)
    cents = [
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in emb.where(F.col("vec_id").between(1, k))
        .select("vec_id", "embedding")
        .collect()
    ]
    assign = similarity.ivf_assign(emb, cents).localCheckpoint()  # lc-ok: gate-row scratch, feeds both pair sides + survivor accounting
    pairs = similarity.embedding_near_dup_pairs(
        assign, threshold=0.4, block_col="cell"
    )
    dropped = pairs.select(F.col("b").alias("vec_id")).distinct()
    flagged = assign.join(
        dropped.withColumn("_drop", F.lit(1)), "vec_id", "left"
    )
    return flagged.groupBy("cell").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.coalesce("_drop", F.lit(0))).alias("n_dropped"),
    )


# =========================================================================
# p8c_dynamic_modifiers — round 12: column-valued modifiers in the gate
# =========================================================================
#
# The dynamic-modifier bridge (sqlite_dyn_*, an Arrow kernel reusing the
# literal constant-fold engine per row) under DuckDB scrutiny: each event
# derives its modifier STRING from its type (a 5-way CASE — constrained
# so the oracle can replicate SQLite's semantics per known value), then
# datetime(ts_text, mod) runs through translate_where's dynamic path.
# The oracle mirrors each modifier with native DuckDB interval/trunc
# arithmetic — agreement proves the kernel applies the right operation
# per ROW, not just per plan. An unrecognized modifier ('oops') must
# yield NULL on both sides.

_DYNMOD_ORACLE = """
WITH src AS (
  SELECT event_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_text,
         CASE event_type
           WHEN 'click' THEN '+1 day'
           WHEN 'view' THEN '-90 minutes'
           WHEN 'purchase' THEN 'start of month'
           WHEN 'signup' THEN '+2.5 hours'
           ELSE 'oops'
         END AS mod,
         ts
  FROM events
)
SELECT event_id,
       CASE mod
         WHEN '+1 day' THEN strftime(ts_sec + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S')
         WHEN '-90 minutes' THEN strftime(ts_sec - INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S')
         WHEN 'start of month' THEN strftime(date_trunc('month', ts_sec), '%Y-%m-%d %H:%M:%S')
         WHEN '+2.5 hours' THEN strftime(ts_sec + INTERVAL 150 MINUTE, '%Y-%m-%d %H:%M:%S')
         ELSE NULL
       END AS shifted
FROM (SELECT event_id, mod, date_trunc('second', ts) AS ts_sec FROM src)
"""


@_q("p8c_dynamic_modifiers", _DYNMOD_ORACLE)
def p8c_dynamic_modifiers(spark, sf):
    """Column-valued datetime modifiers end-to-end: the modifier string
    is DATA (derived per event), so the literal fold/macro chain cannot
    apply — translate_where emits the sqlite_dyn_str Arrow kernel. The
    oracle recomputes each known modifier with DuckDB-native arithmetic;
    the unknown one must NULL (SQLite's unrecognized-modifier rule,
    applied per row)."""
    from betfair_database_spark.plans.dialect import (
        register_sqlite_functions,
        translate_where,
    )

    register_sqlite_functions(spark)
    _t(spark, sf, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_text"),
        F.when(F.col("event_type") == "click", "+1 day")
        .when(F.col("event_type") == "view", "-90 minutes")
        .when(F.col("event_type") == "purchase", "start of month")
        .when(F.col("event_type") == "signup", "+2.5 hours")
        .otherwise("oops")
        .alias("mod"),
    ).createOrReplaceTempView("p8c_src")
    expr = translate_where("datetime(ts_text, mod)", projection=True)
    return spark.sql(
        f"SELECT event_id, ({expr}) AS shifted FROM p8c_src"
    )
