"""Suite extension 4: bucketized range joins (point-in-interval and
interval-overlap — via :mod:`betfair_database_spark.operators.rangejoin`,
the binning strategy open-source Catalyst lacks) and an hourly gap-fill /
forward-fill resample (the time-series densification every monitoring and
feature-engineering pipeline needs, built from sequence+explode and an
IGNORE NULLS window — no Python anywhere).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``; same
hash-matching conventions as ``suite.py`` (identical rounding/aliases/casts
both sides; epoch microseconds always derived with timezone-free NTZ
arithmetic so neither engine's session timezone can shift a bucket).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from betfair_database_spark.operators import rangejoin
from betfair_database_spark.suite import _q, _t

# epoch micros from the NTZ ts without an LTZ hop (see w5_range_interval_sum)
_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"

_HOUR_US = 3_600_000_000
_DAY_US = 24 * _HOUR_US


# =========================================================================
# Range join 1: points probing intervals (no equality conjunct anywhere —
# a bare theta join would be a BroadcastNestedLoopJoin; the operator
# synthesizes an hour-bucket equi key instead)
# =========================================================================


@_q(
    "range_events_in_windows",
    """
    WITH iv AS (
      SELECT user_id AS i_user, CAST(ts AS DATE) AS i_day,
             min(epoch_us(ts)) AS s_us,
             min(epoch_us(ts)) + 3600000000 AS e_us
      FROM events WHERE user_id < 150
      GROUP BY 1, 2
    )
    SELECT iv.i_user, strftime(iv.i_day, '%Y-%m-%d') AS i_day,
           count(*) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM iv JOIN events e
      ON epoch_us(e.ts) >= iv.s_us AND epoch_us(e.ts) <= iv.e_us
     AND e.user_id <> iv.i_user
    GROUP BY 1, 2
    """,
)
def range_events_in_windows(spark, sf):
    """Point-in-interval range join: for each WATCHLIST user (a fixed
    ~150-user set, the "monitor these accounts" shape), count other-user
    events inside the first hour of the user's daily activity. There is
    deliberately no equi key — the operator bins both sides to hour buckets
    so the plan is explode + one hash join + refine, never a nested loop.

    Scale sanity (learned the hard way): both the interval COUNT (fixed
    watchlist) and the interval LENGTH (1 h, not the whole day) are bounded,
    so joined rows grow linearly with events — the first cut used all-day
    windows for 10% of users and its output was quadratic in SF (~1.5B rows
    at the 100x point). A time-overlap join's cost IS its selectivity;
    bounded windows are what make it a join, not a cross product."""
    ev = _t(spark, sf, "events")
    epoch = F.expr(_EPOCH_US.format(c="ts"))
    pts = ev.select(F.col("user_id").alias("p_user"), epoch.alias("p_us"))
    ivs = (
        ev.where(F.col("user_id") < 150)
        .groupBy(
            F.col("user_id").alias("i_user"),
            F.to_date("ts").alias("_day"),
        )
        .agg(
            F.min(epoch).alias("s_us"),
            (F.min(epoch) + F.lit(_HOUR_US)).alias("e_us"),
        )
    )
    joined = rangejoin.point_in_interval_join(
        pts,
        ivs,
        point_col="p_us",
        start_col="s_us",
        end_col="e_us",
        width=_HOUR_US,
        extra_cond=F.col("p_user") != F.col("i_user"),
        broadcast_intervals=True,  # watchlist windows: thousands, not millions
    )
    return joined.groupBy(
        "i_user", F.date_format("_day", "yyyy-MM-dd").alias("i_day")
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("p_user").alias("n_users"),
    )


# =========================================================================
# Range join 2: interval-overlap self join (exactly-once pair emission via
# the canonical greatest-start bucket)
# =========================================================================


@_q(
    "range_window_overlap_pairs",
    """
    WITH iv AS (
      SELECT user_id AS u, CAST(ts AS DATE) AS d,
             min(epoch_us(ts)) AS s_us,
             min(epoch_us(ts)) + 3600000000 AS e_us
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(a.d, '%Y-%m-%d') AS day,
           count(*) AS n_pairs,
           round(avg((least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us))
                     / 1000000.0), 1) AS avg_overlap_s
    FROM iv a JOIN iv b
      ON a.s_us <= b.e_us AND b.s_us <= a.e_us AND a.u <> b.u
    WHERE a.u < 150
    GROUP BY 1
    """,
)
def range_window_overlap_pairs(spark, sf):
    """Interval-overlap join: WATCHLIST users' (fixed ~150-user set) daily
    first-hour windows vs EVERY user's daily first-hour window — which
    accounts came online while a monitored account was in its opening hour,
    with the mean overlap duration, grouped by day. Bucket width is one
    HOUR (≈ the interval length, the cost-model sweet spot: ~2 bucket rows
    per interval, pairs re-tested in ~1 bucket). The left side is bounded
    and the windows are 1 h, so pair count grows linearly with users —
    the first cut (all users x all-day windows, both sides) was quadratic
    in SF and unrunnable at the 100x point. avg overlap is exact integer
    micros divided once at the end."""
    ev = _t(spark, sf, "events")
    epoch = F.expr(_EPOCH_US.format(c="ts"))
    iv = ev.groupBy(
        F.col("user_id").alias("u"), F.to_date("ts").alias("d")
    ).agg(
        F.min(epoch).alias("s_us"),
        (F.min(epoch) + F.lit(_HOUR_US)).alias("e_us"),
    )
    left = iv.where(F.col("u") < 150).select(
        F.col("u").alias("a_u"),
        F.col("d").alias("a_d"),
        F.col("s_us").alias("a_s"),
        F.col("e_us").alias("a_e"),
    )
    right = iv.select(
        F.col("u").alias("b_u"),
        F.col("s_us").alias("b_s"),
        F.col("e_us").alias("b_e"),
    )
    pairs = rangejoin.interval_overlap_join(
        left,
        right,
        left_start="a_s",
        left_end="a_e",
        right_start="b_s",
        right_end="b_e",
        width=_HOUR_US,
        extra_cond=F.col("a_u") != F.col("b_u"),
        broadcast_left=True,  # watchlist side is bounded
    )
    overlap_s = (
        F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
    ) / F.lit(1_000_000.0)
    return pairs.groupBy(
        F.date_format("a_d", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg(overlap_s), 1).alias("avg_overlap_s"),
    )


# =========================================================================
# Time-series gap-fill: hourly resample + forward fill
# =========================================================================


@_q(
    "ts_gapfill_hourly_ffill",
    """
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS h, "value",
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id % 50 = 0
    ),
    hourly AS (SELECT user_id, h, "value" AS v FROM obs WHERE rn = 1),
    span AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM span
    ),
    filled AS (
      SELECT g.user_id, g.h,
             hv.v IS NULL AS is_gap,
             last_value(hv.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h) AS fv
      FROM grid g LEFT JOIN hourly hv
        ON g.user_id = hv.user_id AND g.h = hv.h
    )
    SELECT user_id, strftime(CAST(h AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_hours,
           CAST(count(*) FILTER (WHERE is_gap) AS BIGINT) AS n_gap_hours,
           round(CAST(sum(CAST(fv AS DECIMAL(38,6))) AS DOUBLE), 2)
             AS sum_filled
    FROM filled GROUP BY 1, 2
    """,
)
def ts_gapfill_hourly_ffill(spark, sf):
    """Hourly gap-fill + forward-fill resample (per user_id % 50 == 0): the
    observation grid is densified to every hour in the user's span
    (sequence + explode — generated distributed, never on the driver), each
    hour carries the last observed value at-or-before it (last_value IGNORE
    NULLS over one hash partition per user), and the result is summarized
    per (user, day). The per-hour observation is the row_number-latest
    event in that hour on both engines (ts then event_id — fully
    deterministic); daily sums accumulate in DECIMAL so partial-agg order
    cannot flip the rounded cent. The grid's first hour always holds an
    observation (the span starts at an event), so no leading-null edge."""
    ev = _t(spark, sf, "events").where(F.col("user_id") % 50 == 0)
    h = F.date_trunc("hour", F.col("ts"))
    hourly = (
        ev.select(
            "user_id", h.alias("h"), "value",
            F.row_number().over(
                Window.partitionBy("user_id", h).orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "h", F.col("value").alias("v"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    filled = grid.join(hourly, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        F.col("v").isNull().alias("is_gap"),
        F.last("v", ignorenulls=True)
        .over(Window.partitionBy("user_id").orderBy("h"))
        .alias("fv"),
    )
    return filled.groupBy(
        "user_id", F.date_format(F.to_date("h"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_hours"),
        F.sum(F.col("is_gap").cast("long")).alias("n_gap_hours"),
        F.round(
            F.sum(F.col("fv").cast("decimal(38,6)")).cast("double"), 2
        ).alias("sum_filled"),
    )


# =========================================================================
# Heavy hitters: Misra-Gries candidates + exact verification
# =========================================================================


@_q(
    "heavy_hitters_tokens",
    """
    WITH tok AS (
      SELECT t FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
      ) WHERE t <> ''
    ),
    n AS (SELECT count(*) AS n_total FROM tok)
    SELECT t AS token, count(*) AS cnt,
           round(count(*) / any_value(n.n_total), 4) AS share
    FROM tok, n
    GROUP BY t
    HAVING count(*) * 64 > any_value(n.n_total)
    """,
)
def heavy_hitters_tokens(spark, sf):
    """Vocabulary heavy hitters (tokens with frequency > N/64) via
    Misra-Gries: pass 1 builds O(counters) per-partition summaries whose
    union is a GUARANTEED superset of every 1/65-heavy item, pass 2
    exact-counts only that broadcastable candidate set — so the aggregation
    key space is ~256 x partitions rows instead of the full vocabulary (the
    difference between a bounded hash map and an OOM when the domain is
    web-scale URLs/n-grams). Output is exact and partition-independent;
    the oracle is the direct GROUP BY ... HAVING."""
    from betfair_database_spark.operators.sketches import heavy_hitters_exact

    d = _t(spark, sf, "documents")
    tok = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).where(F.col("token") != "")
    return heavy_hitters_exact(tok, "token", phi_denominator=64, counters=256)


# =========================================================================
# Int8-quantized ANN
# =========================================================================

_KNN_Q8_ORACLE = """
WITH m AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
  FROM embeddings
),
qv AS (
  SELECT e.vec_id,
         CASE WHEN m.ma = 0 THEN list_transform(e.embedding, x -> CAST(0 AS BIGINT))
              ELSE list_transform(e.embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / m.ma) AS BIGINT))
         END AS q
  FROM embeddings e JOIN m USING (vec_id)
),
q0 AS (SELECT q AS qq FROM qv WHERE vec_id = 0),
scored AS (
  SELECT qv.vec_id,
         sum(qv.q[i] * q0.qq[i]) AS dot,
         sum(qv.q[i] * qv.q[i]) AS na,
         sum(q0.qq[i] * q0.qq[i]) AS nq
  FROM qv, q0, range(1, 65) t(i)
  GROUP BY qv.vec_id
)
SELECT vec_id,
       round(CASE WHEN na = 0 OR nq = 0 THEN -1.0
             ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE)))
             END, 4) AS cos_sim_q
FROM scored ORDER BY cos_sim_q DESC, vec_id LIMIT 10
"""


def _recall_q8_oracle() -> str:
    from betfair_database_spark.suite import _KNN_ORACLE

    return f"""
WITH exact AS (SELECT * FROM ({_KNN_ORACLE})),
     quant AS (SELECT * FROM ({_KNN_Q8_ORACLE}))
SELECT 'quantized_int8' AS method, (SELECT count(*) FROM exact) AS k,
       count(*) AS hits,
       round(count(*) * 1.0 / (SELECT count(*) FROM exact), 4) AS recall
FROM quant q WHERE q.vec_id IN (SELECT vec_id FROM exact)
"""


@_q("knn_recall_quantized", _recall_q8_oracle())
def knn_recall_quantized(spark, sf):
    """Recall@10 of the int8-quantized scoring path against the exact
    float cosine top-10 — the accuracy cost of the 4x bandwidth cut,
    measured as a result frame (companion to knn_recall_at_10).

    Both sub-builds fetch the query vector with a driver `.first()`; the
    two jobs are independent, so they run on a 2-thread pool (guide §2.6,
    same shape as knn_recall_at_10's overlap). Results are identical —
    only build-time latency overlaps."""
    import os as _os

    from betfair_database_spark.operators.similarity import recall_at_k
    from betfair_database_spark.suite import knn_cosine_top10

    if _os.environ.get("SPARK_GRAFT_NO_THREAD_BUILD"):
        return recall_at_k(
            knn_quantized_top10(spark, sf),
            knn_cosine_top10(spark, sf),
            label="quantized_int8",
        )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_q = pool.submit(knn_quantized_top10, spark, sf)
        f_e = pool.submit(knn_cosine_top10, spark, sf)
        return recall_at_k(f_q.result(), f_e.result(), label="quantized_int8")


@_q("knn_quantized_top10", _KNN_Q8_ORACLE)
def knn_quantized_top10(spark, sf):
    """Top-10 by cosine over INT8-QUANTIZED embeddings (symmetric per-vector
    max-abs scaling): the scan reads 1/4 the bytes of the float path and the
    scoring loop is an integer multiply-accumulate — the standard bandwidth
    lever for billion-vector retrieval. Per-vector scales cancel in cosine,
    so only the int8 arrays are touched. Still one shuffle-free
    TakeOrderedAndProject; exactly reproducible cross-engine because the
    only float steps are the quantization round and two final sqrts."""
    from betfair_database_spark.operators import quantize

    e = _t(spark, sf, "embeddings")
    row = e.where(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(v) for v in row[0]]
    return quantize.quantized_topk(e, qvec, k=10)


# =========================================================================
# Graph analytics: triangle count over a co-activity graph
# =========================================================================


@_q(
    "graph_triangle_count",
    """
    WITH slots AS (
      SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS slot
      FROM events WHERE user_id < 1000
    ),
    e AS (
      SELECT a.u AS u, b.u AS v
      FROM slots a JOIN slots b ON a.slot = b.slot AND a.u < b.u
      GROUP BY 1, 2 HAVING count(*) >= 8
    )
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*)
                 FROM e e1 JOIN e e2 ON e2.u = e1.v
                           JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
                AS BIGINT) AS n_triangles
    """,
)
def graph_triangle_count(spark, sf):
    """Triangle count over the co-activity graph of a BOUNDED cohort
    (users < 1000; edge = two cohort users sharing >= 8 active hours). The
    oracle is the textbook 3-way self-join on canonical u<v edges; the
    Spark operator is the degree-ordered compact-forward form whose wedge
    fanout is bounded by O(sqrt(m)) per node — the difference between a
    celebrity node costing deg^2 wedge rows and costing ~m. Edge
    construction is slot-blocked (self-join on the hour slot), never
    all-pairs over users.

    The cohort bound is a scale lesson, not a convenience: with a FIXED
    time span and a GROWING population, any co-occurrence graph densifies
    (expected shared hours per pair grows with SF) until an absolute edge
    threshold admits O(users^2) edges — the unbounded first cut OOMed the
    100x run. Either the threshold must scale with density or the node set
    must be bounded; a fixed analysis cohort is the honest framing here."""
    from betfair_database_spark.operators.graph import triangle_count

    ev = _t(spark, sf, "events").where(F.col("user_id") < 1000)
    slots = ev.select(
        F.col("user_id").alias("u"), F.date_trunc("hour", F.col("ts")).alias("slot")
    ).distinct()
    a = slots.select(F.col("u").alias("a"), "slot")
    b = slots.select(F.col("u").alias("b"), "slot")
    # broadcast the b-side slots frame (cohort-bounded) — BHJ on slot
    edges = (
        a.join(F.broadcast(b), "slot")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= 8)
    )
    # the cohort bound caps edges at ~C(1000,2): always broadcastable,
    # and it removes the only large exchange (the wedge-set shuffle).
    # Round-7 audit: the degree table (one row per cohort user) is
    # broadcast to both orientation joins — no edge-set shuffle for
    # ranking — and the groupBy(a, b) output is already canonical, so
    # the canonicalize-distinct shuffle is skipped too.
    return triangle_count(
        edges,
        broadcast_closure=True,
        broadcast_degrees=True,
        canonical=True,
    )


# =========================================================================
# SCD2 / gaps-and-islands: collapse consecutive equal values into validity
# intervals
# =========================================================================


@_q(
    "scd2_event_type_intervals",
    """
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_id
      FROM flagged
    ),
    intervals AS (
      SELECT user_id, event_type, run_id,
             min(ts) AS valid_from, max(ts) AS valid_to, count(*) AS n_rows
      FROM runs GROUP BY 1, 2, 3
    )
    SELECT event_type,
           count(*) AS n_intervals,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           round(avg(epoch_us(valid_to) - epoch_us(valid_from)) / 1000000.0, 1)
             AS avg_run_s
    FROM intervals GROUP BY 1
    """,
)
def scd2_event_type_intervals(spark, sf):
    """Gaps-and-islands — the SCD2 dimension-build core: collapse each
    user's CONSECUTIVE runs of the same event_type into validity intervals
    (change flag via lag, run id via running sum of flags, one group per
    run), then summarize per type. Two window passes + one aggregate over a
    single hash partitioning on user_id — the exact shape that builds
    slowly-changing dimensions from a 100 TB change log without any
    self-join. Ordering ties broken by event_id on both engines."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
    ).otherwise(0)
    runs = ev.select(
        "user_id", "event_type", "ts", F.sum(chg).over(w).alias("run_id")
    )
    iv = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("valid_to"),
        F.count("*").alias("n_rows"),
    )
    dur_s = (
        F.expr(_EPOCH_US.format(c="valid_to"))
        - F.expr(_EPOCH_US.format(c="valid_from"))
    ) / F.lit(1_000_000.0)
    return iv.groupBy("event_type").agg(
        F.count("*").alias("n_intervals"),
        F.sum("n_rows").alias("n_rows"),
        F.round(F.avg(dur_s), 1).alias("avg_run_s"),
    )


# =========================================================================
# EWMA: per-key sequential fold (applyInPandas — not window-expressible)
# =========================================================================


@_q(
    "ts_ewma_user_value",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(list_reduce(list("value" ORDER BY ts, event_id),
                             (acc, x) -> 0.25*x + 0.75*acc), 6) AS ewma
    FROM events GROUP BY user_id
    """,
)
def ts_ewma_user_value(spark, sf):
    """Exponentially weighted moving average per user (alpha=0.25, seeded
    with the first observation — pandas ewm(adjust=False) semantics). The
    recurrence s_i = a*x_i + (1-a)*s_{i-1} is a SEQUENTIAL left fold no SQL
    window frame expresses, so this is the repo's canonical
    applyInPandas custom aggregate: one hash shuffle on user_id, each
    key's history folded in (ts, event_id) order inside the Arrow batch.
    Bit-reproducible cross-engine because a pinned-order IEEE double fold
    is deterministic (the oracle's ordered list_reduce runs the identical
    expression)."""
    from betfair_database_spark.operators.timeseries import ewma_last_per_key

    ev = _t(spark, sf, "events")
    out = ewma_last_per_key(
        ev, "user_id", "ts", "value", alpha=0.25, tiebreak_col="event_id"
    )
    return out.select("user_id", "n", F.round("ewma", 6).alias("ewma"))


# =========================================================================
# Histogram-based approximate quantiles: 2 scans + O(bins) memory, no sort
# =========================================================================


@_q(
    "quantile_histogram_price",
    """
    WITH ext AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
             count(*) AS n
      FROM lineitem
    ),
    bins AS (
      SELECT CAST(least(99, floor((l_extendedprice - ext.lo)
                                  / (ext.hi - ext.lo) * 100)) AS BIGINT) AS b,
             count(*) AS cnt
      FROM lineitem, ext GROUP BY 1
    ),
    cum AS (
      SELECT b, cnt, sum(cnt) OVER (ORDER BY b) AS cum,
             sum(cnt) OVER (ORDER BY b) - cnt AS cum_prev
      FROM bins
    ),
    est AS (
      SELECT q.q AS q,
             min_by(ext.lo + (ext.hi - ext.lo) / 100.0
                      * (cum.b + (q.q * ext.n - cum.cum_prev) / cum.cnt),
                    cum.b) AS est
      FROM cum, ext, (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS q) q
      WHERE cum.cum >= q.q * ext.n
      GROUP BY q.q
    )
    SELECT q, round(est, 2) AS est_price FROM est
    """,
)
def quantile_histogram_price(spark, sf):
    """Approximate quantiles via a fixed-width histogram: pass 1 takes
    (min, max, n), pass 2 one 100-bin grouped count, then the quantile is
    linear interpolation inside the first bin whose running count crosses
    q*n. Two scans + O(bins) state — the quantile shape that works at
    100 TB where a true percentile would global-sort; error is bounded by
    one bin width. Identical arithmetic both engines (min_by picks the
    crossing bin), so the estimates hash-match exactly."""
    li = _t(spark, sf, "lineitem")
    ext = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count("*").alias("n"),
    )
    bins = (
        li.join(F.broadcast(ext))
        .select(
            F.least(
                F.lit(99),
                F.floor(
                    (F.col("l_extendedprice") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 100
                ),
            ).cast("long").alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
    )
    # bounded-frame global window: input is the aggregated histogram bins
    # (<= 101 rows by construction), never a corpus-sized frame — the
    # guard walks the analyzed plan and raises on a corpus-shaped input
    from betfair_database_spark.plans.guards import assert_bounded_frame

    bins = assert_bounded_frame(bins, "histogram bins")
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "b",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
    )
    qs = F.explode(F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))).alias("q")
    est = (
        cum.join(F.broadcast(ext))
        .join(F.broadcast(ext.sparkSession.range(1).select(qs)))
        .where(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(
            F.min_by(
                F.col("lo")
                + (F.col("hi") - F.col("lo"))
                / F.lit(100.0)
                * (
                    F.col("b")
                    + (F.col("q") * F.col("n") - F.col("cum_prev")) / F.col("cnt")
                ),
                F.col("b"),
            ).alias("est")
        )
    )
    return est.select("q", F.round("est", 2).alias("est_price"))


# =========================================================================
# Z-order (Morton) clustering key — the data-layout operator, oracle-checked
# =========================================================================


def _z_oracle(bits: int = 10) -> str:
    """DuckDB twin of layout.zorder_key for dims [(user_id, 0, 2048),
    (value, 0, 100)] — the same unrolled shift/or interleave, generated
    from one loop so the two engines cannot drift."""
    def cell(expr, lo, hi):
        cells = 1 << bits
        return (
            f"coalesce(greatest(0, least({cells - 1}, "
            f"CAST(floor((CAST({expr} AS DOUBLE) - {float(lo)}) / {float(hi - lo)} * {cells}) AS BIGINT))), 0)"
        )

    cx = cell("user_id", 0, 2048)
    cy = cell('"value"', 0, 100)
    terms = []
    for j in range(bits):
        terms.append(f"((({cx} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({cy} >> {j}) & 1) << {2 * j + 1})")
    z = " | ".join(terms)
    return f"""
    SELECT event_id, ({z}) AS z
    FROM events ORDER BY z DESC, event_id LIMIT 20
    """


@_q("layout_zorder_key_top20", _z_oracle())
def layout_zorder_key_top20(spark, sf):
    """Morton (z-order) clustering key over (user_id, value) — the key
    :func:`operators.layout.write_zordered` range-partitions and sorts by
    so every parquet row group gets tight min/max stats on BOTH dims (the
    write-side pruning lever; measured in tests/test_layout.py). Bounds are
    fixed domain constants, the at-scale practice (a recluster must not
    depend on a min/max pass); out-of-range values clamp to edge cells
    identically on both engines. Top-20 by key is just a deterministic
    window into the interleave for the hash gate."""
    from betfair_database_spark.operators.layout import zorder_key

    ev = _t(spark, sf, "events")
    return (
        ev.select(
            "event_id",
            zorder_key([("user_id", 0, 2048), ("value", 0, 100)], bits=10).alias("z"),
        )
        .orderBy(F.desc("z"), F.asc("event_id"))
        .limit(20)
    )


# =========================================================================
# SemDeDup-style semantic dedup: cluster-scoped cosine pruning
# =========================================================================

_SEMDEDUP_ORACLE = """
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id BETWEEN 1 AND 8
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


@_q("pipeline_semdedup_cells", _SEMDEDUP_ORACLE)
def pipeline_semdedup_cells(spark, sf):
    """SemDeDup-shaped semantic dedup: assign every embedding to its
    nearest seed centroid (the IVF assignment operator — broadcast argmax,
    no shuffle), find within-CELL cosine pairs >= tau, and drop the
    higher-id member of each pair. Clustering first is what makes semantic
    dedup tractable at corpus scale: the pair join is cell-blocked
    (sum over cells of n_c^2, not N^2), and cells are the partition key so
    each task prunes one cell. This row pins a FIXED k=8 seed set so the
    DuckDB oracle stays tractable; the production surface is
    ``similarity.semdedup``, whose k DEFAULTS to ``auto_cell_count``
    (k ∝ N, constant expected cell size — round 12, clearing the measured
    N²/k blowup of a fixed k at 10x data, SCALE.md). tau = 0.4 fits this
    synthetic corpus (random
    embeddings; max observed cos ~0.51) — real corpora use ~0.95+. On a
    replica-heavy corpus, compose with collapse_exact_vectors FIRST (the
    dedup_embedding_lsh_collapsed ordering) — identical vectors share a
    cell and pair quadratically, the same failure every near-dup stage in
    this repo collapses away; kept uncollapsed here so the oracle counts
    the full corpus. Output: per cell, vectors seen and vectors a curator
    would drop."""
    from betfair_database_spark.operators import similarity

    emb = _t(spark, sf, "embeddings")
    cents = [
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in emb.where(F.col("vec_id").between(1, 8))
        .select("vec_id", "embedding")
        .collect()
    ]
    # assign feeds three DAG branches (both pair sides + the survivor
    # accounting); checkpoint the 1-pass assignment so it runs once
    assign = similarity.ivf_assign(emb, cents).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
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
# Per-group KMV distinct sketch
# =========================================================================


@_q(
    "sketch_kmv_by_group",
    """
    WITH hashed AS (
      SELECT DISTINCT o_orderpriority AS grp,
        CAST(CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
             AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM orders
    ),
    mins AS (
      SELECT grp, u,
             row_number() OVER (PARTITION BY grp ORDER BY u) AS rn
      FROM hashed
    ),
    agg AS (
      SELECT grp, max(u) AS kth, count(*) AS n_kept
      FROM mins WHERE rn <= 128 GROUP BY grp
    ),
    ex AS (
      SELECT o_orderpriority AS grp,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      FROM orders GROUP BY 1
    )
    SELECT agg.grp,
           CAST(CASE WHEN agg.n_kept < 128 THEN agg.n_kept
                ELSE round(127.0 / agg.kth) END AS BIGINT) AS kmv_estimate,
           CAST(agg.n_kept AS BIGINT) AS n_kept,
           ex.exact_distinct
    FROM agg JOIN ex ON agg.grp = ex.grp
    """,
)
def sketch_kmv_by_group(spark, sf):
    """KMV distinct-count sketch AS A GROUPED AGGREGATE (customers per
    order priority, k=128, next to the exact answer): the per-group top-k
    window gets Spark's rank-pushdown group-limit, so each partition ships
    at most k hashes per group — the sketch stays O(groups x k) end to end
    no matter how many distinct keys exist. md5-hash path pinned so the
    oracle reproduces every estimate bit-for-bit (xxhash64 is the
    production default)."""
    from betfair_database_spark.operators.sketches import kmv_distinct_by_group

    o = _t(spark, sf, "orders")
    sk = kmv_distinct_by_group(
        o.select(F.col("o_orderpriority").alias("grp"), "o_custkey"),
        "grp",
        "o_custkey",
        k=128,
        hasher="md5",
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return sk.join(exact, "grp")


# =========================================================================
# Video frame sampling: container walk -> JVM-side byte extraction
# =========================================================================


@_q(
    "multimodal_frame_sample",
    """
    WITH base AS (
      SELECT doc_id, n_chars % 50 + 1 AS n,
             CAST(ceil((n_chars % 50 + 1) / 4.0) AS BIGINT) AS m
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_frames,
           m AS n_sampled,
           m * 32 AS bytes_sampled,
           2 * m * (m - 1) AS sum_first_bytes
    FROM base
    """,
)
def multimodal_frame_sample(spark, sf):
    """Video frame sampling, the container-level kind a training pipeline
    runs before any codec: synthesize AVIs with real movi frame chunks
    (frame idx byte-stamped into its data), walk the chunk index in Python
    (bounded, no frame bytes cross the boundary), keep every 4th frame, and
    cut the kept frames JVM-side with substring on the binary column.
    Verified against the closed form: n_frames = n_chars%50+1, sampled =
    ceil(n/4), each frame 32 bytes, first bytes sum to 2m(m-1)."""
    from betfair_database_spark.operators import multimodal

    d = _t(spark, sf, "documents")

    def _make(batches):
        import pandas as pd

        for batch in batches:
            payloads = [
                multimodal.encode_avi_frames(int(s) % 50 + 1, 32)
                for s in batch["n_chars"]
            ]
            yield pd.DataFrame({"doc_id": batch["doc_id"], "payload": payloads})

    media = d.select("doc_id", "n_chars").mapInPandas(
        _make, schema="doc_id long, payload binary"
    ).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds (synthesized once; feeds the index AND the cut)

    totals = (
        multimodal.video_frame_table(media)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_frames"))
    )
    fr = multimodal.sample_frames(media, every_n=4)
    sampled = fr.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.length("frame")).alias("bytes_sampled"),
        F.sum(
            F.conv(F.hex(F.expr("substring(frame, 1, 1)")), 16, 10).cast("long")
        ).alias("sum_first_bytes"),
    )
    return totals.join(sampled, "doc_id")


# =========================================================================
# Exact set-similarity join with prefix filtering (PPJoin family)
# =========================================================================


@_q(
    "dedup_jaccard_ssjoin",
    """
    WITH reps AS (
      -- model the operator's documented collapse_exact=True contract
      -- (round 12): byte-identical texts collapse to their min-doc_id
      -- representative BEFORE pairing — identical-copy pairs are
      -- exact_dedup's job. sf0.01 has no exact dups (oracle unchanged
      -- there); sf0.1 has 8, sf1 replicas make every text 10-way
      -- duplicated, where the un-collapsed oracle both disagrees and
      -- explodes quadratically.
      SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(length(text) - 8, 0) + 1),
                                   i -> substr(lower(text), CAST(i AS INT), 9))) AS w
      FROM reps
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      FROM sh x JOIN sh y ON x.w = y.w AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jac
    FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.6
    """,
)
def dedup_jaccard_ssjoin(spark, sf):
    """EXACT near-dup pairs (shingle Jaccard >= 0.6) via the prefix-filter
    set-similarity join — the deterministic complement to MinHash-LSH: no
    false negatives by the prefix lemma, candidates bounded by rare-token
    fanout instead of all-pairs. The oracle is the brute-force exact join;
    on this corpus both return exactly the planted near-dup pairs
    (threshold sits in the empty 0.4-0.8 similarity gap)."""
    from betfair_database_spark.operators.dedup import jaccard_ssjoin

    d = _t(spark, sf, "documents")
    # 9-gram shingles, not the dedup-default 5: this corpus's ~200-word
    # vocabulary yields only ~2k distinct 5-grams (median one appears in
    # 291 of 5000 docs), which defeats ANY prefix filter — "rare" tokens
    # aren't. 9-grams span ~1.5 words: 27k distinct, median frequency 51,
    # and the similarity gap widens (non-dup pairs fall below 0.15).
    # Shingle width is the first knob to turn when prefix filtering
    # degenerates; the positional/length filters are the second.
    return jaccard_ssjoin(d, threshold=0.6, k=9)


# =========================================================================
# Robust stats: z-score outliers and exact-moment correlation
# =========================================================================


@_q(
    "ev_value_outliers",
    """
    WITH stats AS (
      SELECT event_type,
             avg("value") AS mu,
             stddev_samp("value") AS sigma
      FROM events GROUP BY 1
    )
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_outliers,
           round(min(e."value"), 2) AS min_outlier,
           round(max(e."value"), 2) AS max_outlier
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs(e."value" - s.mu) > 2.5 * s.sigma
    GROUP BY 1
    """,
)
def ev_value_outliers(spark, sf):
    """Z-score outlier detection per event type (|x - mu| > 2.5 sigma):
    one grouped-stats pass broadcast back onto the stream — the standard
    monitoring primitive. mu/sigma are double aggregates, but the
    comparison has ~unit-scale slack, so partial-agg order can't flip a
    row's outlier status on this data; min/max of the flagged values are
    order-independent. Broadcast the 5-row stats side, no second shuffle
    of the events."""
    ev = _t(spark, sf, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    flagged = ev.join(F.broadcast(stats), "event_type").where(
        F.abs(F.col("value") - F.col("mu")) > 2.5 * F.col("sigma")
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n_outliers"),
        F.round(F.min("value"), 2).alias("min_outlier"),
        F.round(F.max("value"), 2).alias("max_outlier"),
    )


@_q(
    "agg_corr_exact_moments",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,6))
                      * CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))
                      * CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,6))
                      * CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS corr_qty_price
    FROM m
    """,
)
def agg_corr_exact_moments(spark, sf):
    """Pearson correlation from EXACT moments: built-in corr() is a
    running double aggregate whose partial-merge order changes the last
    bits run to run (unhashable cross-engine). Accumulating the five
    moments in DECIMAL(38,6) makes the sums exact (addition associative),
    so the final double formula is bit-deterministic on both engines —
    the same decimal trick the suite uses for money sums, extended to
    second moments. One grouped pass, map-side partials intact."""
    li = _t(spark, sf, "lineitem")
    dx = F.col("l_quantity").cast("decimal(38,6)")
    dy = F.col("l_extendedprice").cast("decimal(38,6)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    n = F.col("n")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "l_returnflag", "n", F.round(corr, 6).alias("corr_qty_price")
    )


_POWER_ITER_ORACLE = """
WITH m AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
  FROM embeddings
),
qv AS (
  SELECT e.vec_id,
         CASE WHEN m.ma = 0 THEN list_transform(e.embedding, x -> CAST(0 AS BIGINT))
              ELSE list_transform(e.embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / m.ma) AS BIGINT))
         END AS q
  FROM embeddings e JOIN m USING (vec_id)
),
dot1 AS (SELECT vec_id, sum(CAST(q[i] AS HUGEINT)) AS dot
         FROM qv, range(1, 65) t(i) GROUP BY vec_id),
w1 AS (SELECT i.i AS d, sum(CAST(q.q[i.i] AS HUGEINT) * t.dot) AS v
       FROM qv q JOIN dot1 t USING (vec_id), range(1, 65) i(i) GROUP BY i.i),
dot2 AS (SELECT q.vec_id, sum(CAST(q.q[w.d] AS HUGEINT) * w.v) AS dot
         FROM qv q, w1 w GROUP BY q.vec_id),
w2 AS (SELECT i.i AS d, sum(CAST(q.q[i.i] AS HUGEINT) * t.dot) AS v
       FROM qv q JOIN dot2 t USING (vec_id), range(1, 65) i(i) GROUP BY i.i),
dot3 AS (SELECT q.vec_id, sum(CAST(q.q[w.d] AS HUGEINT) * w.v) AS dot
         FROM qv q, w2 w GROUP BY q.vec_id),
w3 AS (SELECT i.i AS d, sum(CAST(q.q[i.i] AS HUGEINT) * t.dot) AS v
       FROM qv q JOIN dot3 t USING (vec_id), range(1, 65) i(i) GROUP BY i.i),
wn AS (
  SELECT list(CAST(v AS DOUBLE) ORDER BY d) AS arr FROM w3
),
nrm AS (
  SELECT arr,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                       list_transform(arr, x -> x * x)),
                          (a, x) -> a + x)) AS nw
  FROM wn
),
nq AS (SELECT vec_id, sum(CAST(q[i] AS HUGEINT) * q[i]) AS s
       FROM qv, range(1, 65) t(i) GROUP BY vec_id)
SELECT q.vec_id,
       round(CASE WHEN nq.s = 0 OR n.nw = 0 THEN -1.0
             ELSE list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(range(1, 65),
                                   i -> CAST(q.q[i] AS DOUBLE) * n.arr[i])),
                    (a, x) -> a + x)
                  / (sqrt(CAST(nq.s AS DOUBLE)) * n.nw) END, 4) + 0.0 AS proj
FROM qv q JOIN nq USING (vec_id), nrm n
"""


@_q("embed_dominant_component", _POWER_ITER_ORACLE)
def embed_dominant_component(spark, sf):
    """Each vector's cosine with the dominant principal direction of the
    int8-quantized embedding set, found by three UN-normalized power
    iterations in EXACT decimal arithmetic — cross-row float sums are
    order-dependent under parallel aggregation, integer sums are not, so
    the iterate is bit-identical on any engine/partitioning (the oracle
    re-derives it in hugeint). The 'all-but-the-top' embedding diagnostic.
    See similarity.dominant_component_projection."""
    from betfair_database_spark.operators import similarity

    return similarity.dominant_component_projection(
        _t(spark, sf, "embeddings"), iters=3
    )


def _abtt_oracle() -> str:
    # reuse the power-iteration CTE chain, then apply the correction per
    # (vec_id, dim): q'_d = q_d - (q . w-hat) * w-hat_d — every operand the
    # same IEEE op chain as the Spark side (w-hat = arr[i]/nw single
    # division, index-order folds).
    base = _POWER_ITER_ORACLE.rsplit("\nSELECT q.vec_id,", 1)[0]
    return (
        base.rstrip().rstrip(",")
        + """,
du AS (
  SELECT q.vec_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, 65),
                          i -> CAST(q.q[i] AS DOUBLE) * (n.arr[i] / n.nw))),
           (a, x) -> a + x) AS dotu
  FROM qv q, nrm n
)
SELECT q.vec_id, CAST(i.i AS INT) AS d,
       round(CAST(q.q[i.i] AS DOUBLE) - u.dotu * (n.arr[i.i] / n.nw), 4)
         + 0.0 AS v
FROM qv q JOIN du u USING (vec_id), nrm n, range(1, 65) i(i)
"""
    )


@_q("embed_remove_top_component", _abtt_oracle())
def embed_remove_top_component(spark, sf):
    """The 'all-but-the-top' CORRECTION itself: each quantized embedding
    minus its projection onto the dominant direction (exact-arithmetic
    power iterate), emitted as (vec_id, d, v) rows. Companion to
    embed_dominant_component; see similarity.remove_dominant_component."""
    from betfair_database_spark.operators import similarity

    return similarity.remove_dominant_component(
        _t(spark, sf, "embeddings"), iters=3
    )
