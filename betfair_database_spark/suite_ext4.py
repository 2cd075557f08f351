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
             min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
      FROM events WHERE user_id % 10 = 0
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
    """Point-in-interval range join: per observed (user, day) activity
    window of every 10th user, how many OTHER-user events fall inside it.
    There is deliberately no equi key — the operator bins both sides to
    hour buckets (width == 1h, the right scale for day-bounded windows) so
    the plan is explode + one hash join + refine, never a nested loop.
    One extra shuffle for the final re-aggregation; candidate fanout is
    (events/hour) x (windows alive that hour) per bucket."""
    ev = _t(spark, sf, "events")
    epoch = F.expr(_EPOCH_US.format(c="ts"))
    pts = ev.select(F.col("user_id").alias("p_user"), epoch.alias("p_us"))
    ivs = (
        ev.where(F.col("user_id") % 10 == 0)
        .groupBy(
            F.col("user_id").alias("i_user"),
            F.to_date("ts").alias("_day"),
        )
        .agg(F.min(epoch).alias("s_us"), F.max(epoch).alias("e_us"))
    )
    joined = rangejoin.point_in_interval_join(
        pts,
        ivs,
        point_col="p_us",
        start_col="s_us",
        end_col="e_us",
        width=_HOUR_US,
        extra_cond=F.col("p_user") != F.col("i_user"),
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
             min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(a.d, '%Y-%m-%d') AS day,
           count(*) AS n_pairs,
           round(avg((least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us))
                     / 1000000.0), 1) AS avg_overlap_s
    FROM iv a JOIN iv b
      ON a.s_us <= b.e_us AND b.s_us <= a.e_us AND a.u < b.u
    GROUP BY 1
    """,
)
def range_window_overlap_pairs(spark, sf):
    """Interval-overlap self join over every (user, day) activity window:
    pairs of users whose windows overlap in time, with the mean overlap
    duration, grouped by the left window's day. Bucket width is one DAY —
    intervals are day-bounded, so each replicates to at most 2 buckets and
    a pair is tested in ~1 bucket instead of 24 (hour buckets would re-find
    every dense pair 24x before the canonical-bucket filter drops the
    copies). The day attribution key (a.d) rides along outside the join
    condition; avg overlap is exact integer micros divided once at the end.
    """
    ev = _t(spark, sf, "events")
    epoch = F.expr(_EPOCH_US.format(c="ts"))
    iv = ev.groupBy(
        F.col("user_id").alias("u"), F.to_date("ts").alias("d")
    ).agg(F.min(epoch).alias("s_us"), F.max(epoch).alias("e_us"))
    left = iv.select(
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
        width=_DAY_US,
        extra_cond=F.col("a_u") < F.col("b_u"),
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
