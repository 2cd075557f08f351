"""Suite extension 9: linear interpolation at grid timestamps and
per-user interval union (gaps-and-islands coverage accounting).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py`` (aliases identical on both
sides, doubles rounded before compare, deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betfair_database_spark.operators import rangejoin, timeseries
from betfair_database_spark.suite import _q, _t

# =========================================================================
# ts_interpolate_linear — lerp the value series onto an hourly grid
# =========================================================================

_INTERP_ORACLE = r"""
WITH b AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
  FROM events GROUP BY event_type
),
grid AS (
  SELECT event_type,
         unnest(generate_series(lo + INTERVAL 1 HOUR, hi, INTERVAL 1 HOUR)) AS ts
  FROM b
),
u AS (
  SELECT event_type, ts, 0 AS is_grid, event_id, value FROM events
  UNION ALL
  SELECT event_type, ts, 1 AS is_grid, NULL, NULL FROM grid
),
c AS (
  SELECT event_type, ts, is_grid,
         last_value(value IGNORE NULLS) OVER wf AS pv,
         last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER wf AS pt,
         last_value(value IGNORE NULLS) OVER wb AS nv,
         last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER wb AS nt
  FROM u
  WINDOW
    wf AS (PARTITION BY event_type
           ORDER BY ts, is_grid, coalesce(event_id, 0)
           ROWS UNBOUNDED PRECEDING),
    wb AS (PARTITION BY event_type
           ORDER BY ts DESC, is_grid DESC, coalesce(event_id, 0) DESC
           ROWS UNBOUNDED PRECEDING)
)
SELECT event_type,
       strftime(ts, '%Y-%m-%d %H:%M') AS grid_ts,
       round(CASE WHEN nt = pt THEN pv
                  ELSE pv + (nv - pv) * (date_diff('microsecond', pt, ts)::DOUBLE
                                         / date_diff('microsecond', pt, nt)::DOUBLE)
             END, 4) AS v_interp
FROM c
WHERE is_grid = 1 AND pt IS NOT NULL AND nt IS NOT NULL
"""


@_q("ts_interpolate_linear", _INTERP_ORACLE)
def ts_interpolate_linear(spark, sf):
    """Hourly-grid linear interpolation of the per-type value series —
    the resampling primitive for irregular telemetry. Zero joins: grid
    markers union into the stream, two running ignore-nulls windows
    carry the bracketing observations (see timeseries.interpolate_at for
    the tie-break and exact-hit contract)."""
    ev = _t(spark, sf, "events")
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.max("ts").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.expr("sequence(lo + interval 1 hour, hi, interval 1 hour)")
        ).alias("ts"),
    )
    out = timeseries.interpolate_at(
        ev, grid, key="event_type", ts_col="ts", id_col="event_id", val_col="value"
    )
    return out.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("grid_ts"),
        F.round("v_interp", 4).alias("v_interp"),
    )


# =========================================================================
# range_interval_union — per-user coverage from overlapping intervals
# =========================================================================

_UNION_ORACLE = r"""
WITH iv AS (
  SELECT user_id, event_id, ts AS s,
         ts + (CAST(round(value * 60) AS BIGINT) * INTERVAL 1 SECOND) AS e
  FROM events
),
c AS (
  SELECT user_id, event_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e, event_id
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM c
),
g AS (
  SELECT user_id, island, min(s) AS island_start, max(e) AS island_end,
         count(*) AS n_intervals
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       count(*) AS n_islands,
       CAST(sum(n_intervals) AS BIGINT) AS n_intervals,
       CAST(sum(date_diff('microsecond', island_start, island_end)) AS BIGINT)
         AS covered_us,
       CAST(max(date_diff('microsecond', island_start, island_end)) AS BIGINT)
         AS longest_us
FROM g GROUP BY user_id
"""


@_q("range_interval_union", _UNION_ORACLE)
def range_interval_union(spark, sf):
    """Per-user interval union: each event opens a [ts, ts + value
    minutes] activity interval; overlapping/touching intervals merge
    into islands (rangejoin.merge_intervals — one shuffle on user_id,
    windows + group-by reuse the exchange, no self-join), then per-user
    coverage accounting. Duration arithmetic is integer MICROseconds —
    the storage precision, where Spark's truncating timestampdiff and
    DuckDB's boundary-counting date_diff agree exactly."""
    ev = _t(spark, sf, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        F.expr(
            "timestampadd(SECOND, cast(round(value * 60) as bigint), ts)"
        ).alias("e"),
    )
    islands = rangejoin.merge_intervals(
        iv, key="user_id", start="s", end="e", order_tiebreak="event_id"
    )
    dur = F.expr("timestampdiff(MICROSECOND, island_start, island_end)")
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_intervals").alias("n_intervals"),
        F.sum(dur).alias("covered_us"),
        F.max(dur).alias("longest_us"),
    )


# =========================================================================
# graph_jaccard_similar_pairs — common-neighbor node similarity
# =========================================================================

_JACCARD_ORACLE = """
WITH slots AS (
  SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS slot
  FROM events WHERE user_id < 1000
),
e AS (
  SELECT a.u AS u, b.u AS v
  FROM slots a JOIN slots b ON a.slot = b.slot AND a.u < b.u
  GROUP BY 1, 2 HAVING count(*) >= 8
),
adj AS (SELECT u AS c, v AS s FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT c AS n, count(*) AS d FROM adj GROUP BY c),
wed AS (
  SELECT l.s AS u, r.s AS v, count(*) AS common_neighbors
  FROM adj l JOIN adj r ON l.c = r.c AND l.s < r.s
  GROUP BY 1, 2
)
SELECT w.u, w.v,
       CAST(w.common_neighbors AS BIGINT) AS common_neighbors,
       round(w.common_neighbors::DOUBLE
             / (d1.d + d2.d - w.common_neighbors), 6) AS jaccard
FROM wed w JOIN deg d1 ON d1.n = w.u JOIN deg d2 ON d2.n = w.v
ORDER BY jaccard DESC, u, v LIMIT 20
"""


@_q("graph_jaccard_similar_pairs", _JACCARD_ORACLE)
def graph_jaccard_similar_pairs(spark, sf):
    """Top-20 most-similar user pairs by common-neighbor Jaccard over the
    bounded-cohort co-activity graph (same edge rule as
    graph_triangle_count) — the link-prediction primitive: high-overlap
    NON-edges are the candidate links. Wedge-join form with the degree
    table broadcast (graph.jaccard_similarity); sort key is the ROUNDED
    score on both engines so a rounding collapse at the cut boundary
    cannot reorder them differently."""
    from betfair_database_spark.operators.graph import jaccard_similarity

    ev = _t(spark, sf, "events").where(F.col("user_id") < 1000)
    slots = ev.select(
        F.col("user_id").alias("u"),
        F.date_trunc("hour", F.col("ts")).alias("slot"),
    ).distinct()
    a = slots.select(F.col("u").alias("a"), "slot")
    b = slots.select(F.col("u").alias("b"), "slot")
    edges = (
        a.join(b, "slot")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 8)
        .select("a", "b")
    )
    sim = jaccard_similarity(
        edges, canonical=True, broadcast_degrees=True, broadcast_adjacency=True
    ).withColumn("jaccard", F.round("jaccard", 6))
    return sim.orderBy(
        F.col("jaccard").desc(), F.col("u"), F.col("v")
    ).limit(20)
