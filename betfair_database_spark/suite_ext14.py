"""Suite extension 14 (round 13): the log-linear quantile sketch
(``qsketch`` rollup partial / ``approx_percentile`` select aggregate)
under DuckDB hash scrutiny.

The sketch's bin arithmetic is deliberately portable SQL text
(``rollup.qsketch_key_sql`` / ``qsketch_rep_sql`` — exact-IEEE octave +
linear sub-bin, libm-correction by comparison), so the oracle runs the
IDENTICAL key and representative formulas and only re-expresses the
rank-select (DuckDB window cumulative vs Spark's let-bound prefix fold
— same exact longs, same r = q*total rule, same selected key).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betfair_database_spark.rollup import qsketch_key_sql, qsketch_rep_sql
from betfair_database_spark.suite import _q, _t

# =========================================================================
# rollup_route_qsketch_percentile — round-13 verdict #3
# =========================================================================
#
# The drift-proof percentile partial: unlike hist(col, lo, hi, nbins)
# (round 12), qsketch(col) needs NO declared range — a value domain that
# drifts 100x keeps full resolution instead of clipping into edge bins.
# This row drives the full at-rest lifecycle: bucketed two-stage partial
# build (summarize_spec), a parquet round trip, then merge_partials —
# the routed physical plan — folds the sparse maps key-wise and
# rank-selects p50/p90 through qsketch_percentile_from_map_sql. The raw
# events are never re-read after the partials land.

_QK = qsketch_key_sql("value")
_REP50 = qsketch_rep_sql("k50")
_REP90 = qsketch_rep_sql("k90")

_QS_ROUTE_ORACLE = f"""
WITH keyed AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, {_QK} AS k
  FROM events WHERE {_QK} IS NOT NULL
),
counted AS (SELECT day, k, count(*) AS n FROM keyed GROUP BY 1, 2),
ranked AS (
  SELECT day, k, n,
         sum(n) OVER (PARTITION BY day ORDER BY k) AS cum,
         sum(n) OVER (PARTITION BY day) AS total
  FROM counted
),
sel AS (
  SELECT day,
    min(CASE WHEN CAST(cum AS DOUBLE) >= 0.5 * CAST(total AS DOUBLE)
             THEN k END) AS k50,
    min(CASE WHEN CAST(cum AS DOUBLE) >= 0.9 * CAST(total AS DOUBLE)
             THEN k END) AS k90
  FROM ranked GROUP BY 1
),
nv AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(count(value) AS BIGINT) AS n_vals
  FROM events GROUP BY 1
)
SELECT nv.day, nv.n_vals, {_REP50} AS p50, {_REP90} AS p90
FROM nv LEFT JOIN sel USING (day)
"""


@_q("rollup_route_qsketch_percentile", _QS_ROUTE_ORACLE)
def rollup_route_qsketch_percentile(spark, sf):
    """Sparse-map quantile-sketch partial serving: one bucketed
    two-stage partial pass stores count + a qsketch of value per
    (bucket, day) cell, an at-rest parquet round trip, then
    merge_partials — the routed physical plan — folds the maps and
    rank-selects p50/p90. Documented accuracy: relative error <= 1/128
    vs the true order statistic; EXACT equality vs the oracle, which
    replays the identical sketch arithmetic."""
    import shutil
    import tempfile

    from betfair_database_spark.rollup import merge_partials, summarize_spec

    spec = {
        "dims": [{"alias": "day", "expr": "to_date(ts)"}],
        "aggs": [
            {"alias": "n", "op": "count", "col": "value"},
            {"alias": "vq", "op": "qsketch", "col": "value"},
        ],
    }
    ev = _t(spark, sf, "events").select(
        "ts", "value", (F.col("user_id") % 32).cast("int").alias("bucket")
    )
    internal = summarize_spec(ev, spec, part_col="bucket")
    path = tempfile.mkdtemp(prefix="bfdb_qsketch_route_gate_")
    try:
        internal.write.mode("overwrite").parquet(path)
        merged = merge_partials(
            spark.read.parquet(path),
            spec,
            ["day"],
            [
                ("count", "value", "n_vals"),
                ("approx_percentile", "value", "p50", 0.5),
                ("approx_percentile", "value", "p90", 0.9),
            ],
        )
        out = merged.select(
            F.col("day").cast("string").alias("day"), "n_vals", "p50", "p90"
        ).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


# =========================================================================
# qsketch_scan_signed — the production scan twin, sign lanes exercised
# =========================================================================
#
# approx_percentile works with NO declared partial (parameter-free):
# the scan builds the sketch from raw rows through the two-level SQL
# (_qsketch_scan_sql — per-(group, okey) counts, then merged partials).
# This row drives that exact production text over a SIGNED derived
# column (value - 50 spans the negative lane, the zero bin and several
# positive octaves) with mixed co-aggregates, WHERE pushdown and a
# multi-quantile selection.

_QKS = qsketch_key_sql("sv")
_REP25 = qsketch_rep_sql("k25")
_REP50S = qsketch_rep_sql("k50")
_REP75 = qsketch_rep_sql("k75")

_QS_SCAN_ORACLE = f"""
WITH src AS (
  SELECT event_type, value - 50.0 AS sv FROM events WHERE value < 900
),
keyed AS (
  SELECT event_type, {_QKS} AS k FROM src WHERE {_QKS} IS NOT NULL
),
counted AS (SELECT event_type, k, count(*) AS n FROM keyed GROUP BY 1, 2),
ranked AS (
  SELECT event_type, k, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY k) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM counted
),
sel AS (
  SELECT event_type,
    min(CASE WHEN CAST(cum AS DOUBLE) >= 0.25 * CAST(total AS DOUBLE)
             THEN k END) AS k25,
    min(CASE WHEN CAST(cum AS DOUBLE) >= 0.5 * CAST(total AS DOUBLE)
             THEN k END) AS k50,
    min(CASE WHEN CAST(cum AS DOUBLE) >= 0.75 * CAST(total AS DOUBLE)
             THEN k END) AS k75,
  FROM ranked GROUP BY 1
),
base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, min(sv) AS mn
  FROM src GROUP BY 1
)
SELECT base.event_type, base.n, base.mn,
       {_REP25} AS p25, {_REP50S} AS p50, {_REP75} AS p75
FROM base LEFT JOIN sel USING (event_type)
"""


@_q("qsketch_scan_signed", _QS_SCAN_ORACLE)
def qsketch_scan_signed(spark, sf):
    from betfair_database_spark.database import _qsketch_scan_sql

    _t(spark, sf, "events").createOrReplaceTempView("qs_scan_events")
    src = (
        "(SELECT event_type, value - 50.0 AS sv FROM qs_scan_events "
        "WHERE value < 900)"
    )
    sql = _qsketch_scan_sql(
        [
            "event_type",
            "count(*) AS n",
            "min(sv) AS mn",
            "approx_percentile(sv, 0.25) AS p25",
            "approx_percentile(sv, 0.5) AS p50",
            "approx_percentile(sv, 0.75) AS p75",
        ],
        ["event_type"],
        src,
        None,
    )
    return spark.sql(sql)
