"""Suite extension 12 (round 11): avg served from sum/count partials and
WHERE on a DERIVED rollup dim, both under DuckDB hash scrutiny.

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py`` (aliases identical on both
sides, doubles rounded before compare, deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betfair_database_spark.suite import _q, _t

# =========================================================================
# rollup_route_avg_derived_where — the round-11 routing surface additions
# =========================================================================
#
# Two new routed capabilities in one merge-algebra row (the DB-surface
# wiring — select() routing, scan fallback, stale fallback — is
# pytest-pinned in test_maintenance.py::TestRollupRouting):
#
#   1. avg(col) is DERIVED from the stored sum + non-null-count partials
#      as one division (merge_partials op "avg"); the scan twin
#      (_scan_agg_sql) computes the same sum(col)/count(col), so both
#      engine paths and this oracle agree bit-for-bit on integer inputs
#      (micros as BIGINT — the recorded cross-engine rule: double sums
#      reassociate, integer sums don't; the final division of exact
#      integers is correctly rounded in both engines).
#   2. WHERE on a DERIVED dim (day, an expression over ts) filters the
#      partials frame BEFORE the merge — each partial cell carries one
#      value of every dim, so the filter commutes with the aggregation.
#
# A wrong denominator (count(*) instead of count(col)), a filter applied
# post-merge, or a partial lost in the parquet round trip all change the
# hash.

_AVG_ROUTE_ORACLE = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       count(value) AS n_vals,
       round(sum(CAST(round(value * 1e6) AS BIGINT)) * 1.0 / count(value), 4)
         AS avg_value_micros
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-21'
GROUP BY day
"""


@_q("rollup_route_avg_derived_where", _AVG_ROUTE_ORACLE)
def rollup_route_avg_derived_where(spark, sf):
    """avg over materialized partials with a derived-dim filter: one
    bucketed partial pass stores sum(value_micros) + count(value_micros)
    per (bucket, day) cell, an at-rest parquet round trip, then
    merge_partials — the routed physical plan — filters on the derived
    day dim pre-merge and serves avg as the sum/count division. The raw
    events are never re-read after the partials land."""
    import shutil
    import tempfile

    from betfair_database_spark.rollup import merge_partials, summarize_spec

    spec = {
        "dims": [{"alias": "day", "expr": "to_date(ts)"}],
        "aggs": [
            {"alias": "n", "op": "count", "col": "value_micros"},
            {"alias": "s", "op": "sum", "col": "value_micros"},
        ],
    }
    ev = _t(spark, sf, "events").select(
        "ts",
        F.round(F.col("value") * 1e6).cast("long").alias("value_micros"),
        (F.col("user_id") % 32).cast("int").alias("bucket"),
    )
    internal = summarize_spec(ev, spec, part_col="bucket")
    path = tempfile.mkdtemp(prefix="bfdb_avg_route_gate_")
    try:
        internal.write.mode("overwrite").parquet(path)
        merged = merge_partials(
            spark.read.parquet(path),
            spec,
            ["day"],
            [
                ("count", "value_micros", "n_vals"),
                ("avg", "value_micros", "avg_value_micros"),
            ],
            where_expr=(
                "day BETWEEN DATE '2024-01-08' AND DATE '2024-01-21'"
            ),
        )
        out = merged.select(
            F.col("day").cast("string").alias("day"),
            "n_vals",
            F.round("avg_value_micros", 4).alias("avg_value_micros"),
        ).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out
