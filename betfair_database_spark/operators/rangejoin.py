"""Bucketized range joins: point-in-interval and interval-overlap, without
the O(n*m) broadcast-nested-loop plan Spark picks for a bare theta join.

Spark SQL has no native range-join strategy (Databricks Photon adds one via
a hint; open-source Catalyst falls back to BroadcastNestedLoopJoin or a
cartesian product the moment the join condition has no equality conjunct).
The standard distributed fix — the same binning trick Databricks' range-join
hint and PostGIS tile joins use — is to synthesize an equality key:

    bucket(x) = floor(x / width)

* a POINT belongs to exactly one bucket;
* an INTERVAL [s, e] covers buckets floor(s/w) .. floor(e/w), emitted with
  ``explode(sequence(...))``;
* an equi (shuffle or broadcast) hash join on the bucket key finds every
  candidate pair, and the original range predicate refines it.

Point-in-interval needs no dedup (one bucket per point). Interval-overlap
would see a pair once per shared bucket, so each pair is emitted only in the
canonical bucket ``floor(greatest(s1, s2) / w)`` — the bucket where the
overlap starts — restoring exactly-once semantics without a distinct().

Cost model for ``width``: interval replication is ceil(len/w)+1 rows, probe
fanout per point is the number of intervals alive in its bucket. Pick width
around the median interval length; skewed buckets (a hot hour) degrade to
AQE skew-join handling because the join is a plain hash join on the bucket
key. This shape scales to 100 TB: one shuffle on (bucket[, key]), no
cartesian anywhere, and Catalyst still pushes column pruning/filters below
the explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _buckets_covered(start: str, end: str, width_expr: str) -> Column:
    return F.expr(
        f"sequence(CAST(floor(({start}) / ({width_expr})) AS BIGINT),"
        f"         CAST(floor(({end}) / ({width_expr})) AS BIGINT))"
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    width: int,
    extra_cond: Column | None = None,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner join of ``points`` rows to every ``intervals`` row whose
    ``[start_col, end_col]`` (inclusive both ends) contains ``point_col``.

    ``point_col`` / ``start_col`` / ``end_col`` must be numeric (cast
    timestamps to epoch micros first); ``width`` is the bucket width in the
    same unit. Column names must be disjoint between the two inputs.
    ``extra_cond`` (over the joined columns) is AND-ed into the refinement,
    NOT the bucket key — use it for non-equi residuals like ``u != v``.

    ``broadcast_intervals=True`` hints the (exploded) interval side as the
    broadcast build. Do this whenever the interval set is known-small (a
    watchlist, a calendar): Catalyst sizes the two sides from raw scan
    stats, and an aggregation-derived interval frame can look BIGGER than
    the point stream it came from — observed at 100x, where the optimizer
    broadcast a 1M-row point side over a 4.5k-row interval side.
    """
    pts = points.withColumn("_rj_bucket_p", F.expr(
        f"CAST(floor(({point_col}) / ({width})) AS BIGINT)"
    ))
    ivs = intervals.withColumn(
        "_rj_bucket_i", F.explode(_buckets_covered(start_col, end_col, str(width)))
    )
    if broadcast_intervals:
        ivs = F.broadcast(ivs)
    cond = (
        (F.col("_rj_bucket_p") == F.col("_rj_bucket_i"))
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return pts.join(ivs, cond).drop("_rj_bucket_p", "_rj_bucket_i")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    width: int,
    extra_cond: Column | None = None,
    broadcast_left: bool = False,
) -> DataFrame:
    """Inner join of interval pairs that overlap:
    ``left_start <= right_end AND right_start <= left_end`` (closed
    intervals). Each qualifying pair appears exactly once — it is emitted
    only in the bucket containing ``greatest(left_start, right_start)``,
    which both sides are guaranteed to cover when they overlap.

    Endpoints must be numeric and in the same unit as ``width``; column
    names must be disjoint between the inputs.
    """
    lhs = left.withColumn(
        "_rj_bucket_l", F.explode(_buckets_covered(left_start, left_end, str(width)))
    )
    if broadcast_left:
        # see point_in_interval_join: hint the known-small side explicitly
        lhs = F.broadcast(lhs)
    rhs = right.withColumn(
        "_rj_bucket_r", F.explode(_buckets_covered(right_start, right_end, str(width)))
    )
    canonical = F.expr(
        f"CAST(floor(greatest({left_start}, {right_start}) / ({width})) AS BIGINT)"
    )
    cond = (
        (F.col("_rj_bucket_l") == F.col("_rj_bucket_r"))
        & (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (F.col("_rj_bucket_l") == canonical)
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lhs.join(rhs, cond).drop("_rj_bucket_l", "_rj_bucket_r")


def merge_intervals(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
    order_tiebreak: str,
) -> DataFrame:
    """Union possibly-overlapping intervals per key into maximal disjoint
    islands (gaps-and-islands). Returns one row per island:
    (key, island_start, island_end, n_intervals).

    Plan shape: ONE shuffle on ``key`` feeds both windows and the final
    group-by (same partitioning, Catalyst reuses the exchange), per-key
    sort only — no self-join, no O(n^2) overlap pairing. An island opens
    where an interval's start exceeds the running max end of every
    EARLIER interval (ROWS ... 1 PRECEDING excludes the current row);
    touching intervals (start == prev end) merge. Deterministic for any
    input order: the window order (start, end, tiebreak) is total.

    The same interval-merge shape runs inside the substring-dedup span
    builder (operators/dedup.py) over token offsets; this is the
    standalone time-domain operator.
    """
    from pyspark.sql import Window

    w_order = [F.col(start), F.col(end), F.col(order_tiebreak)]
    w_prev = (
        Window.partitionBy(key)
        .orderBy(*w_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key)
        .orderBy(*w_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max_end = F.max(F.col(end)).over(w_prev)
    opens = F.when(
        prev_max_end.isNull() | (F.col(start) > prev_max_end), 1
    ).otherwise(0)
    return (
        df.withColumn("_island", F.sum(opens).over(w_run))
        .groupBy(key, "_island")
        .agg(
            F.min(start).alias("island_start"),
            F.max(end).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("_island")
    )
