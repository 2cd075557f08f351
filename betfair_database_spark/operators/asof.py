"""As-of join: for each left row, the nearest right row per key — backward
(latest at-or-before), forward (earliest at-or-after), or nearest (closer of
the two; backward wins ties) — an operator Spark SQL lacks natively.

Implemented with the union + window trick (no m×n join blowup):

    tag left(ts) and right(ts) rows, union them, window over
    (key ORDER BY ts, side) with last_value(right_payload IGNORE NULLS)
    → every left row picks up the most recent right payload; the forward
    direction is the mirror image (first_value over the following frame).

One shuffle on the key, O(n log n) within partitions — this is the shape
that survives 100 TB (a naive range join is O(n·m) per key). 'nearest'
evaluates both window frames over the SAME hash partitioning, so it still
costs one exchange (two in-partition sorts — tie order differs between the
directions). Skewed keys fall to AQE skew-join handling since the shuffle
is a plain hash partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join per `on` key.

    direction='backward': payload of the latest right row with
    right_ts <= left_ts. direction='forward': earliest right row with
    right_ts >= left_ts. direction='nearest': whichever of the two is
    closer in time; equal distance (and the exact-match case) resolves
    backward, matching pandas.merge_asof(direction='nearest').

    Right rows must be unique per (on, right_ts) for determinism — pre-
    aggregate if not.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")

    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows are side 0
        F.struct(*left.columns).alias("_left"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lhs.schema["_left"].dataType).alias("_left"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    union = lhs.unionByName(rhs)

    # backward: ascending (ts, side) puts a same-ts right row (side 0) BEFORE
    # the left row, so the [unbounded, current] frame includes exact matches.
    w_back = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: descending side on ties puts the right row AFTER the left row,
    # so the [current, unbounded] frame includes exact matches.
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def picked(c: str):
        if direction == "backward":
            return F.last(c, ignorenulls=True).over(w_back)
        if direction == "forward":
            return F.first(c, ignorenulls=True).over(w_fwd)
        back = F.last(c, ignorenulls=True).over(w_back)
        fwd = F.first(c, ignorenulls=True).over(w_fwd)
        back_ts = F.last("_rts", ignorenulls=True).over(w_back)
        fwd_ts = F.first("_rts", ignorenulls=True).over(w_fwd)
        # forward wins only when STRICTLY closer (ties → backward, the
        # pandas convention); missing side loses automatically
        choose_fwd = back_ts.isNull() | (
            fwd_ts.isNotNull() & ((fwd_ts - F.col("_ts")) < (F.col("_ts") - back_ts))
        )
        return F.when(choose_fwd, fwd).otherwise(back)

    merged = union.select(
        "_side",
        "_left",
        *[picked(f"_r_{c}").alias(f"_rv_{c}") for c in payload_cols],
    )
    return merged.where(F.col("_side") == 1).select(
        F.col("_left.*"),
        *[F.col(f"_rv_{c}").alias(c) for c in payload_cols],
    )
