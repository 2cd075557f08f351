"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key — an operator Spark SQL lacks natively.

Implemented with the union + window trick (no m×n join blowup):

    tag left(ts) and right(ts) rows, union them, window over
    (key ORDER BY ts, side) with last_value(right_payload IGNORE NULLS)
    → every left row picks up the most recent right payload.

One shuffle on the key, O(n log n) within partitions — this is the shape
that survives 100 TB (a naive range join is O(n·m) per key). Skewed keys
fall to AQE skew-join handling since the shuffle is a plain hash partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: each left row gains the payload of the latest right
    row with right_ts <= left_ts (direction='backward'), per `on` key.

    Right rows must be unique per (on, right_ts) for determinism — pre-
    aggregate if not.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")

    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows (side 0) sort first on ties
        F.struct(*left.columns).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            lhs.schema["_left"].dataType
        ).alias("_left"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).select(
        "_k",
        "_ts",
        "_side",
        "_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in payload_cols
        ],
    )
    out = merged.where(F.col("_side") == 1).select(
        F.col("_left.*"),
        *[F.col(f"_rv_{c}").alias(c) for c in payload_cols],
    )
    return out
