"""Per-key ordered time-series folds that SQL windows cannot express.

EWMA (s_i = alpha*x_i + (1-alpha)*s_{i-1}, s_0 = x_0) is the canonical
example: the recurrence is a sequential left fold, not a frame aggregate —
no combination of SUM/AVG window frames computes it without numerically
explosive (1-alpha)^(-i) rescaling tricks. The distributed shape is
``applyInPandas``: one hash shuffle on the key, then each key's history is
folded inside an Arrow batch with vectorizable pandas (``ewm``-equivalent
arithmetic spelled out so any engine reproduces it bit-for-bit — a
sequential IEEE double fold is deterministic given the order, and the order
is pinned by (ts, tiebreak)).

Scale: state per task is one key-group at a time; skewed keys are the
limit (a single key's history must fit an Arrow batch) — for unbounded
per-key histories the streaming twin with applyInPandasWithState keeps
O(1) state instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_last_per_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    tiebreak_col: str,
) -> DataFrame:
    """Final EWMA value per key after folding ``value_col`` in
    (ts_col, tiebreak_col) order. Returns (key_col, n, ewma).

    The fold uses exactly ``alpha * x + (1 - alpha) * s`` with s seeded by
    the first value (pandas ``ewm(adjust=False)`` semantics) — spelled out
    so an oracle engine's ordered list_reduce reproduces every bit.
    """
    import pandas as pd

    a = float(alpha)
    key_field = df.schema[key_col]
    out_schema = (
        f"`{key_col}` {key_field.dataType.simpleString()}, n long, ewma double"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_col, ts_col, tiebreak_col])
        # grouped ewm(adjust=False) is pandas' C path for exactly
        # y_t = (1-a)*y_{t-1} + a*x_t — bit-equality with the explicit
        # Python fold is asserted in tests/test_timeseries.py, so the
        # 50-100x speedup over a per-row loop costs no reproducibility
        ew = (
            pdf.groupby(key_col, sort=False)[value_col]
            .ewm(alpha=a, adjust=False)
            .mean()
            .reset_index(drop=True)
        )
        pdf = pdf.reset_index(drop=True)
        pdf["_ew"] = ew
        last = pdf.groupby(key_col, sort=False).tail(1)
        return pd.DataFrame(
            {
                key_col: last[key_col].values,
                "n": pdf.groupby(key_col, sort=False).size().values,
                "ewma": last["_ew"].values,
            }
        )

    # one pandas group per HASH BUCKET, not per key: applyInPandas pays a
    # per-group Arrow/pandas round-trip, so fold many keys per call and
    # split them with pandas' own groupby (C) inside
    bucketed = df.select(
        key_col, ts_col, value_col, tiebreak_col,
        F.pmod(F.xxhash64(key_col), F.lit(64)).alias("_kb"),
    )
    return (
        bucketed.groupBy("_kb")
        .applyInPandas(
            lambda pdf: fold(pdf.drop(columns=["_kb"])), schema=out_schema
        )
    )


def resample_ohlc(
    df: DataFrame,
    bucket: "F.Column",
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """OHLC downsampling: per (bucket, keys) the open/high/low/close of
    ``value_col`` plus count and summed volume — the canonical time-series
    rollup (candlesticks, metric downsampling for retention tiers).

    Open/close are NOT windows-over-sorted-partitions: each is a plain
    ``min``/``max`` over a ``struct(ts, tiebreak, value)`` whose
    lexicographic order pins the earliest/latest row deterministically
    (ties broken by ``tiebreak_col``). That keeps the whole rollup ONE
    hash shuffle on the group key with map-side partial aggregation —
    no per-key sort, no window exchange — so at 100 TB it is exactly as
    cheap as a count(*) rollup. A window/row_number formulation would add
    a full sort per key; the struct-min trick is the scale-correct plan.

    Rounding of the four price columns is left to the caller (suite rows
    round to 2 for oracle hash-matching).
    """
    first = F.min(F.struct(ts_col, tiebreak_col, value_col))[value_col]
    last = F.max(F.struct(ts_col, tiebreak_col, value_col))[value_col]
    return df.groupBy(bucket, *key_cols).agg(
        first.alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        last.alias("close"),
        F.count("*").alias("n"),
        F.sum(value_col).alias("volume"),
    )


def path_ngrams(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    step_col: str,
    n: int = 3,
    sep: str = ">",
) -> DataFrame:
    """Sequential path mining: n-grams of ``step_col`` over each key's
    time-ordered event stream, counted corpus-wide — the "common user
    journeys" query (funnel discovery, session path analysis).

    Shape: one hash shuffle on the key + per-key sort for the lead()
    window (state bounded by a single key's history), then a hash
    aggregate on the path string. The window frame is per-user — never a
    global sort — so the plan scales with the largest single user, not
    the table. Returns (path, n) unordered; callers top-k it.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    steps = [F.col(step_col)] + [
        F.lead(step_col, i).over(w) for i in range(1, n)
    ]
    return (
        df.select(key_col, ts_col, tiebreak_col, step_col)
        .withColumns({f"_s{i}": s for i, s in enumerate(steps)})
        .where(F.col(f"_s{n - 1}").isNotNull())
        .select(
            F.concat_ws(sep, *[F.col(f"_s{i}") for i in range(n)]).alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
    )
