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


def interpolate_at(
    events: DataFrame,
    grid: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    val_col: str,
) -> DataFrame:
    """Linear interpolation of ``val_col`` at the ``grid`` timestamps.

    ``events``: (key, ts, id, value) observations; ``grid``: (key, ts)
    query points. Returns (key, ts, v_interp) for every grid point with
    an observation on both sides (exact-hit grid points return the
    observation value).

    Plan shape: zero joins — grid markers are UNIONed into the event
    stream and two running ``last(..., ignorenulls=True)`` windows (one
    per direction) carry the bracketing observations to each marker, so
    the cost is one shuffle on ``key`` + two per-key sorts regardless of
    grid density. The forward order is (ts, is_grid, id); the backward
    order is (ts DESC, is_grid ASC, id DESC) — is_grid stays ASCENDING in
    both so an observation at exactly a grid timestamp is processed
    before the marker in BOTH directions, making prev == next == the
    observation, and the t_next == t_prev guard then returns it exactly
    (no 0/0) — including at a key's LAST observation, where a fully
    reversed order would leave the marker's backward frame empty and
    drop the exact hit. Interpolation arithmetic is
    integer-MICROsecond diffs — the storage precision, where Spark's
    truncating timestampdiff and DuckDB's boundary-counting date_diff
    agree exactly (at any coarser unit they differ by one whenever the
    sub-unit part is nonzero); NTZ-safe, timezone-free.
    """
    from pyspark.sql import Window

    ev = events.select(
        F.col(key),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_grid"),
        F.col(id_col).cast("long").alias("_id"),
        F.col(val_col).cast("double").alias("_v"),
    )
    gm = grid.select(
        F.col(key),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_grid"),
        F.lit(None).cast("long").alias("_id"),
        F.lit(None).cast("double").alias("_v"),
    )
    u = ev.unionByName(gm)
    fwd = [F.col("_ts"), F.col("_is_grid"), F.coalesce("_id", F.lit(0))]
    # NOT the full reverse: _is_grid stays ascending so obs-before-marker
    # holds at equal ts in both directions (see docstring).
    bwd = [
        F.col("_ts").desc(),
        F.col("_is_grid").asc(),
        F.coalesce("_id", F.lit(0)).desc(),
    ]
    w_f = (
        Window.partitionBy(key).orderBy(*fwd).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    w_b = (
        Window.partitionBy(key).orderBy(*bwd).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    obs_ts = F.when(F.col("_is_grid") == 0, F.col("_ts"))
    c = (
        u.withColumn("_pv", F.last("_v", ignorenulls=True).over(w_f))
        .withColumn("_pt", F.last(obs_ts, ignorenulls=True).over(w_f))
        .withColumn("_nv", F.last("_v", ignorenulls=True).over(w_b))
        .withColumn("_nt", F.last(obs_ts, ignorenulls=True).over(w_b))
    )
    num = F.expr("timestampdiff(MICROSECOND, _pt, _ts)").cast("double")
    den = F.expr("timestampdiff(MICROSECOND, _pt, _nt)").cast("double")
    v = F.when(F.col("_nt") == F.col("_pt"), F.col("_pv")).otherwise(
        F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (num / den)
    )
    return (
        c.where(
            (F.col("_is_grid") == 1)
            & F.col("_pt").isNotNull()
            & F.col("_nt").isNotNull()
        )
        .select(F.col(key), F.col("_ts").alias(ts_col), v.alias("v_interp"))
    )


def ffill_scalable(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    bucket: str = "day",
    out_col: str = "filled",
) -> DataFrame:
    """Forward-fill (last non-null carry) whose parallelism is
    |key| x |time buckets| instead of |key| — the two-phase distributed
    prefix-scan that rescues per-key ORDERED operators when the key is
    low-cardinality (the constraint the 100x run surfaced: 5 event types
    = 5 tasks for a plain per-key window, however big the data).

    Phase 1 (parallel): per (key, bucket) reduce to the bucket's LAST
    non-null value — a hash aggregate with map-side partials, no sort.
    Phase 2 (tiny): carry those bucket-lasts across buckets per key with
    a running window over the (key x buckets)-sized frame — thousands of
    rows, not billions.
    Phase 3 (parallel): within each (key, bucket) run the ordinary
    running-last window, seeded by the PREVIOUS buckets' carry — the
    window partitions by (key, bucket), restoring full parallelism.

    Exactly equals the single-window per-key fill (parity-tested on
    randomized data): within-bucket carry wins when present, else the
    cross-bucket seed. Total order inside a key is (ts, id).

    WHEN TO USE (measured, PLANS.md round-8): this form pays TWO full
    exchanges (phase-1 agg + phase-3 window) against the plain window's
    one; at 10M rows x 5 keys on 32 cores the plain window wins 5 s vs
    12.5 s. Reach for it only when a single key's rows exceed what one
    task can sort without spilling (≈100M+ rows/key) — exactly the
    regime where the plain form stops working at all.
    """
    from pyspark.sql import Window

    b = F.date_trunc(bucket, F.col(ts_col)).alias("_bucket")
    rows = df.withColumn("_bucket", F.date_trunc(bucket, F.col(ts_col)))
    nn = F.when(
        F.col(val_col).isNotNull(),
        F.struct(F.col(ts_col), F.col(id_col), F.col(val_col)),
    )
    bucket_last = rows.groupBy(key, "_bucket").agg(
        F.max(nn).alias("_last")
    )
    w_seed = (
        Window.partitionBy(key)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = bucket_last.select(
        key,
        "_bucket",
        F.last(F.col("_last")[val_col], ignorenulls=True)
        .over(w_seed)
        .alias("_seed"),
    )
    w_in = (
        Window.partitionBy(key, "_bucket")
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        # seeds is |key| x |buckets| rows — broadcast, so the only big
        # exchange is the window's own (key, bucket) partitioning
        rows.join(F.broadcast(seeds), [key, "_bucket"])
        .withColumn("_within", F.last(val_col, ignorenulls=True).over(w_in))
        .withColumn(out_col, F.coalesce("_within", "_seed"))
        .drop("_bucket", "_within", "_seed")
    )
