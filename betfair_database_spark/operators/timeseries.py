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
