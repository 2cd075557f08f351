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
    b = 1.0 - a
    key_field = df.schema[key_col]
    out_schema = (
        f"`{key_col}` {key_field.dataType.simpleString()}, n long, ewma double"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col])
        s = None
        for x in pdf[value_col]:
            x = float(x)
            s = x if s is None else a * x + b * s
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "n": [len(pdf)], "ewma": [s]}
        )

    return (
        df.select(key_col, ts_col, value_col, tiebreak_col)
        .groupBy(key_col)
        .applyInPandas(fold, schema=out_schema)
    )
