"""Import patterns: market → relative destination directory
(reference: imports.py:6-53).

A pattern is a Column expression over the flattened market frame — exactly a
partitioning scheme (SURVEY §2.6 F11). The reference's patterns:

  - betfair_historical: "{year}/{month_abbr}/{day}/{event_id}" from the
    market settled time if present else the market start time. Catalogue
    metadata keeps ``settledTime`` nested under ``description`` where the
    pattern's ``metadata.get("settledTime")`` never finds it, so catalogues
    always use the start time (imports.py:29-35) — our flat frame mirrors
    that because catalogue rows carry a NULL marketSettledTime.
  - event_id: just the event id.
  - flat: everything in the database root.

Custom user patterns: any callable mapping a flat-row dict to a relative
path string (applied via a vectorized pandas UDF), or any Column expression.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def betfair_historical() -> Column:
    ts = F.to_timestamp(F.coalesce(F.col("marketSettledTime"), F.col("marketStartTime")))
    return F.concat(
        F.date_format(ts, "yyyy/MMM/"),
        F.dayofmonth(ts).cast("string"),
        F.lit("/"),
        F.col("eventId"),
    )


def event_id() -> Column:
    return F.col("eventId")


def flat() -> Column:
    return F.lit("")


BUILTIN_PATTERNS: dict[str, Callable[[], Column]] = {
    "betfair_historical": betfair_historical,
    "event_id": event_id,
    "flat": flat,
}


def resolve_pattern(pattern) -> Column:
    """Accepts a builtin name, a Column, or a python callable (dict → str)."""
    if isinstance(pattern, Column):
        return pattern
    if isinstance(pattern, str):
        return BUILTIN_PATTERNS[pattern]()
    if callable(pattern):
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        from betfair_database_spark.const import SQL_TABLE_COLUMNS

        fn = pattern

        names = list(SQL_TABLE_COLUMNS)

        # The user contract is a Python callable over a row DICT, so the
        # per-row Python call is irreducible; build the dicts with a plain
        # zip over the Arrow-backed columns (several times faster than
        # DataFrame.apply(axis=1), which constructs a pandas Series per
        # row). Varargs must stay annotation-free: pandas_udf's type-hint
        # inference rejects a typed *cols signature.
        def _pattern_fn(*cols):
            values = [c.tolist() for c in cols]
            out = [fn(dict(zip(names, row))) for row in zip(*values)]
            return pd.Series(out, dtype="object")

        _pattern_udf = pandas_udf(_pattern_fn, "string")

        return _pattern_udf(*[F.col(c) for c in SQL_TABLE_COLUMNS])
    raise TypeError(f"Unsupported import pattern: {pattern!r}")
