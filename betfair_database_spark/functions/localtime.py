"""Local-time derivation (reference: metadata.py:40-72).

The reference renders local times as ``str(datetime)`` of a tz-aware Python
datetime, e.g. ``2023-07-28 13:35:00+01:00`` (with ``.ffffff`` micros only
when non-zero, and no trailing 'Z' form). We reproduce that exact string with
built-in column expressions:

  - wall-clock local time:  from_utc_timestamp(ts, tz)  (per-row timezone)
  - UTC offset:             unix(from_utc_timestamp) - unix(ts) under a UTC
                            session timezone
  - weekday name:           date_format(local, 'EEEE')  ('%A' in C locale)

All of it is JVM-side; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _local_ts(utc_iso: Column, tz: Column) -> Column:
    """Wall-clock local timestamp for an ISO-8601 UTC string and IANA tz."""
    return F.from_utc_timestamp(F.to_timestamp(utc_iso), tz)


def _offset_str(utc_iso: Column, tz: Column) -> Column:
    """'+01:00'-style UTC offset of tz at the given instant.

    Requires spark.sql.session.timeZone=UTC (set by session.get_spark) so that
    unix_timestamp() of the shifted timestamp reads back the shifted epoch.
    """
    ts = F.to_timestamp(utc_iso)
    off = (F.unix_timestamp(_local_ts(utc_iso, tz)) - F.unix_timestamp(ts)).cast(
        "long"
    )
    sign = F.when(off < 0, F.lit("-")).otherwise(F.lit("+"))
    abs_off = F.abs(off)
    hh = F.lpad((abs_off / 3600).cast("int").cast("string"), 2, "0")
    mm = F.lpad(((abs_off % 3600) / 60).cast("int").cast("string"), 2, "0")
    return F.concat(sign, hh, F.lit(":"), mm)


def local_datetime_string(utc_iso: Column, tz: Column) -> Column:
    """str(datetime) rendering of the local time: 'YYYY-MM-DD HH:MM:SS[.ffffff]+HH:MM'.

    NULL when either input is NULL or empty (the reference skips the field
    when the input is falsy, metadata.py:58-71).
    """
    local = _local_ts(utc_iso, tz)
    micros = F.unix_micros(F.to_timestamp(utc_iso)) % 1_000_000
    base = F.date_format(local, "yyyy-MM-dd HH:mm:ss")
    frac = F.when(
        micros != 0,
        F.concat(
            F.lit("."),
            # full 6-digit width, matching str(datetime) (python does not
            # strip trailing zeros)
            F.lpad(micros.cast("string"), 6, "0"),
        ),
    ).otherwise(F.lit(""))
    out = F.concat(base, frac, _offset_str(utc_iso, tz))
    return F.when(
        utc_iso.isNotNull() & (utc_iso != "") & tz.isNotNull() & (tz != ""), out
    )


def local_day_of_week(utc_iso: Column, tz: Column) -> Column:
    """Local weekday name, e.g. 'Friday' (reference metadata.py:62)."""
    out = F.date_format(_local_ts(utc_iso, tz), "EEEE")
    return F.when(
        utc_iso.isNotNull() & (utc_iso != "") & tz.isNotNull() & (tz != ""), out
    )
