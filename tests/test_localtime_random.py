"""Randomized local-time parity: 120 instants × timezones vs the reference's
own formula (str(datetime.astimezone(ZoneInfo))), including DST boundaries,
half-hour offsets, and sub-second values."""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

TZS = [
    "Europe/London",
    "Australia/Sydney",
    "America/New_York",
    "Asia/Kolkata",
    "Pacific/Auckland",
    "America/St_Johns",  # -02:30 in DST
    "UTC",
    "GMT",
]


def _gen(seed: int = 11, n: int = 120):
    rng = random.Random(seed)
    base = datetime(2022, 1, 1, tzinfo=timezone.utc)
    out = []
    for _ in range(n):
        dt = base + timedelta(
            days=rng.randint(0, 730),
            seconds=rng.randint(0, 86399),
            milliseconds=rng.choice([0, 0, 0, 500, 123]),
        )
        iso = dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"
        out.append((iso, rng.choice(TZS)))
    # DST transition edges (Europe/London: 2023-03-26 01:00 UTC springs forward)
    out.append(("2023-03-26T00:59:59.000Z", "Europe/London"))
    out.append(("2023-03-26T01:00:00.000Z", "Europe/London"))
    out.append(("2023-10-29T00:59:59.000Z", "Europe/London"))
    out.append(("2023-10-29T01:00:00.000Z", "Europe/London"))
    return out


def test_random_local_times_match_reference_formula(spark):
    from pyspark.sql import functions as F

    from betfair_database_spark.functions.localtime import (
        local_datetime_string,
        local_day_of_week,
    )

    cases = _gen()
    df = spark.createDataFrame(cases, ["iso", "tz"])
    rows = df.select(
        "iso",
        "tz",
        local_datetime_string(F.col("iso"), F.col("tz")).alias("local"),
        local_day_of_week(F.col("iso"), F.col("tz")).alias("dow"),
    ).collect()
    mismatches = []
    for r in rows:
        dt = datetime.fromisoformat(r.iso.replace("Z", "+00:00")).astimezone(
            ZoneInfo(r.tz)
        )
        if r.local != str(dt) or r.dow != dt.strftime("%A"):
            mismatches.append((r.iso, r.tz, r.local, str(dt)))
    assert not mismatches, mismatches[:10]
