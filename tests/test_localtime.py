"""Local-time golden tests: expected values computed with the reference's own
formula (str(datetime.astimezone(ZoneInfo)), reference metadata.py:40-72) so
the assertion is parity, not hand-derivation."""

from __future__ import annotations

from datetime import datetime
from zoneinfo import ZoneInfo

import pytest

CASES = [
    ("2023-07-28T12:35:00.000Z", "Europe/London"),
    ("2023-12-01T12:00:00.000Z", "Europe/London"),
    ("2023-07-28T12:35:00.500Z", "Australia/Sydney"),
    ("2023-01-15T01:30:00.000Z", "America/New_York"),
    ("2023-07-27T20:30:00.000Z", "Asia/Kolkata"),
    ("2023-07-27T20:30:00.000Z", "GMT"),
]


def _reference_local(iso: str, tz: str) -> tuple[str, str]:
    dt = datetime.fromisoformat(iso.replace("Z", "+00:00")).astimezone(ZoneInfo(tz))
    return str(dt), dt.strftime("%A")


@pytest.fixture(scope="module")
def computed(spark):
    from pyspark.sql import functions as F

    from betfair_database_spark.functions.localtime import (
        local_datetime_string,
        local_day_of_week,
    )

    df = spark.createDataFrame(CASES, ["iso", "tz"])
    rows = df.select(
        "iso",
        "tz",
        local_datetime_string(F.col("iso"), F.col("tz")).alias("local"),
        local_day_of_week(F.col("iso"), F.col("tz")).alias("dow"),
    ).collect()
    return {(r.iso, r.tz): (r.local, r.dow) for r in rows}


@pytest.mark.parametrize("iso,tz", CASES, ids=[f"{c[0]}@{c[1]}" for c in CASES])
def test_local_time_matches_reference_formula(computed, iso, tz):
    expected_str, expected_dow = _reference_local(iso, tz)
    got_str, got_dow = computed[(iso, tz)]
    assert got_str == expected_str
    assert got_dow == expected_dow


def test_null_inputs_give_null(spark):
    from pyspark.sql import functions as F

    from betfair_database_spark.functions.localtime import local_datetime_string

    df = spark.createDataFrame([(None, "Europe/London"), ("2023-07-28T12:35:00.000Z", None)], ["iso", "tz"])
    rows = df.select(local_datetime_string(F.col("iso"), F.col("tz")).alias("x")).collect()
    assert all(r.x is None for r in rows)
