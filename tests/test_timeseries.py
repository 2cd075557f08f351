"""EWMA per-key fold: agreement with the direct recurrence, order
independence of the input frame, and type preservation."""

from __future__ import annotations

import random

from betfair_database_spark.operators.timeseries import ewma_last_per_key


def _ewma(xs, alpha):
    s = None
    for x in xs:
        s = x if s is None else alpha * x + (1.0 - alpha) * s
    return s


def test_matches_direct_recurrence(spark):
    rng = random.Random(3)
    rows = []
    series = {}
    for k in ["a", "b", "c"]:
        xs = [rng.uniform(0, 100) for _ in range(50)]
        series[k] = xs
        rows += [(k, i, x, i * 10) for i, x in enumerate(xs)]
    rng.shuffle(rows)  # arrival order must not matter — the fold sorts
    df = spark.createDataFrame(rows, "k string, ts long, v double, tb long")
    got = {
        r.k: (r.n, r.ewma)
        for r in ewma_last_per_key(df, "k", "ts", "v", 0.25, "tb").collect()
    }
    for k, xs in series.items():
        n, e = got[k]
        assert n == 50
        assert e == _ewma(xs, 0.25)  # bit-identical, not approx


def test_single_row_key(spark):
    df = spark.createDataFrame([("x", 1, 7.5, 0)], "k string, ts long, v double, tb long")
    r = ewma_last_per_key(df, "k", "ts", "v", 0.5, "tb").first()
    assert (r.k, r.n, r.ewma) == ("x", 1, 7.5)


def test_tiebreak_pins_order(spark):
    # equal ts: tiebreak column decides which value is folded last
    df = spark.createDataFrame(
        [("k", 1, 0.0, 1), ("k", 1, 100.0, 2)], "k string, ts long, v double, tb long"
    )
    r = ewma_last_per_key(df, "k", "ts", "v", 0.5, "tb").first()
    assert r.ewma == 0.5 * 100.0 + 0.5 * 0.0


# ---------------------------------------------------------------------------
# resample_ohlc / path_ngrams (round 8)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from betfair_database_spark.operators.timeseries import (  # noqa: E402
    path_ngrams,
    resample_ohlc,
)


def test_ohlc_tiebreak_on_equal_ts(spark):
    # two rows share the earliest ts: open must come from the lower event_id;
    # two share the latest: close from the HIGHER event_id (max of struct)
    rows = [
        ("k", 10, 1, 5.0),
        ("k", 10, 2, 9.0),   # same ts as open candidate
        ("k", 20, 3, 1.0),
        ("k", 30, 4, 7.0),
        ("k", 30, 5, 2.0),   # same ts as close candidate
    ]
    df = spark.createDataFrame(rows, "g string, ts long, event_id long, value double")
    r = resample_ohlc(df, F.col("g"), [], "ts", "event_id", "value").first()
    assert (r.open, r.high, r.low, r.close, r.n, r.volume) == (
        5.0, 9.0, 1.0, 2.0, 5, 24.0,
    )


def test_ohlc_single_aggregate_no_window_exchange(spark):
    df = spark.createDataFrame(
        [("k", 1, 1, 1.0)], "g string, ts long, event_id long, value double"
    )
    plan = (
        resample_ohlc(df, F.col("g"), [], "ts", "event_id", "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan  # struct-min/max, not row_number


def test_path_ngrams_orders_within_key_only(spark):
    rows = [
        ("u1", 1, 1, "a"), ("u1", 2, 2, "b"), ("u1", 3, 3, "c"),
        ("u1", 4, 4, "a"),
        ("u2", 1, 5, "a"), ("u2", 2, 6, "b"), ("u2", 3, 7, "c"),
    ]
    df = spark.createDataFrame(rows, "u string, ts long, event_id long, et string")
    got = {
        r.path: r.n
        for r in path_ngrams(df, "u", "ts", "event_id", "et", n=3).collect()
    }
    assert got == {"a>b>c": 2, "b>c>a": 1}


def test_path_ngrams_short_key_yields_nothing(spark):
    df = spark.createDataFrame(
        [("u", 1, 1, "a"), ("u", 2, 2, "b")],
        "u string, ts long, event_id long, et string",
    )
    assert path_ngrams(df, "u", "ts", "event_id", "et", n=3).count() == 0


def test_interpolate_at_exact_hit_and_midpoint(spark):
    """An observation exactly at a grid point is returned verbatim; a grid
    point between two observations is the time-weighted blend; grid
    points outside the observation span are dropped."""
    import datetime as dt

    from pyspark.sql import functions as F

    from betfair_database_spark.operators import timeseries

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes, micros=0):
        return t0 + dt.timedelta(minutes=minutes, microseconds=micros)

    ev = spark.createDataFrame(
        [
            ("a", at(0), 1, 10.0),
            ("a", at(60), 2, 30.0),  # exact grid hit
            ("a", at(90), 3, 50.0),
            ("b", at(30), 4, 5.0),
            ("b", at(150, 1), 5, 8.0),  # off-grid micros
        ],
        "k string, ts timestamp_ntz, id long, v double",
    )
    grid = spark.createDataFrame(
        [("a", at(60)), ("a", at(75)), ("a", at(120)), ("b", at(60)), ("b", at(0))],
        "k string, ts timestamp_ntz",
    )
    got = {
        (r["k"], r["ts"], round(r["v_interp"], 6))
        for r in timeseries.interpolate_at(
            ev, grid, key="k", ts_col="ts", id_col="id", val_col="v"
        ).collect()
    }
    frac = (30 * 60_000_000) / (120 * 60_000_000 + 1)
    assert got == {
        ("a", at(60), 30.0),  # exact hit
        ("a", at(75), 40.0),  # midpoint of 30 -> 50
        # a@120 has no next observation -> dropped; b@0 no prev -> dropped
        ("b", at(60), round(5.0 + 3.0 * frac, 6)),
    }


def test_interpolate_at_exact_hit_at_last_observation(spark):
    """A grid point coinciding exactly with a key's LAST observation must
    return that observation's value — the backward window order keeps
    observations before markers at equal ts (is_grid ASC in both
    directions), so prev == next == the observation even with nothing
    after it. A fully reversed backward order dropped this row."""
    import datetime as dt

    from betfair_database_spark.operators import timeseries

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    ev = spark.createDataFrame(
        [("a", at(0), 1, 10.0), ("a", at(60), 2, 30.0)],
        "k string, ts timestamp_ntz, id long, v double",
    )
    grid = spark.createDataFrame(
        [("a", at(60))], "k string, ts timestamp_ntz"
    )
    got = timeseries.interpolate_at(
        ev, grid, key="k", ts_col="ts", id_col="id", val_col="v"
    ).collect()
    assert [(r["k"], r["ts"], r["v_interp"]) for r in got] == [
        ("a", at(60), 30.0)
    ]


def test_ffill_scalable_matches_single_window_fill(spark):
    """Randomized parity: the two-phase bucketed forward-fill equals the
    plain per-key running-last window, including nulls before any value
    (stay null), null-only buckets (carry crosses them), and values on
    bucket boundaries."""
    import datetime as dt
    import random

    from pyspark.sql import Window, functions as F

    from betfair_database_spark.operators import timeseries

    rng = random.Random(81521)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for k in ("a", "b", "c"):
        for i in range(300):
            ts = base + dt.timedelta(
                minutes=rng.randint(0, 60 * 24 * 10), seconds=i % 60
            )
            val = None if rng.random() < 0.6 else float(rng.randint(1, 99))
            rows.append((k, len(rows), ts, val))
    df = spark.createDataFrame(
        rows, "k string, id long, ts timestamp_ntz, v double"
    )
    got = {
        (r["k"], r["id"]): r["filled"]
        for r in timeseries.ffill_scalable(
            df, key="k", ts_col="ts", id_col="id", val_col="v", bucket="day"
        ).collect()
    }
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r["k"], r["id"]): r["filled"]
        for r in df.withColumn(
            "filled", F.last("v", ignorenulls=True).over(w)
        ).collect()
    }
    assert got == want
