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
