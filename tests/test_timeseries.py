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


def test_interpolate_bucketed_matches_windowed(spark):
    """Cardinality dispatch (round 9): the two-phase bucketed
    interpolation must equal the per-key window form BIT-FOR-BIT on
    randomized data — few huge keys and many small keys, null values
    (advance the bracket ts but not the carried value), exact-hit grid
    points, duplicate timestamps, marker-only buckets, and grid points
    outside the span. Also pins that bucket='auto' dispatches: low-key
    high-volume frames take the bucketed plan (visible as the _bkt
    partitioning in the optimized plan), high-key frames the window plan."""
    import datetime as dt
    import random

    from betfair_database_spark.operators import timeseries

    rng = random.Random(99)
    t0 = dt.datetime(2024, 3, 1)

    def make(n_keys, rows_per_key):
        ev, gr = [], []
        eid = 0
        for k in range(n_keys):
            kk = f"k{k}"
            for _ in range(rows_per_key):
                ts = t0 + dt.timedelta(
                    seconds=rng.randrange(0, 6 * 86_400),
                    microseconds=rng.randrange(0, 1_000_000),
                )
                v = None if rng.random() < 0.15 else round(rng.uniform(-5, 5), 3)
                ev.append((kk, ts, eid, v))
                eid += 1
            for _ in range(rows_per_key // 2):
                if rng.random() < 0.3 and ev:  # exact hits incl. span edges
                    gr.append((kk, rng.choice(ev)[1]))
                else:
                    gr.append(
                        (
                            kk,
                            t0
                            + dt.timedelta(
                                seconds=rng.randrange(-3600, 7 * 86_400)
                            ),
                        )
                    )
        e = spark.createDataFrame(
            ev, "k string, ts timestamp_ntz, id long, v double"
        )
        g = spark.createDataFrame(gr, "k string, ts timestamp_ntz")
        return e, g

    def run(e, g, bucket):
        return sorted(
            (r["k"], r["ts"], r["v_interp"])
            for r in timeseries.interpolate_at(
                e, g, key="k", ts_col="ts", id_col="id", val_col="v",
                bucket=bucket,
            ).collect()
        )

    for n_keys, rows in ((3, 400), (40, 25)):
        e, g = make(n_keys, rows)
        base = run(e, g, None)
        assert base  # non-degenerate
        for bucket in ("day", "hour"):
            assert run(e, g, bucket) == base
        assert run(e, g, "auto") == base

    # dispatch really dispatches: force the regime thresholds around a
    # small frame by monkey-tweaking the constants via module attributes
    old_rows = timeseries.DISPATCH_MIN_ROWS_PER_KEY
    try:
        timeseries.DISPATCH_MIN_ROWS_PER_KEY = 10
        e, g = make(2, 60)  # 2 keys >= 10 rows/key -> bucketed
        plan = timeseries.interpolate_at(
            e, g, key="k", ts_col="ts", id_col="id", val_col="v",
            bucket="auto",
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "_bkt" in plan
        e2, g2 = make(200, 3)  # 200 keys, tiny histories -> window path
        plan2 = timeseries.interpolate_at(
            e2, g2, key="k", ts_col="ts", id_col="id", val_col="v",
            bucket="auto",
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "_bkt" not in plan2
    finally:
        timeseries.DISPATCH_MIN_ROWS_PER_KEY = old_rows


def test_ffill_dispatch_parity_both_regimes(spark):
    """ffill (round 9): the auto-dispatching wrapper equals the plain
    window form row-for-row in both key regimes, and the dispatch picks
    the two-phase plan only in the low-cardinality/huge-history regime."""
    import datetime as dt
    import random

    from betfair_database_spark.operators import timeseries

    rng = random.Random(31)
    t0 = dt.datetime(2024, 5, 1)

    def make(n_keys, rows_per_key):
        rows = []
        rid = 0
        for k in range(n_keys):
            for _ in range(rows_per_key):
                rows.append(
                    (
                        f"k{k}",
                        t0 + dt.timedelta(seconds=rng.randrange(0, 5 * 86_400)),
                        rid,
                        None if rng.random() < 0.4 else round(rng.uniform(0, 9), 3),
                    )
                )
                rid += 1
        return spark.createDataFrame(
            rows, "k string, ts timestamp_ntz, id long, v double"
        )

    def run(df, bucket):
        return sorted(
            tuple(r)
            for r in timeseries.ffill(
                df, "k", "ts", "id", "v", bucket=bucket
            ).collect()
        )

    for n_keys, rows in ((2, 500), (50, 20)):
        df = make(n_keys, rows)
        base = run(df, None)
        assert run(df, "day") == base
        assert run(df, "auto") == base

    old = timeseries.DISPATCH_MIN_ROWS_PER_KEY
    try:
        timeseries.DISPATCH_MIN_ROWS_PER_KEY = 10
        df = make(2, 80)
        plan = timeseries.ffill(
            df, "k", "ts", "id", "v", bucket="auto"
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "_bucket" in plan  # ffill_scalable's helper column
        df2 = make(300, 2)
        plan2 = timeseries.ffill(
            df2, "k", "ts", "id", "v", bucket="auto"
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "_bucket" not in plan2
    finally:
        timeseries.DISPATCH_MIN_ROWS_PER_KEY = old


def test_dispatch_thresholds_read_session_conf(spark):
    """Cluster operators tune the dispatch crossover via
    spark.bfdb.dispatch.* conf keys; the measured module constants stay
    the defaults."""
    import datetime as dt

    from betfair_database_spark.operators import timeseries

    t0 = dt.datetime(2024, 6, 1)
    rows = [
        ("k0", t0 + dt.timedelta(minutes=i), i, float(i % 7)) for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp_ntz, id long, v double"
    )
    try:
        spark.conf.set("spark.bfdb.dispatch.minRowsPerKey", "10")
        plan = timeseries.ffill(
            df, "k", "ts", "id", "v", bucket="auto"
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "_bucket" in plan  # conf pulled the crossover down
    finally:
        spark.conf.unset("spark.bfdb.dispatch.minRowsPerKey")
    plan = timeseries.ffill(
        df, "k", "ts", "id", "v", bucket="auto"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "_bucket" not in plan  # default crossover restored


def test_dispatch_stats_memoized_per_plan(spark, monkeypatch):
    """Round 10 (verdict #5): the auto-dispatch probe runs its stats
    aggregate ONCE per (plan, key, ts) within a session — a second
    ffill/interpolate_at on the same frame hits the memo, an explicit
    stats= triple skips the probe entirely, and a different frame (or
    key) probes again. Results are unaffected on every path."""
    import datetime as dt

    from betfair_database_spark.operators import timeseries

    t0 = dt.datetime(2024, 6, 1)
    rows = [
        ("k%d" % (i % 3), t0 + dt.timedelta(minutes=i), i, float(i % 7))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp_ntz, id long, v double"
    )
    calls = {"n": 0}
    real = timeseries._dispatch_stats

    def counting(events, key, ts_col):
        calls["n"] += 1
        return real(events, key, ts_col)

    monkeypatch.setattr(timeseries, "_dispatch_stats", counting)
    timeseries._STATS_MEMO.clear()

    base = timeseries.ffill(df, "k", "ts", "id", "v").collect()
    assert calls["n"] == 1
    again = timeseries.ffill(df, "k", "ts", "id", "v").collect()
    assert calls["n"] == 1  # memo hit: no extra aggregate job
    assert sorted(map(tuple, again)) == sorted(map(tuple, base))
    # interpolate_at probes the SAME (key, ts) projection -> shared hit
    grid = df.select("k", "ts").limit(5)
    timeseries.interpolate_at(df, grid, "k", "ts", "id", "v").collect()
    assert calls["n"] == 1
    # explicit stats= skips the probe outright
    timeseries._STATS_MEMO.clear()
    pre = timeseries.dispatch_stats(df, "k", "ts")
    assert calls["n"] == 2
    forced = timeseries.ffill(df, "k", "ts", "id", "v", stats=pre).collect()
    assert calls["n"] == 2
    assert sorted(map(tuple, forced)) == sorted(map(tuple, base))
    # a different frame (different plan) probes again
    timeseries.ffill(df.where("id < 30"), "k", "ts", "id", "v").collect()
    assert calls["n"] == 3
    # a different key column on the same frame probes again
    df2 = df.withColumnRenamed("v", "w").withColumn("v", F.col("w"))
    timeseries.ffill(df2, "k", "ts", "id", "v").collect()
    assert calls["n"] == 4


def test_ffill_auto_on_iso_string_timestamps(spark):
    """The index stores datetimes as ISO-8601 STRINGS; auto dispatch must
    not crash on a non-datetime ts column (span probe degrades to 0, the
    two-phase form still works via date_trunc's implicit cast), and the
    fill itself is order-correct because ISO strings sort chronologically."""
    from betfair_database_spark.operators import timeseries

    rows = [
        ("k", f"2024-06-01T0{h}:00:00.000Z", h, None if h % 2 else float(h))
        for h in range(8)
    ]
    df = spark.createDataFrame(rows, "k string, ts string, id long, v double")
    base = sorted(
        tuple(r)
        for r in timeseries.ffill(df, "k", "ts", "id", "v", bucket=None).collect()
    )
    assert base == sorted(
        tuple(r)
        for r in timeseries.ffill(df, "k", "ts", "id", "v", bucket="auto").collect()
    )
    old = timeseries.DISPATCH_MIN_ROWS_PER_KEY
    try:
        timeseries.DISPATCH_MIN_ROWS_PER_KEY = 1  # force the bucketed path
        assert base == sorted(
            tuple(r)
            for r in timeseries.ffill(
                df, "k", "ts", "id", "v", bucket="auto"
            ).collect()
        )
    finally:
        timeseries.DISPATCH_MIN_ROWS_PER_KEY = old


def test_ewma_scalable_matches_sequential_fold(spark):
    """The two-phase affine-composition EWMA equals the sequential pandas
    fold to ~1e-12 relative error (IEEE reassociation is the documented
    delta — it is why ewma_last_per_key does not auto-dispatch), with
    exact n counts, across both key regimes and bucket granularities."""
    import datetime as dt
    import math
    import random

    from betfair_database_spark.operators.timeseries import (
        ewma_last_per_key,
        ewma_last_per_key_scalable,
    )

    rng = random.Random(17)
    t0 = dt.datetime(2024, 2, 1)

    for n_keys, rows_per_key in ((3, 300), (40, 12)):
        rows = []
        rid = 0
        for k in range(n_keys):
            for _ in range(rows_per_key):
                rows.append(
                    (
                        f"k{k}",
                        t0
                        + dt.timedelta(
                            seconds=rng.randrange(0, 10 * 86_400)
                        ),
                        rid,
                        round(rng.uniform(-3, 3), 4),
                    )
                )
                rid += 1
        df = spark.createDataFrame(
            rows, "k string, ts timestamp_ntz, id long, v double"
        )
        exact = {
            r["k"]: (r["n"], r["ewma"])
            for r in ewma_last_per_key(df, "k", "ts", "v", 0.3, "id").collect()
        }
        for bucket in ("day", "hour"):
            got = {
                r["k"]: (r["n"], r["ewma"])
                for r in ewma_last_per_key_scalable(
                    df, "k", "ts", "v", 0.3, "id", bucket=bucket
                ).collect()
            }
            assert got.keys() == exact.keys()
            for k, (n, y) in exact.items():
                gn, gy = got[k]
                assert gn == n
                assert math.isclose(gy, y, rel_tol=1e-9, abs_tol=1e-12)


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


def test_dispatch_stats_persisted_across_cold_sessions(
    spark, tmp_path, monkeypatch
):
    """Round 11 (verdict #8): for FILE-BACKED frames the probed
    (n_rows, n_keys, span) triple persists in the sidecar cache, so a
    cold session (memo empty, frame re-read from disk) runs ZERO probe
    jobs; rewriting the data (new part files) invalidates the key and
    re-probes; in-memory frames are never persisted."""
    import datetime as dt

    from betfair_database_spark.operators import timeseries

    t0 = dt.datetime(2024, 6, 1)
    rows = [
        ("k%d" % (i % 3), t0 + dt.timedelta(minutes=i), i, float(i % 7))
        for i in range(60)
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(
        rows, "k string, ts timestamp_ntz, id long, v double"
    ).write.parquet(src)

    calls = {"n": 0}
    real = timeseries._dispatch_stats

    def counting(events, key, ts_col):
        calls["n"] += 1
        return real(events, key, ts_col)

    monkeypatch.setattr(timeseries, "_dispatch_stats", counting)
    cache = str(tmp_path / "statscache")
    try:
        spark.conf.set("spark.bfdb.dispatch.statsDir", cache)
        timeseries._STATS_MEMO.clear()
        first = timeseries.dispatch_stats(
            spark.read.parquet(src), "k", "ts"
        )
        assert calls["n"] == 1
        # "cold session": memo wiped, frame re-created from disk
        timeseries._STATS_MEMO.clear()
        second = timeseries.dispatch_stats(
            spark.read.parquet(src), "k", "ts"
        )
        assert calls["n"] == 1  # served from the sidecar, no probe job
        assert second == first
        # rewrite -> new part names -> new key -> re-probe
        spark.createDataFrame(
            rows[:30], "k string, ts timestamp_ntz, id long, v double"
        ).write.mode("overwrite").parquet(src)
        timeseries._STATS_MEMO.clear()
        third = timeseries.dispatch_stats(
            spark.read.parquet(src), "k", "ts"
        )
        assert calls["n"] == 2
        assert third[0] == 30
    finally:
        spark.conf.unset("spark.bfdb.dispatch.statsDir")


def test_dispatch_stats_key_distinguishes_wide_plans(spark, tmp_path):
    """Round 12 (ADVICE): the persist key hashed
    ``canonicalized().toString()``, which Spark truncates at
    ``spark.sql.debug.maxToStringFields`` (default 25) — two wide
    frames over the SAME files whose plans differ only past the
    truncation point collided onto one sidecar entry. The key now
    hashes the structural semanticHash + full schema JSON, so they
    must differ."""
    import datetime as dt

    from betfair_database_spark.operators.timeseries import (
        _stats_persist_key,
    )

    t0 = dt.datetime(2024, 6, 1)
    rows = [("k", t0, *range(40))]
    cols = "k string, ts timestamp_ntz, " + ", ".join(
        f"c{i} long" for i in range(40)
    )
    src = str(tmp_path / "wide")
    spark.createDataFrame(rows, cols).write.parquet(src)
    base = spark.read.parquet(src)
    # identical first 30 columns; they differ only in field #35+
    a = base.withColumn("c35", F.col("c35") + 1)
    b = base.withColumn("c36", F.col("c36") + 1)
    ka = _stats_persist_key(a, "k", "ts")
    kb = _stats_persist_key(b, "k", "ts")
    assert ka is not None and kb is not None
    assert ka != kb
    # and the key is stable for the same plan re-created
    assert (
        _stats_persist_key(
            spark.read.parquet(src).withColumn("c35", F.col("c35") + 1),
            "k",
            "ts",
        )
        == ka
    )


def test_dispatch_stats_sidecar_evicts_oldest(tmp_path):
    """The default-on sidecar cache is bounded: writes keep only the
    newest ``max_entries`` files by mtime (round-12 ADVICE: no size
    bound or eviction)."""
    import os
    import time

    from betfair_database_spark.operators.timeseries import (
        _stats_sidecar_read,
        _stats_sidecar_write,
    )

    d = str(tmp_path / "cache")
    for i in range(6):
        _stats_sidecar_write(d, f"k{i}", (i, 1, 1.0), max_entries=4)
        past = time.time() - (100 - i)
        os.utime(os.path.join(d, f"k{i}.json"), (past, past))
    names = sorted(p for p in os.listdir(d) if p.endswith(".json"))
    assert len(names) == 4
    assert "k0.json" not in names and "k1.json" not in names
    assert _stats_sidecar_read(d, "k5") == (5, 1, 1.0)
