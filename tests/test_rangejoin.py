"""Bucketized range joins vs the brute-force theta join, on data crafted to
exercise the bucket edges: intervals spanning multiple buckets, points on
exact bucket and interval boundaries, pairs sharing several buckets (the
exactly-once canonical-bucket guarantee), and empty results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from betfair_database_spark.operators import rangejoin


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def points(spark):
    # ids x positions: boundary values sit exactly on bucket multiples (10)
    data = [(i, p) for i, p in enumerate([0, 5, 9, 10, 15, 20, 29, 30, 42, 99])]
    return spark.createDataFrame(data, "p_id long, p long")


@pytest.fixture(scope="module")
def intervals(spark):
    data = [
        (0, 0, 9),     # single bucket
        (1, 5, 25),    # spans buckets 0..2
        (2, 10, 10),   # degenerate point-interval on a bucket edge
        (3, 28, 45),   # spans 2..4
        (4, 90, 120),  # tail, catches p=99
        (5, 200, 210), # matches nothing
    ]
    return spark.createDataFrame(data, "i_id long, s long, e long")


def _expected_pairs(points, intervals):
    pts = [(r.p_id, r.p) for r in points.collect()]
    ivs = [(r.i_id, r.s, r.e) for r in intervals.collect()]
    return sorted(
        (pid, iid) for pid, p in pts for iid, s, e in ivs if s <= p <= e
    )


def test_point_in_interval_matches_bruteforce(spark, points, intervals):
    got = rangejoin.point_in_interval_join(
        points, intervals, "p", "s", "e", width=10
    )
    assert _rows(got, ["p_id", "i_id"]) == _expected_pairs(points, intervals)
    # bucket helper columns must not leak
    assert set(got.columns) == {"p_id", "p", "i_id", "s", "e"}


def test_point_in_interval_extra_cond(spark, points, intervals):
    got = rangejoin.point_in_interval_join(
        points, intervals, "p", "s", "e", width=10,
        extra_cond=F.col("i_id") != 1,
    )
    exp = [t for t in _expected_pairs(points, intervals) if t[1] != 1]
    assert _rows(got, ["p_id", "i_id"]) == exp


def test_point_in_interval_empty(spark, points):
    none = points.sparkSession.createDataFrame(
        [(0, 1000, 2000)], "i_id long, s long, e long"
    )
    got = rangejoin.point_in_interval_join(points, none, "p", "s", "e", width=7)
    assert got.count() == 0


@pytest.mark.parametrize("width", [3, 10, 1000])
def test_overlap_join_exactly_once(spark, intervals, width):
    """Pairs sharing many buckets (width=3 splits [5,25] across 7 buckets)
    must still be emitted exactly once; width=1000 puts everything in one
    bucket and must equal the brute force too."""
    left = intervals.select(
        F.col("i_id").alias("a_id"), F.col("s").alias("a_s"), F.col("e").alias("a_e")
    )
    right = intervals.select(
        F.col("i_id").alias("b_id"), F.col("s").alias("b_s"), F.col("e").alias("b_e")
    )
    got = rangejoin.interval_overlap_join(
        left, right, "a_s", "a_e", "b_s", "b_e", width=width,
        extra_cond=F.col("a_id") < F.col("b_id"),
    )
    ivs = [(r.i_id, r.s, r.e) for r in intervals.collect()]
    exp = sorted(
        (a, b)
        for a, s1, e1 in ivs
        for b, s2, e2 in ivs
        if a < b and s1 <= e2 and s2 <= e1
    )
    assert _rows(got, ["a_id", "b_id"]) == exp


def test_overlap_join_negative_domain(spark):
    """floor-division bucketing (not int-truncation) keeps negatives correct:
    [-25,-15] and [-16,-5] overlap at -16..-15 across the -2/-1 bucket edge."""
    a = spark.createDataFrame([(0, -25, -15)], "a_id long, a_s long, a_e long")
    b = spark.createDataFrame(
        [(1, -16, -5), (2, -14, -1)], "b_id long, b_s long, b_e long"
    )
    got = rangejoin.interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", width=10
    )
    assert _rows(got, ["a_id", "b_id"]) == [(0, 1)]


# ---------------------------------------------------------------------------
# Property tests: random intervals/points vs the brute-force theta join
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_iv = st.tuples(st.integers(-50, 120), st.integers(0, 40)).map(
    lambda t: (t[0], t[0] + t[1])
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(-60, 140), min_size=0, max_size=25),
    st.lists(_iv, min_size=0, max_size=15),
    st.sampled_from([1, 7, 10, 64]),
)
def test_point_in_interval_property(spark, pts, ivs, width):
    points = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)] or [(None, None)], "p_id long, p long"
    ).where(F.col("p_id").isNotNull())
    intervals = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(ivs)] or [(None, None, None)],
        "i_id long, s long, e long",
    ).where(F.col("i_id").isNotNull())
    got = _rows(
        rangejoin.point_in_interval_join(points, intervals, "p", "s", "e", width),
        ["p_id", "i_id"],
    )
    want = sorted(
        (pi, ii)
        for pi, p in enumerate(pts)
        for ii, (s, e) in enumerate(ivs)
        if s <= p <= e
    )
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(_iv, min_size=0, max_size=12),
    st.lists(_iv, min_size=0, max_size=12),
    st.sampled_from([1, 9, 33]),
)
def test_overlap_property(spark, livs, rivs, width):
    left = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(livs)] or [(None, None, None)],
        "a_id long, a_s long, a_e long",
    ).where(F.col("a_id").isNotNull())
    right = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rivs)] or [(None, None, None)],
        "b_id long, b_s long, b_e long",
    ).where(F.col("b_id").isNotNull())
    got = _rows(
        rangejoin.interval_overlap_join(
            left, right, "a_s", "a_e", "b_s", "b_e", width
        ),
        ["a_id", "b_id"],
    )
    want = sorted(
        (ai, bi)
        for ai, (s1, e1) in enumerate(livs)
        for bi, (s2, e2) in enumerate(rivs)
        if s1 <= e2 and s2 <= e1
    )
    assert got == want


def test_merge_intervals_matches_python_reference(spark):
    """Randomized parity: island merging equals a sequential sweep."""
    import random

    from betfair_database_spark.operators import rangejoin

    rng = random.Random(20260815)
    rows = []
    for key in range(6):
        for i in range(rng.randint(0, 40)):
            s = rng.randint(0, 300)
            rows.append((key, len(rows), s, s + rng.randint(0, 25)))
    df = spark.createDataFrame(rows, "k int, id long, s long, e long")
    got = {
        (r["k"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in rangejoin.merge_intervals(
            df, key="k", start="s", end="e", order_tiebreak="id"
        ).collect()
    }
    # reference: sort per key, sweep, split where start > running max end
    want = set()
    bykey = {}
    for k, i, s, e in rows:
        bykey.setdefault(k, []).append((s, e, i))
    for k, ivs in bykey.items():
        ivs.sort()
        cur = None  # (start, end, n)
        for s, e, _ in ivs:
            if cur is None or s > cur[1]:
                if cur:
                    want.add((k, *cur))
                cur = (s, e, 1)
            else:
                cur = (cur[0], max(cur[1], e), cur[2] + 1)
        if cur:
            want.add((k, *cur))
    assert got == want


def test_merge_intervals_touching_merge_and_containment(spark):
    from betfair_database_spark.operators import rangejoin

    df = spark.createDataFrame(
        [
            ("u", 1, 0, 10),
            ("u", 2, 10, 20),  # touching -> merges
            ("u", 3, 2, 5),  # contained -> absorbed
            ("u", 4, 25, 30),  # separate island
        ],
        "k string, id long, s long, e long",
    )
    got = sorted(
        (r["island_start"], r["island_end"], r["n_intervals"])
        for r in rangejoin.merge_intervals(
            df, key="k", start="s", end="e", order_tiebreak="id"
        ).collect()
    )
    assert got == [(0, 20, 3), (25, 30, 1)]
