"""Randomized parity test: the pure-column racing extraction must match an
independent Python implementation of the reference algorithm
(reference racing.py:24-72 — findall for the first non-empty distance tuple,
unit inference, token strip, type regex) on hundreds of generated names."""

from __future__ import annotations

import random
import re

import pytest

METERS_PER_FURLONG = 201.168
FURLONGS_PER_MILE = 8

_DIST_RE = re.compile(r"(?:(\d*)[Mm])?(?:(\d*)f)?")
_TYPE_RE = re.compile(r"(?:R\d+)?(?:\s+)?(.*\S)")


def _digits_or_zero(s: str) -> float:
    return float(s) if s else 0.0


def spec_extract(market_name: str) -> tuple[str | None, float | None, float | None]:
    """Oracle for the documented algorithm (reference racing.py:24-72):
    scan every position with the optional-distance regex, take the first
    tuple where a digit group captured, infer units (furlongs when an 'f'
    part exists or the m-value is a small mile count), strip the matched
    tokens everywhere, then pull the type with the R-prefix-skipping regex.
    Written as a test oracle — structured differently from both the Spark
    implementation and the reference."""
    meters = furlongs = None
    first_hit = None
    for candidate in _DIST_RE.findall(market_name):
        if candidate[0] or candidate[1]:
            first_hit = candidate
            break
    if first_hit is not None:
        m_digits, f_digits = first_hit
        m_value = _digits_or_zero(m_digits)
        f_value = _digits_or_zero(f_digits)
        imperial = bool(f_value) or m_value < 20
        furlongs = (
            m_value * FURLONGS_PER_MILE + f_value
            if imperial
            else m_value / METERS_PER_FURLONG
        )
        meters = furlongs * METERS_PER_FURLONG if imperial else m_value
        stripped = market_name
        if m_value > 0:
            stripped = stripped.replace(m_digits + "m", "").replace(m_digits + "M", "")
        if f_value > 0:
            stripped = stripped.replace(f_digits + "f", "")
        market_name = stripped
    type_match = _TYPE_RE.search(market_name)
    race_type = type_match.group(1) if type_match else None
    return race_type, meters, furlongs


def _gen_names(n: int = 300, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    words = ["Mdn", "Hcap", "Stks", "Nov", "Chs", "Or", "A1", "Claim", "Trophy", "Plate"]
    out = []
    for _ in range(n):
        parts = []
        if rng.random() < 0.4:
            parts.append(f"R{rng.randint(1, 12)}")
        r = rng.random()
        if r < 0.25:
            parts.append(f"{rng.randint(200, 1200)}m")
        elif r < 0.45:
            parts.append(f"{rng.randint(1, 9)}f")
        elif r < 0.6:
            parts.append(f"{rng.randint(1, 3)}m{rng.randint(0, 7)}f")
        elif r < 0.7:
            parts.append(f"{rng.randint(1, 4)}M")
        parts.extend(rng.sample(words, rng.randint(0, 2)))
        name = " ".join(parts)
        if rng.random() < 0.1:
            name = name.replace(" ", "  ", 1)
        out.append(name)
    out.extend(["", "m", "f", "Mf", "0m", "20m", "19m", "1mf", "12f 300m", "m2f Go"])
    return out


@pytest.mark.parametrize("chunk", [0])
def test_random_names_match_spec(spark, chunk):
    from pyspark.sql import functions as F

    from betfair_database_spark.functions.racing import race_feature_columns

    names = _gen_names()
    df = spark.createDataFrame([(x,) for x in names], ["marketName"])
    feats = race_feature_columns(F.col("marketName"))
    rows = df.select(
        "marketName",
        feats["raceTypeFromName"].alias("t"),
        feats["raceDistanceMeters"].alias("m"),
        feats["raceDistanceFurlongs"].alias("f"),
    ).collect()
    mismatches = []
    got_by_name: dict[str, list] = {}
    for r in rows:
        got_by_name.setdefault(r.marketName, []).append((r.t, r.m, r.f))
    for name in names:
        want = spec_extract(name)
        got = got_by_name[name].pop(0)
        ok = got[0] == want[0]
        for g, w in zip(got[1:], want[1:]):
            ok = ok and ((g is None) == (w is None)) and (
                g is None or abs(g - w) < 1e-9
            )
        if not ok:
            mismatches.append((name, want, got))
    assert not mismatches, mismatches[:10]
