"""Racing regex golden tests (behavior spec: reference racing.py:24-72,
golden style mirroring reference tests/test_racing.py:17-76)."""

from __future__ import annotations

import pytest

M_PER_F = 201.168


CASES = [
    # (market name, race type, meters, furlongs)
    ("R1 320m Mdn", "Mdn", 320.0, 320.0 / M_PER_F),
    ("6f Mdn Claim", "Mdn Claim", 6 * M_PER_F, 6.0),
    ("2m Hcap Chs", "Hcap Chs", 16 * M_PER_F, 16.0),
    ("1m2f Stks", "Stks", 10 * M_PER_F, 10.0),
    ("5f Nov Stks", "Nov Stks", 5 * M_PER_F, 5.0),
    ("R9 1200m Hcap", "Hcap", 1200.0, 1200.0 / M_PER_F),
    # after distance-strip 'R5 480m' → 'R5 '; the type regex backtracks its
    # optional R\d+ prefix and captures 'R5' (same in Python re and Java regex)
    ("R5 480m", "R5", 480.0, 480.0 / M_PER_F),
    ("Mdn", "Mdn", None, None),
    ("To Be Placed", "To Be Placed", None, None),
    ("1m Mdn", "Mdn", 8 * M_PER_F, 8.0),
    ("2M 4f Hcap", "4f Hcap", 16 * M_PER_F, 16.0),  # first-match wins; f-part not adjacent
    ("", None, None, None),
]


@pytest.fixture(scope="module")
def extracted(spark):
    from pyspark.sql import functions as F

    from betfair_database_spark.functions.racing import race_feature_columns

    df = spark.createDataFrame([(c[0],) for c in CASES], ["marketName"])
    feats = race_feature_columns(F.col("marketName"))
    rows = df.select(
        "marketName",
        feats["raceTypeFromName"].alias("t"),
        feats["raceDistanceMeters"].alias("m"),
        feats["raceDistanceFurlongs"].alias("f"),
    ).collect()
    return {r.marketName: (r.t, r.m, r.f) for r in rows}


@pytest.mark.parametrize("name,rtype,meters,furlongs", CASES, ids=[c[0] or "<empty>" for c in CASES])
def test_race_feature_extraction(extracted, name, rtype, meters, furlongs):
    t, m, f = extracted[name]
    assert t == rtype
    if meters is None:
        assert m is None and f is None
    else:
        assert m == pytest.approx(meters)
        assert f == pytest.approx(furlongs)


def test_race_id_column(spark):
    from pyspark.sql import functions as F

    from betfair_database_spark.functions.racing import race_id_column

    df = spark.createDataFrame(
        [("7", "GB", "Ascot", "2023-08-02T15:10:00.000Z"), ("7", None, "Ascot", "t")],
        ["et", "cc", "v", "st"],
    )
    out = df.select(
        race_id_column(F.col("et"), F.col("cc"), F.col("v"), F.col("st")).alias("rid")
    ).collect()
    assert out[0].rid == "7,GB,Ascot,2023-08-02T15:10:00.000Z"
    assert out[1].rid is None  # any missing component → no race id
