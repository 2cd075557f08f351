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


def test_nameless_win_market_leaves_race_unenriched(spark):
    """A WIN racing market with NO name must not create a race lookup row:
    the reference's extract_race_metadata(metadata['marketName']) raises
    KeyError and skips the race, so raceId stays NULL for every market of
    that race (reference racing.py:119-136, 143-152)."""
    from betfair_database_spark.functions.racing import enrich_with_racing

    flat = spark.createDataFrame(
        [
            # race A: nameless WIN + a PLACE sibling → nobody enriched
            ("1.1", None, "WIN", "4339", "rA"),
            ("1.2", "To Be Placed", "PLACE", "4339", "rA"),
            # race B: named WIN → both enriched
            ("1.3", "R1 320m Mdn", "WIN", "4339", "rB"),
            ("1.4", "To Be Placed", "PLACE", "4339", "rB"),
        ],
        "marketId string, marketName string, marketType string,"
        " eventTypeId string, _raceIdCandidate string",
    )
    out = {r.marketId: r for r in enrich_with_racing(flat).collect()}
    assert out["1.1"].raceId is None and out["1.2"].raceId is None
    assert out["1.3"].raceId == "rB" and out["1.4"].raceId == "rB"
    assert out["1.4"].raceDistanceMeters == 320
