"""UTF-8 round-trip (the reference pins UTF-8 handling in test_market.py):
non-ASCII market names, venues, and runner names must survive index → select
→ CSV export, and racing extraction must handle non-ASCII context."""

from __future__ import annotations

import csv
import json


def test_unicode_round_trip(spark, tmp_path):
    from betfair_database_spark.database import BetfairDatabase
    from tests.corpus import _cat, _mcm_line

    root = tmp_path / "udb"
    root.mkdir()
    cat = _cat(
        "1.555000001",
        "Ñandú Ação 320m Mdn—Großes Rennen",
        "2023-08-02T14:30:00.000Z",
        event_type=("4339", "Corrida de Galgos"),
        market_type="WIN",
        venue="São Paulo",
        country="BR",
        timezone="America/Sao_Paulo",
        runners=3,
    )
    cat["runners"][0]["runnerName"] = "Быстрый 犬"
    (root / "1.555000001.json").write_text(
        json.dumps(cat, ensure_ascii=False), encoding="utf-8"
    )
    (root / "1.555000001").write_text(
        _mcm_line("1.555000001", 1690984800000), encoding="utf-8"
    )

    db = BetfairDatabase(root, spark=spark)
    assert db.index() == 1
    row = db.select(
        ["marketName", "eventVenue", "eventTypeName", "raceId",
         "raceTypeFromName", "raceDistanceMeters", "localMarketStartTime"]
    )[0]
    assert row["marketName"] == "Ñandú Ação 320m Mdn—Großes Rennen"
    assert row["eventVenue"] == "São Paulo"
    assert row["eventTypeName"] == "Corrida de Galgos"
    assert row["raceId"] == "4339,BR,São Paulo,2023-08-02T14:30:00.000Z"
    # distance parsed out of the unicode name; type keeps the non-ASCII tail
    assert row["raceDistanceMeters"] == 320.0
    assert row["raceTypeFromName"] == "Ñandú Ação  Mdn—Großes Rennen"
    assert row["localMarketStartTime"] == "2023-08-02 11:30:00-03:00"

    # unicode WHERE literal through the dialect passthrough
    hits = db.select(["marketId"], where="eventVenue = 'São Paulo'")
    assert len(hits) == 1

    dest = db.export(tmp_path)
    with open(dest, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["marketName"] == "Ñandú Ação 320m Mdn—Großes Rennen"
