"""Deterministic Betfair-shaped fixture corpus builder.

Shapes follow FIXTURES.md (derived from the reference's documented formats:
market catalogue, market definition, mcm stream NDJSON, bulk metadata.json).
All content is hand-written here — nothing is copied from the reference repo.

Corpus layout (13 market stems; see expectations in EXPECTED):
  1.222000001        cricket LINE catalogue + uncompressed snapshot data
  1.222000002        greyhound WIN catalogue "R1 320m Mdn" (racing build side)
  1.222000003        greyhound PLACE catalogue, same race (inherits features)
  1.222000004.bz2    horse stream, no json → derived definition (2m Hcap Chs)
  1.222000005.json/.gz  horse definition metadata + gz stream
  1.222000006.zip    greyhound stream in zip, no json → derived via zip codec
  1.222000007        corrupt metadata json + data file
  1.222000008        catalogue json without data file
  1.222000009        data file with no marketDefinition line
  1.222000010        data file whose only definition line is corrupt JSON
  bulk/1.222000011   catalogue entry in bulk metadata.json + data file
  bulk/1.222000012   definition entry in bulk metadata.json + data file
  (bulk entry 1.222000013 has no data file; one invalid {} entry)
  1.222000014        EACH_WAY catalogue with eachWayDivisor + data file
"""

from __future__ import annotations

import bz2
import gzip
import json
import zipfile
from pathlib import Path


def _cat(
    market_id: str,
    name: str,
    start: str,
    *,
    event_type=("4", "Cricket"),
    market_type="MATCH_ODDS",
    venue=None,
    country=None,
    timezone="Europe/London",
    open_date="2023-07-27T17:00:00.000Z",
    runners=2,
    betting_type="ODDS",
    bsp=False,
    each_way_divisor=None,
    line_range=None,
    settled=None,
    competition=("12596293", "Major League Cricket"),
) -> dict:
    description = {
        "persistenceEnabled": True,
        "bspMarket": bsp,
        "marketTime": start,
        "suspendTime": start,
        "bettingType": betting_type,
        "turnInPlayEnabled": True,
        "marketType": market_type,
        "regulator": "GIBRALTAR REGULATOR",
        "marketBaseRate": 2.0,
        "discountAllowed": False,
        "priceLadderDescription": {"type": "CLASSIC"},
    }
    if each_way_divisor is not None:
        description["eachWayDivisor"] = each_way_divisor
    if line_range is not None:
        description["lineRangeInfo"] = line_range
    if settled is not None:
        description["settledTime"] = settled
    event = {
        "id": "31000001",
        "name": "Fixture Event",
        "timezone": timezone,
        "openDate": open_date,
    }
    if venue is not None:
        event["venue"] = venue
    if country is not None:
        event["countryCode"] = country
    return {
        "marketId": market_id,
        "marketName": name,
        "marketStartTime": start,
        "totalMatched": 1234.56,
        "description": description,
        "runners": [
            {
                "selectionId": 10000 + i,
                "runnerName": f"Runner {i}",
                "handicap": 0.0,
                "sortPriority": i + 1,
                "metadata": {"runnerId": str(10000 + i)},
            }
            for i in range(runners)
        ],
        "eventType": {"id": event_type[0], "name": event_type[1]},
        "competition": {"id": competition[0], "name": competition[1]},
        "event": event,
    }


def _defn(
    market_id: str,
    name: str,
    market_time: str,
    *,
    event_type_id="7",
    market_type="WIN",
    venue=None,
    country=None,
    timezone="Europe/London",
    open_date="2023-08-01T10:00:00.000Z",
    runners=8,
    winners=1,
    settled=None,
    status="OPEN",
    version=1,
    event_id="32000001",
) -> dict:
    d = {
        "bspMarket": True,
        "turnInPlayEnabled": True,
        "persistenceEnabled": True,
        "bspReconciled": False,
        "complete": True,
        "inPlay": False,
        "crossMatching": False,
        "runnersVoidable": False,
        "discountAllowed": True,
        "marketBaseRate": 5.0,
        "eventId": event_id,
        "eventTypeId": event_type_id,
        "numberOfWinners": winners,
        "bettingType": "ODDS",
        "marketType": market_type,
        "status": status,
        "marketTime": market_time,
        "suspendTime": market_time,
        "numberOfActiveRunners": runners,
        "betDelay": 0,
        "runners": [
            {"status": "ACTIVE", "sortPriority": i + 1, "id": 20000 + i}
            for i in range(runners)
        ],
        "regulators": ["MR_INT"],
        "timezone": timezone,
        "openDate": open_date,
        "version": version,
        "name": name,
        "eventName": "Fixture Races",
    }
    if market_id is not None:
        d["marketId"] = market_id
    if venue is not None:
        d["venue"] = venue
    if country is not None:
        d["countryCode"] = country
    if settled is not None:
        d["settledTime"] = settled
    return d


def _mcm_line(market_id: str, pt: int, defn: dict | None = None, rc=None) -> str:
    mc: dict = {"id": market_id}
    if defn is not None:
        mc["marketDefinition"] = defn
    if rc is not None:
        mc["rc"] = rc
    return json.dumps({"op": "mcm", "clk": str(pt), "pt": pt, "mc": [mc]}, separators=(",", ":"))


def _snapshot_line(market_id: str, pt: int) -> str:
    return json.dumps(
        {
            "marketId": market_id,
            "status": "OPEN",
            "betDelay": 0,
            "totalMatched": 100.0 + pt,
            "runners": [{"selectionId": 10000, "lastPriceTraded": 2.5}],
        },
        separators=(",", ":"),
    )


LONDON_SUMMER_START = "2023-07-28T12:35:00.000Z"  # Friday, BST (+01:00)
RACE_START = "2023-08-02T14:30:00.000Z"  # Wednesday, BST


def build_corpus(root: Path) -> None:
    root.mkdir(parents=True, exist_ok=True)

    # 1: cricket LINE catalogue + uncompressed snapshot data (no definitions)
    cat1 = _cat(
        "1.222000001",
        "1st Innings 6 Overs Line",
        LONDON_SUMMER_START,
        betting_type="LINE",
        line_range={
            "maxUnitValue": 100.0,
            "minUnitValue": 1.0,
            "interval": 1.0,
            "marketUnit": "Runs",
        },
    )
    (root / "1.222000001.json").write_text(json.dumps(cat1), encoding="utf-8")
    (root / "1.222000001").write_text(
        "\n".join(_snapshot_line("1.222000001", i) for i in range(3)), encoding="utf-8"
    )

    # 2: greyhound WIN catalogue (racing build side)
    cat2 = _cat(
        "1.222000002",
        "R1 320m Mdn",
        RACE_START,
        event_type=("4339", "Greyhound Racing"),
        market_type="WIN",
        venue="Sheffield",
        country="GB",
        runners=6,
        bsp=True,
        competition=(None, None),
    )
    cat2.pop("competition")
    (root / "1.222000002.json").write_text(json.dumps(cat2), encoding="utf-8")
    (root / "1.222000002").write_text(
        _mcm_line("1.222000002", 1690984800000), encoding="utf-8"
    )

    # 3: greyhound PLACE catalogue, same race → inherits WIN features
    cat3 = _cat(
        "1.222000003",
        "To Be Placed",
        RACE_START,
        event_type=("4339", "Greyhound Racing"),
        market_type="PLACE",
        venue="Sheffield",
        country="GB",
        runners=6,
        competition=(None, None),
    )
    cat3.pop("competition")
    (root / "1.222000003.json").write_text(json.dumps(cat3), encoding="utf-8")
    (root / "1.222000003").write_text(
        _snapshot_line("1.222000003", 1), encoding="utf-8"
    )

    # 4: horse bz2 stream without json → derived definition; last one wins
    d4_first = _defn(
        None,
        "2m Hcap Chs",
        "2023-08-02T15:10:00.000Z",
        venue="Ascot",
        country="GB",
        runners=10,
        version=1,
    )
    d4_last = _defn(
        None,
        "2m Hcap Chs",
        "2023-08-02T15:10:00.000Z",
        venue="Ascot",
        country="GB",
        runners=9,
        version=2,
        status="CLOSED",
        settled="2023-08-02T15:20:00.000Z",
    )
    lines4 = [
        _mcm_line("1.222000004", 1690988000000, d4_first),
        _mcm_line("1.222000004", 1690988100000, None, rc=[{"ltp": 3.5, "id": 20001}]),
        _mcm_line("1.222000004", 1690988200000, d4_last),
    ]
    (root / "1.222000004.bz2").write_bytes(bz2.compress("\n".join(lines4).encode()))

    # 5: horse definition metadata file + gz stream
    d5 = _defn(
        "1.222000005",
        "1m2f Stks",
        "2023-08-02T16:00:00.000Z",
        venue="Ascot",
        country="GB",
        runners=7,
        version=3,
    )
    (root / "1.222000005.json").write_text(json.dumps(d5), encoding="utf-8")
    lines5 = [
        _mcm_line("1.222000005", 1690991000000, d5),
        _mcm_line("1.222000005", 1690991100000, None, rc=[{"ltp": 2.0, "id": 20000}]),
    ]
    (root / "1.222000005.gz").write_bytes(gzip.compress("\n".join(lines5).encode()))

    # 6: greyhound zip stream without json → derived via the zip codec
    d6 = _defn(
        None,
        "R4 480m Or",
        "2023-08-02T18:00:00.000Z",
        event_type_id="4339",
        venue="Romford",
        country="GB",
        runners=6,
        winners=1,
    )
    buf = Path(root / "1.222000006.zip")
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("1.222000006", _mcm_line("1.222000006", 1690999000000, d6))

    # 7: corrupt metadata json + data file
    (root / "1.222000007.json").write_text("{not valid json", encoding="utf-8")
    (root / "1.222000007").write_text(
        _snapshot_line("1.222000007", 1), encoding="utf-8"
    )

    # 8: catalogue without data file
    cat8 = _cat("1.222000008", "Orphan Market", LONDON_SUMMER_START)
    (root / "1.222000008.json").write_text(json.dumps(cat8), encoding="utf-8")

    # 9: data file with no marketDefinition anywhere
    (root / "1.222000009").write_text(
        "\n".join(_snapshot_line("1.222000009", i) for i in range(2)), encoding="utf-8"
    )

    # 10: data file whose only definition line is corrupt JSON
    (root / "1.222000010").write_text(
        '{"op":"mcm","pt":1,"mc":[{"id":"1.222000010","marketDefinition":{broken',
        encoding="utf-8",
    )

    # bulk: metadata.json with catalogue + definition + invalid + missing-data
    bulk_dir = root / "bulk"
    bulk_dir.mkdir(exist_ok=True)
    cat11 = _cat(
        "1.222000011",
        "Match Odds",
        "2023-08-03T19:00:00.000Z",
        event_type=("1", "Soccer"),
        open_date="2023-08-03T18:00:00.000Z",
        runners=3,
    )
    d12 = _defn(
        "1.222000012",
        "5f Nov Stks",
        "2023-08-03T14:00:00.000Z",
        venue="York",
        country="GB",
        runners=5,
    )
    cat13 = _cat("1.222000013", "Ghost Market", LONDON_SUMMER_START)
    # duplicate marketId: a stale entry BEFORE cat11 — the reference's dict
    # overwrite keeps the LAST entry per marketId (processor.py:227-231), so
    # the indexed row for 1.222000011 must come from cat11, not this one.
    cat11_stale = _cat(
        "1.222000011",
        "Stale Duplicate Name",
        "2023-08-03T19:00:00.000Z",
        event_type=("2", "Tennis"),
        open_date="2023-08-03T18:00:00.000Z",
        runners=3,
    )
    bulk = [cat11_stale, cat11, d12, {}, cat13]
    (bulk_dir / "metadata.json").write_text(json.dumps(bulk), encoding="utf-8")
    (bulk_dir / "1.222000011").write_text(
        _snapshot_line("1.222000011", 1), encoding="utf-8"
    )
    (bulk_dir / "1.222000012").write_text(
        _mcm_line("1.222000012", 1691000000000, d12), encoding="utf-8"
    )

    # 14: EACH_WAY catalogue with eachWayDivisor
    cat14 = _cat(
        "1.222000014",
        "Each Way Market",
        "2023-12-01T12:00:00.000Z",  # winter: +00:00
        event_type=("7", "Horse Racing"),
        market_type="EACH_WAY",
        venue="Kempton",
        country="GB",
        runners=12,
        each_way_divisor=5.0,
        open_date="2023-12-01T08:00:00.000Z",
    )
    (root / "1.222000014.json").write_text(json.dumps(cat14), encoding="utf-8")
    (root / "1.222000014").write_text(
        _snapshot_line("1.222000014", 1), encoding="utf-8"
    )


# Expected post-index facts used across tests
EXPECTED = {
    "rows": 9,
    "total_markets": 13,
    "markets_without_data": 1,  # 1.222000008
    "markets_without_metadata": 1,  # 1.222000009
    "corrupt_files": 2,  # 1.222000007.json, 1.222000010
    "indexed_market_ids": {
        "1.222000001",
        "1.222000002",
        "1.222000003",
        "1.222000004",
        "1.222000005",
        "1.222000006",
        "1.222000011",
        "1.222000012",
        "1.222000014",
    },
}
