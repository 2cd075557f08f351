"""Explicit StructTypes for the three semi-structured input shapes.

Schema-on-read with explicit schemas (never inference) so that a 100 TB scan
needs no sampling pass and unknown keys are dropped for free, matching the
reference's "unknown keys dropped, missing keys NULL" semantics
(reference: market.py:110-111). Shapes documented in FIXTURES.md §1-§3 and
reference samples/*.yaml.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


def _b(name: str) -> StructField:
    return StructField(name, BooleanType(), True)


def _d(name: str) -> StructField:
    return StructField(name, DoubleType(), True)


def _i(name: str) -> StructField:
    return StructField(name, IntegerType(), True)


# --- market catalogue (self-recorded metadata; FIXTURES.md §1) --------------

CATALOGUE_DESCRIPTION = StructType(
    [
        _b("persistenceEnabled"),
        _b("bspMarket"),
        _s("marketTime"),
        _s("suspendTime"),
        _s("settledTime"),
        _s("bettingType"),
        _b("turnInPlayEnabled"),
        _s("marketType"),
        _s("regulator"),
        _d("marketBaseRate"),
        _b("discountAllowed"),
        _s("wallet"),
        _s("rules"),
        _b("rulesHasDate"),
        _d("eachWayDivisor"),
        _s("raceType"),
        StructField(
            "lineRangeInfo",
            StructType(
                [
                    _d("maxUnitValue"),
                    _d("minUnitValue"),
                    _d("interval"),
                    _s("marketUnit"),
                ]
            ),
            True,
        ),
        StructField(
            "priceLadderDescription", StructType([_s("type")]), True
        ),
    ]
)

CATALOGUE_RUNNER = StructType(
    [
        StructField("selectionId", LongType(), True),
        _s("runnerName"),
        _d("handicap"),
        _i("sortPriority"),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

CATALOGUE_SCHEMA = StructType(
    [
        _s("marketId"),
        _s("marketName"),
        _s("marketStartTime"),
        _d("totalMatched"),
        StructField("description", CATALOGUE_DESCRIPTION, True),
        StructField("runners", ArrayType(CATALOGUE_RUNNER), True),
        StructField("eventType", StructType([_s("id"), _s("name")]), True),
        StructField("competition", StructType([_s("id"), _s("name")]), True),
        StructField(
            "event",
            StructType(
                [
                    _s("id"),
                    _s("name"),
                    _s("countryCode"),
                    _s("timezone"),
                    _s("venue"),
                    _s("openDate"),
                ]
            ),
            True,
        ),
    ]
)

# --- market definition (official/recorded stream metadata; FIXTURES.md §2) --

DEFINITION_RUNNER = StructType(
    [
        _s("status"),
        _i("sortPriority"),
        StructField("id", LongType(), True),
        _s("name"),
        _d("bsp"),
        _d("adjustmentFactor"),
    ]
)

DEFINITION_SCHEMA = StructType(
    [
        _s("marketId"),  # injected by the extractor for stream files
        _b("bspMarket"),
        _b("turnInPlayEnabled"),
        _b("persistenceEnabled"),
        _b("bspReconciled"),
        _b("complete"),
        _b("inPlay"),
        _b("crossMatching"),
        _b("runnersVoidable"),
        _b("discountAllowed"),
        _d("marketBaseRate"),
        _s("eventId"),
        _s("eventTypeId"),
        _i("numberOfWinners"),  # discriminator field (reference market.py:66-68)
        _s("bettingType"),
        _s("marketType"),
        _s("status"),
        _s("marketTime"),
        _s("suspendTime"),
        _s("settledTime"),
        _i("numberOfActiveRunners"),
        _i("betDelay"),
        StructField("runners", ArrayType(DEFINITION_RUNNER), True),
        StructField("regulators", ArrayType(StringType()), True),
        _s("countryCode"),
        _s("venue"),
        _s("timezone"),
        _s("openDate"),
        StructField("version", LongType(), True),
        _s("name"),
        _s("eventName"),
        _s("raceType"),
        _d("eachWayDivisor"),
        _d("lineMaxUnit"),
        _d("lineMinUnit"),
        _d("lineInterval"),
        StructField("priceLadderDefinition", StructType([_s("type")]), True),
    ]
)

# --- stream data file lines (mcm NDJSON; FIXTURES.md §3) ---------------------

MCM_SCHEMA = StructType(
    [
        _s("op"),
        _s("clk"),
        StructField("pt", LongType(), True),  # epoch millis
        StructField(
            "mc",
            ArrayType(
                StructType(
                    [
                        _s("id"),
                        StructField("marketDefinition", DEFINITION_SCHEMA, True),
                        StructField(
                            "rc",
                            ArrayType(
                                StructType(
                                    [
                                        _d("ltp"),
                                        StructField("id", LongType(), True),
                                    ]
                                )
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
    ]
)
