"""Nested-JSON → flat 37-column projections (reference: metadata.py:75-160).

Both transforms are pure ``select`` projections — the reference's
``_flatten_subdict`` camelCase key fusion (metadata.py:28-38) becomes column
aliasing (``eventType.id`` → ``eventTypeId``), which Catalyst prunes into the
JSON scan so only referenced fields are ever materialized.

Subtleties preserved:
  - catalogue rows leave ``marketSettledTime`` NULL — the catalogue's
    ``description.settledTime`` feeds only ``localMarketSettledTime``
    (metadata.py:94-98 vs const.py:44);
  - catalogue local times require BOTH event.timezone and event.openDate
    (the reference aborts all four fields on KeyError, metadata.py:88-102);
  - catalogue ``runners`` is NULL for an absent OR empty array
    (falsy pop, metadata.py:104-105) while definition ``runners`` is a plain
    length, 0 for empty (metadata.py:150);
  - definitions alias marketStartTime = marketTime (metadata.py:146-147).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from betfair_database_spark.functions.localtime import (
    local_datetime_string,
    local_day_of_week,
)
from betfair_database_spark.functions.racing import (
    is_racing,
    race_id_column,
)

def _NULL(dtype: str) -> Column:
    return F.lit(None).cast(dtype)


def _bool_to_int(c: Column) -> Column:
    """Booleans are stored 0/1 like SQLite (reference tests pin this)."""
    return c.cast("int")


def catalogue_to_flat(df: DataFrame) -> DataFrame:
    """Market-catalogue frame (schema.CATALOGUE_SCHEMA + path columns) →
    flat index columns + _raceIdCandidate."""
    d = F.col("description")
    ev = F.col("event")
    tz = ev["timezone"]
    # Reference computes local times only when event.timezone AND
    # event.openDate are both present (KeyError aborts all four fields).
    lt_gate = tz.isNotNull() & ev["openDate"].isNotNull()

    def lt(src: Column) -> Column:
        return F.when(lt_gate, local_datetime_string(src, tz))

    return df.select(
        F.col("marketId"),
        F.col("marketName"),
        F.col("marketStartTime"),
        _bool_to_int(d["persistenceEnabled"]).alias("persistenceEnabled"),
        _bool_to_int(d["bspMarket"]).alias("bspMarket"),
        d["marketTime"].alias("marketTime"),
        d["suspendTime"].alias("suspendTime"),
        d["bettingType"].alias("bettingType"),
        _bool_to_int(d["turnInPlayEnabled"]).alias("turnInPlayEnabled"),
        d["marketType"].alias("marketType"),
        _NULL('int').alias("numberOfWinners"),  # catalogue never carries it
        d["priceLadderDescription"]["type"].alias("priceLadderDescriptionType"),
        d["lineRangeInfo"]["marketUnit"].alias("lineRangeInfoMarketUnit"),
        d["eachWayDivisor"].alias("eachWayDivisor"),
        d["raceType"].alias("raceType"),
        F.when(F.size("runners") > 0, F.size("runners")).alias("runners"),
        F.col("eventType")["id"].alias("eventTypeId"),
        F.col("eventType")["name"].alias("eventTypeName"),
        F.col("competition")["id"].alias("competitionId"),
        F.col("competition")["name"].alias("competitionName"),
        ev["id"].alias("eventId"),
        ev["name"].alias("eventName"),
        ev["countryCode"].alias("eventCountryCode"),
        tz.alias("eventTimezone"),
        ev["venue"].alias("eventVenue"),
        ev["openDate"].alias("eventOpenDate"),
        _NULL('string').alias("marketSettledTime"),  # catalogue: local-time only
        F.when(lt_gate, local_day_of_week(F.col("marketStartTime"), tz)).alias(
            "localDayOfWeek"
        ),
        lt(F.col("marketStartTime")).alias("localMarketStartTime"),
        lt(ev["openDate"]).alias("localEventOpenDate"),
        lt(d["settledTime"]).alias("localMarketSettledTime"),
        F.when(
            is_racing(F.col("eventType")["id"]),
            race_id_column(
                F.col("eventType")["id"],
                ev["countryCode"],
                ev["venue"],
                F.col("marketStartTime"),
            ),
        ).alias("_raceIdCandidate"),
        F.col("marketMetadataFilePath"),
        F.col("marketDataFilePath"),
    )


def definition_to_flat(df: DataFrame) -> DataFrame:
    """Market-definition frame (schema.DEFINITION_SCHEMA + path columns) →
    flat index columns + _raceIdCandidate."""
    tz = F.col("timezone")

    def lt(src: Column) -> Column:
        return local_datetime_string(src, tz)

    return df.select(
        F.col("marketId"),
        F.col("name").alias("marketName"),
        F.col("marketTime").alias("marketStartTime"),  # alias (metadata.py:146-147)
        _bool_to_int(F.col("persistenceEnabled")).alias("persistenceEnabled"),
        _bool_to_int(F.col("bspMarket")).alias("bspMarket"),
        F.col("marketTime"),
        F.col("suspendTime"),
        F.col("bettingType"),
        _bool_to_int(F.col("turnInPlayEnabled")).alias("turnInPlayEnabled"),
        F.col("marketType"),
        F.col("numberOfWinners"),
        F.col("priceLadderDefinition")["type"].alias("priceLadderDescriptionType"),
        _NULL('string').alias("lineRangeInfoMarketUnit"),
        F.col("eachWayDivisor"),
        F.col("raceType"),
        F.when(F.col("runners").isNotNull(), F.size("runners")).alias("runners"),
        F.col("eventTypeId"),
        _NULL('string').alias("eventTypeName"),
        _NULL('string').alias("competitionId"),
        _NULL('string').alias("competitionName"),
        F.col("eventId"),
        F.col("eventName"),
        F.col("countryCode").alias("eventCountryCode"),
        tz.alias("eventTimezone"),
        F.col("venue").alias("eventVenue"),
        F.col("openDate").alias("eventOpenDate"),
        F.col("settledTime").alias("marketSettledTime"),
        local_day_of_week(F.col("marketTime"), tz).alias("localDayOfWeek"),
        lt(F.col("marketTime")).alias("localMarketStartTime"),
        lt(F.col("openDate")).alias("localEventOpenDate"),
        lt(F.col("settledTime")).alias("localMarketSettledTime"),
        F.when(
            is_racing(F.col("eventTypeId")),
            race_id_column(
                F.col("eventTypeId"),
                F.col("countryCode"),
                F.col("venue"),
                F.col("marketTime"),
            ),
        ).alias("_raceIdCandidate"),
        F.col("marketMetadataFilePath"),
        F.col("marketDataFilePath"),
    )
