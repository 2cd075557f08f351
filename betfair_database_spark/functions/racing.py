"""Racing feature extraction and enrichment (reference: racing.py:1-154).

Semantics reproduced:

``extract_race_metadata`` (racing.py:24-72) scans a market name like
``"R1 320m Mdn"`` / ``"6f Mdn Claim"`` for the *first* position where a
distance token matches ``(?:(\\d*)[Mm])?(?:(\\d*)f)?`` with at least one
captured digit group non-empty. Unit inference: furlongs when an 'f' part is
present or the m-value is below 20 (then it means miles); otherwise meters.
Constants: 201.168 m/furlong, 8 furlongs/mile. The matched distance tokens
are removed from the name before the race type is extracted with
``(?:R\\d+)?\\s*(.*\\S)``.

The findall-based "first tuple with a non-empty digit group" is equivalent to
the first (leftmost) match of the alternation
``(\\d+)[Mm](\\d*)f | (\\d+)[Mm] | (\\d+)f`` — positions where ``[Mm]``/``f``
match with empty digits yield ('','') tuples which the reference skips. This
lets the whole extraction stay in built-in regexp/when expressions
(whole-stage codegen) instead of a Python UDF.

``RacingDataProcessor`` (racing.py:78-154) is a two-pass dict build/probe in
the reference; here it is a build-side DataFrame (WIN racing markets) and a
broadcast left-outer join — features of the WIN market are inherited by every
market of the same race, and ``raceId`` is populated only on a successful
match (racing.py:148-153).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

METERS_PER_FURLONG = 201.168
FURLONGS_PER_MILE = 8

# First-match equivalent of the reference's findall scan (see module docstring)
_DIST = r"(\d+)[Mm](\d*)f|(\d+)[Mm]|(\d+)f"
_TYPE = r"(?:R\d+)?\s*(.*\S)"

RACING_EVENT_TYPE_IDS = ("7", "4339")  # horse racing, greyhound racing


def race_feature_columns(name: Column) -> dict[str, Column]:
    """Columns for raceTypeFromName / raceDistanceMeters / raceDistanceFurlongs."""
    full = F.regexp_extract(name, _DIST, 0)
    g1 = F.regexp_extract(name, _DIST, 1)  # digits before [Mm] (combined alt)
    g2 = F.regexp_extract(name, _DIST, 2)  # digits before f (combined alt)
    g3 = F.regexp_extract(name, _DIST, 3)  # digits before [Mm] (solo alt)
    g4 = F.regexp_extract(name, _DIST, 4)  # digits before f (solo alt)

    matched = name.isNotNull() & (full != "")
    m_str = F.when(g1 != "", g1).when(g3 != "", g3)
    f_str = F.when(g1 != "", g2).when(g4 != "", g4)  # '' allowed: '1mf' → f=0
    m_val = F.coalesce(F.nullif(m_str, F.lit("")).cast("double"), F.lit(0.0))
    f_val = F.coalesce(F.nullif(f_str, F.lit("")).cast("double"), F.lit(0.0))

    imperial = (f_val > 0) | (m_val < 20)
    furlongs = F.when(
        matched,
        F.when(imperial, m_val * FURLONGS_PER_MILE + f_val).otherwise(
            m_val / METERS_PER_FURLONG
        ),
    )
    meters = F.when(
        matched,
        F.when(imperial, (m_val * FURLONGS_PER_MILE + f_val) * METERS_PER_FURLONG)
        .otherwise(m_val),
    )

    # Strip matched distance tokens (all occurrences) before type extraction,
    # mirroring str.replace of '<digits>m', '<digits>M', '<digits>f'
    # (racing.py:57-61).
    stripped = F.when(
        matched & (m_val > 0),
        F.replace(
            F.replace(name, F.concat(m_str, F.lit("m")), F.lit("")),
            F.concat(m_str, F.lit("M")),
            F.lit(""),
        ),
    ).otherwise(name)
    stripped = F.when(
        matched & (f_val > 0),
        F.replace(stripped, F.concat(f_str, F.lit("f")), F.lit("")),
    ).otherwise(stripped)

    race_type = F.nullif(F.regexp_extract(stripped, _TYPE, 1), F.lit(""))

    return {
        "raceTypeFromName": race_type,
        "raceDistanceMeters": meters,
        "raceDistanceFurlongs": furlongs,
    }


def race_id_column(
    event_type_id: Column, country_code: Column, venue: Column, start_time: Column
) -> Column:
    """Composite race key 'etId,cc,venue,startTime' (racing.py:86-113).

    NULL when any component is missing — the reference raises KeyError inside
    make_race_id and treats the market as having no race id.
    """
    all_present = (
        event_type_id.isNotNull()
        & country_code.isNotNull()
        & venue.isNotNull()
        & start_time.isNotNull()
    )
    return F.when(
        all_present, F.concat_ws(",", event_type_id, country_code, venue, start_time)
    )


def is_racing(event_type_id: Column) -> Column:
    """Racing gate (reference market.py:20-23,70-85); False/NULL-safe."""
    return event_type_id.isin(*RACING_EVENT_TYPE_IDS)


def enrich_with_racing(flat: DataFrame) -> DataFrame:
    """Apply the two-pass build/probe racing enrichment to a flattened frame.

    ``flat`` must carry columns marketId, marketName, marketType, eventTypeId
    and a pre-computed ``_raceIdCandidate`` column. Adds the four injected
    racing columns (raceId, raceTypeFromName, raceDistanceMeters,
    raceDistanceFurlongs), NULL for non-racing / unmatched markets.

    Build side: WIN racing markets keyed by race id — tiny relative to the
    probe side, hence an explicit broadcast hash left-outer join (the same
    shape Catalyst would pick, made deterministic). One WIN market per race
    is expected; ties resolve deterministically via max(marketId) where the
    reference's dict would keep the last-processed one (racing.py:124-133).
    """
    feats = race_feature_columns(F.col("marketName"))
    lookup = (
        flat.where(
            is_racing(F.col("eventTypeId"))
            & (F.col("marketType") == "WIN")
            & F.col("_raceIdCandidate").isNotNull()
            # a WIN market with no name contributes NO lookup row — the
            # reference's extract_race_metadata(metadata["marketName"])
            # KeyError skips the race, leaving raceId NULL for every market
            # of that race (racing.py:119-136)
            & F.col("marketName").isNotNull()
        )
        .select(
            F.col("_raceIdCandidate").alias("raceId"),
            F.col("marketId").alias("_winMarketId"),
            feats["raceTypeFromName"].alias("raceTypeFromName"),
            feats["raceDistanceMeters"].alias("raceDistanceMeters"),
            feats["raceDistanceFurlongs"].alias("raceDistanceFurlongs"),
        )
        .groupBy("raceId")
        .agg(
            F.max_by(
                F.struct("raceTypeFromName", "raceDistanceMeters", "raceDistanceFurlongs"),
                F.col("_winMarketId"),
            ).alias("_feats")
        )
        .select("raceId", "_feats.*")
    )
    joined = flat.join(
        F.broadcast(lookup),
        flat["_raceIdCandidate"] == lookup["raceId"],
        "left",
    )
    return joined.drop("_raceIdCandidate")
