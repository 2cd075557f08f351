"""Metadata-file parsing: catalogue vs definition dispatch + corrupt handling.

One whole-file text scan parses every ``<marketId>.json``; ``from_json``
against both explicit schemas dispatches on the discriminator (presence of
``numberOfWinners`` — reference market.py:66-68). Corrupt files (JSON parse
failures) surface as NULL parse results and are counted, matching the
reference's JSONDecodeError branch (processor.py:330-332, E1 in SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from betfair_database_spark.schema import CATALOGUE_SCHEMA, DEFINITION_SCHEMA


def parse_metadata_content(raw: DataFrame) -> DataFrame:
    """Parse metadata JSON documents given as (path, content) rows.

    Returns columns:
      path (posix), cat (CATALOGUE_SCHEMA struct), defn (DEFINITION_SCHEMA
      struct), is_definition (bool), corrupt (bool).
    """
    cat = F.from_json("content", CATALOGUE_SCHEMA)
    defn = F.from_json("content", DEFINITION_SCHEMA)
    parsed = raw.select(
        "path",
        cat.alias("cat"),
        defn.alias("defn"),
    )
    # from_json is PERMISSIVE: unparseable JSON → NULL struct. A definition
    # is identified by a non-null discriminator; a catalogue by a parsed
    # struct with a marketId. Anything else is corrupt.
    is_definition = F.col("defn")["numberOfWinners"].isNotNull()
    corrupt = F.col("cat").isNull() | (
        F.col("cat")["marketId"].isNull() & F.col("defn")["marketId"].isNull()
    )
    return parsed.select(
        "path",
        "cat",
        "defn",
        is_definition.alias("is_definition"),
        corrupt.alias("corrupt"),
    )
