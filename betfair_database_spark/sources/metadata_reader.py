"""Metadata-file parsing: catalogue vs definition dispatch + corrupt handling.

One whole-file text scan parses every ``<marketId>.json``; ``from_json``
against both explicit schemas dispatches on the discriminator (presence of
``numberOfWinners`` — reference market.py:66-68). Corrupt files (JSON parse
failures) surface as NULL parse results and are counted, matching the
reference's JSONDecodeError branch (processor.py:330-332, E1 in SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from betfair_database_spark.schema import CATALOGUE_SCHEMA, DEFINITION_SCHEMA


def read_metadata_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Parse metadata JSON files (one document per file, possibly multiline).

    Returns columns:
      path (posix), cat (CATALOGUE_SCHEMA struct), defn (DEFINITION_SCHEMA
      struct), is_definition (bool), corrupt (bool).
    """
    if not paths:
        return _empty(spark)
    raw = (
        spark.read.option("wholetext", "true")
        .text(paths)
        .select(
            F.regexp_replace(F.input_file_name(), "^file:/*", "/").alias("path"),
            F.col("value").alias("content"),
        )
    )
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


def _empty(spark: SparkSession) -> DataFrame:
    from pyspark.sql.types import (
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("path", StringType(), True),
            StructField("cat", CATALOGUE_SCHEMA, True),
            StructField("defn", DEFINITION_SCHEMA, True),
            StructField("is_definition", BooleanType(), True),
            StructField("corrupt", BooleanType(), True),
        ]
    )
    return spark.createDataFrame([], schema)
