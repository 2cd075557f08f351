"""Bulk ``metadata.json`` parsing (reference: processor.py:195-258).

A bulk file is a JSON *array* of market-metadata documents covering data
files in its own directory. Parsed in one whole-file scan; elements explode
into per-market rows. Edge cases (reference tests/test_database.py:384-455):
non-list top level → file skipped; elements without a usable marketId →
counted invalid; entries whose data file is absent → logged misses (they are
excluded by the downstream inner join on the pairing key).

Bulk entries take precedence over sibling ``<marketId>.json`` files because
the reference processes them first and pops the data file from the pairing
dict (processor.py:195-205,243-252).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from betfair_database_spark.schema import CATALOGUE_SCHEMA, DEFINITION_SCHEMA


def parse_bulk_content(raw: DataFrame) -> DataFrame:
    """Parse bulk metadata documents given as (path, content) rows into
    per-market rows.

    Returns: bulk_path, stem (parent_dir/marketId pairing key), cat struct,
    defn struct, is_definition. Invalid elements and non-list files are
    dropped here; ``bulk_stats`` exposes their counts for logging parity.
    """
    raw = raw.withColumn("is_list", F.ltrim(F.col("content")).startswith("["))
    elems = raw.select(
        "path",
        F.posexplode(
            F.arrays_zip(
                F.from_json("content", ArrayType(CATALOGUE_SCHEMA)).alias("cat"),
                F.from_json("content", ArrayType(DEFINITION_SCHEMA)).alias("defn"),
            )
        ).alias("pos", "elem"),
    ).where(F.col("is_list"))
    market_id = F.coalesce(
        F.col("elem")["defn"]["marketId"], F.col("elem")["cat"]["marketId"]
    )
    parent = F.expr("substring(path, 1, length(path) - length(element_at(split(path, '/'), -1)))")
    rows = elems.select(
        F.col("pos"),
        F.col("path").alias("bulk_path"),
        market_id.alias("marketId"),
        F.concat(parent, market_id).alias("stem"),
        F.col("elem")["cat"].alias("cat"),
        F.col("elem")["defn"].alias("defn"),
        F.col("elem")["defn"]["numberOfWinners"].isNotNull().alias("is_definition"),
    ).where(market_id.isNotNull())
    # Last entry wins per (file, marketId), mirroring the reference's dict
    # overwrite (processor.py:227-231): the survivor is the element with the
    # greatest array position, picked with max_by so it is deterministic.
    payload = F.struct("bulk_path", "marketId", "cat", "defn", "is_definition")
    return (
        rows.groupBy("stem")
        .agg(F.max_by(payload, "pos").alias("_e"))
        .select("stem", "_e.*")
        .select("bulk_path", "marketId", "stem", "cat", "defn", "is_definition")
    )
