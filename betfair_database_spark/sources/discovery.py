"""Recursive file discovery and classification (reference: processor.py:165-193).

The reference walks the tree once with ``rglob("*")`` and classifies by file
name. Here the single walk is Spark's ``binaryFile`` listing (content column
is never selected, so only the file index is materialized) and classification
is a ``when/otherwise`` projection — one distributed listing job regardless
of directory size.

Classification contract:
  - name starts with "1.": ``.json`` → metadata; ``.zip/.gz/.bz2`` → data;
    a "suffix" longer than 8 chars (i.e. no real extension, just the market
    id digits) → uncompressed data.
  - name == "metadata.json" → bulk metadata file.

The pairing key ("stem") is the absolute path minus the trailing
compression/json suffix — the same key the reference builds with
``file.with_suffix("")`` (processor.py:183-191).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from betfair_database_spark.const import METADATA_FILE_NAME

KIND_METADATA = "metadata"
KIND_DATA = "data"
KIND_BULK = "bulk"


def list_files(spark: SparkSession, source_dir: str) -> DataFrame:
    """One distributed listing of every file under source_dir.

    Returns columns: path (posix, absolute), length (bytes).
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(source_dir)
        .select("path", "length")  # content column pruned → never read
    )
    return df.withColumn("path", F.regexp_replace("path", "^file:/*", "/"))


def classify_files(listing: DataFrame) -> DataFrame:
    """Adds kind ∈ {metadata,data,bulk,null} and the pairing key ``stem``."""
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    # last-dot suffix, '' when the name has no dot
    suffix = F.regexp_extract(name, r"(\.[^.]*)$", 1)
    is_market = name.startswith("1.")
    kind = (
        F.when(is_market & (suffix == ".json"), F.lit(KIND_METADATA))
        .when(is_market & suffix.isin(".zip", ".gz", ".bz2"), F.lit(KIND_DATA))
        # uncompressed data files: digits after "1." parse as a long "suffix"
        .when(is_market & (F.length(suffix) > 8), F.lit(KIND_DATA))
        .when(name == METADATA_FILE_NAME, F.lit(KIND_BULK))
    )
    stem = F.when(
        kind == KIND_METADATA,
        F.expr("substring(path, 1, length(path) - 5)"),  # strip '.json'
    ).when(
        kind == KIND_DATA,
        F.when(
            suffix.isin(".zip", ".gz", ".bz2"),
            F.expr("substring(path, 1, length(path) - length(regexp_extract(path, '(\\\\.[^.]*)$', 1)))"),
        ).otherwise(F.col("path")),  # uncompressed: full path is the key
    )
    return listing.select(
        "path", "length", kind.alias("kind"), stem.alias("stem")
    ).where(kind.isNotNull())
