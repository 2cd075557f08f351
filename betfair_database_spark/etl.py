"""The index-build pipeline: one declarative lineage from file listing to the
37-column index frame (reference flow: processor.py:138-163, re-planned for
Spark — SURVEY §3.1).

    listing ─┬─ metadata files ──┐
             ├─ data files ──────┼─ pairing joins (J1-J4) ─ JSON parse ─
             └─ bulk metadata ───┘
    ─ flatten projections (F1-F9) ─ racing broadcast join (J5) ─ index frame

Every branch is a DataFrame; import counters (reference processor.py:35-79)
are counts of the branch frames. The only Python-on-executor code is the zip
codec (no Spark codec exists for zip).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from betfair_database_spark.const import SQL_TABLE_COLUMNS
from betfair_database_spark.functions.flatten import (
    catalogue_to_flat,
    definition_to_flat,
)
from betfair_database_spark.functions.racing import enrich_with_racing
from betfair_database_spark.sources.bulk import read_bulk_metadata
from betfair_database_spark.sources.discovery import (
    KIND_BULK,
    KIND_DATA,
    KIND_METADATA,
    classify_files,
    list_files,
)
from betfair_database_spark.sources.marketdef import (
    definition_lines,
    extract_latest_definitions,
    write_derived_metadata_files,
)
from betfair_database_spark.sources.metadata_reader import read_metadata_files


@dataclass
class Counters:
    """Import statistics (reference processor.py:35-79)."""

    total_markets: int = 0
    markets_without_data: int = 0
    markets_without_metadata: int = 0
    corrupt_files: int = 0
    rows_inserted: int = 0
    markets_updated: int = 0
    markets_skipped: int = 0
    extra: dict = field(default_factory=dict)

    @property
    def markets_added(self) -> int:
        return self.rows_inserted - self.markets_updated

    def validate(self) -> bool:
        return self.total_markets == (
            self.rows_inserted
            + self.markets_skipped
            + self.corrupt_files
            + self.markets_without_data
            + self.markets_without_metadata
        )


def build_index_frame(
    spark: SparkSession,
    source_dir: str,
    write_derived_files: bool = True,
) -> tuple[DataFrame, Counters]:
    """Build the 37-column index frame for every market under source_dir.

    Returns the frame (unordered; dedup on the path pair applied) and the
    import counters. The frame is lazily planned; counters force the branch
    counts (several small jobs over the cached listing).
    """
    counters = Counters()

    listing = classify_files(list_files(spark, source_dir)).localCheckpoint()
    meta_files = listing.where(F.col("kind") == KIND_METADATA).select("stem", "path")
    data_files = listing.where(F.col("kind") == KIND_DATA).select(
        "stem", F.col("path").alias("data_path"), "length"
    )
    bulk_paths = [
        r.path for r in listing.where(F.col("kind") == KIND_BULK).select("path").collect()
    ]

    counters.total_markets = (
        meta_files.select("stem").union(data_files.select("stem")).distinct().count()
    )

    # --- bulk metadata takes precedence (J4; processor.py:195-258) ----------
    bulk_rows = read_bulk_metadata(spark, bulk_paths)
    bulk_paired = bulk_rows.join(data_files, "stem", "inner").localCheckpoint()
    data_remaining = data_files.join(bulk_rows.select("stem"), "stem", "left_anti")

    # --- pairing (J1) + anti-joins (J2/J3) ----------------------------------
    # One full-outer join materializes all three pairing relationships
    # (paired / metadata-only / data-only) in a single shuffle; the inner and
    # anti variants are filters over it, and the J2 counter is a count on the
    # same checkpointed frame instead of a separate join job.
    pairing = meta_files.join(data_remaining, "stem", "full_outer").localCheckpoint()
    paired = pairing.where(
        F.col("path").isNotNull() & F.col("data_path").isNotNull()
    ).select("stem", "path", "data_path", "length")
    counters.markets_without_data = pairing.where(F.col("data_path").isNull()).count()
    orphan_data = pairing.where(F.col("path").isNull()).select(
        "stem", "data_path", "length"
    )

    # --- derive definitions for orphan data files (S5/S6) -------------------
    orphan_rows = orphan_data.select("stem", "data_path").collect()
    zip_paths = [r.data_path for r in orphan_rows if r.data_path.endswith(".zip")]
    plain_paths = [r.data_path for r in orphan_rows if not r.data_path.endswith(".zip")]
    lines = definition_lines(spark, plain_paths, zip_paths)
    latest = extract_latest_definitions(lines).localCheckpoint()

    derived_ok = latest.where(F.col("defn").isNotNull())
    corrupt_data_files = latest.where(F.col("corrupt")).count()
    files_with_token = latest.select(F.col("path").alias("data_path"))
    counters.markets_without_metadata = (
        orphan_data.join(files_with_token, "data_path", "left_anti").count()
    )

    derived = (
        derived_ok.withColumnRenamed("path", "data_path")
        .join(orphan_data, "data_path", "inner")
        .select(
            F.col("defn"),
            F.concat(F.col("stem"), F.lit(".json")).alias("marketMetadataFilePath"),
            F.col("data_path").alias("marketDataFilePath"),
        )
        .localCheckpoint()
    )
    if write_derived_files:
        write_derived_metadata_files(
            derived.select(
                F.col("marketMetadataFilePath").alias("json_path"),
                F.to_json("defn").alias("defn_json"),
            )
        )

    # --- parse paired metadata files (S2) ------------------------------------
    paired_paths = [r.path for r in paired.select("path").collect()]
    parsed = read_metadata_files(spark, paired_paths).localCheckpoint()
    corrupt_metadata = parsed.where(F.col("corrupt")).count()
    counters.corrupt_files = corrupt_metadata + corrupt_data_files

    good = parsed.where(~F.col("corrupt")).join(
        paired.select(F.col("path"), F.col("data_path")), "path", "inner"
    )

    def _with_paths(df: DataFrame, struct_col: str) -> DataFrame:
        return df.select(
            F.col(struct_col + ".*"),
            F.col("path").alias("marketMetadataFilePath"),
            F.col("data_path").alias("marketDataFilePath"),
        )

    cat_flat = catalogue_to_flat(
        _with_paths(good.where(~F.col("is_definition")), "cat")
    )
    def_flat = definition_to_flat(
        _with_paths(good.where(F.col("is_definition")), "defn")
    )
    derived_flat = definition_to_flat(
        derived.select("defn.*", "marketMetadataFilePath", "marketDataFilePath")
    )

    # --- bulk rows: metadata path is the bulk file itself --------------------
    def _bulk_with_paths(df: DataFrame, struct_col: str) -> DataFrame:
        return df.select(
            F.col(struct_col + ".*"),
            F.col("bulk_path").alias("marketMetadataFilePath"),
            F.col("data_path").alias("marketDataFilePath"),
        )

    bulk_cat_flat = catalogue_to_flat(
        _bulk_with_paths(bulk_paired.where(~F.col("is_definition")), "cat")
    )
    bulk_def_flat = definition_to_flat(
        _bulk_with_paths(bulk_paired.where(F.col("is_definition")), "defn")
    )

    # Materialize the flattened union once: the racing build side and the
    # probe side both consume it, and the flatten projection is the largest
    # expression tree in the engine (37 columns × per-row-timezone logic) —
    # recomputing it doubles both execution and codegen compilation time.
    flat = (
        cat_flat.unionByName(def_flat)
        .unionByName(derived_flat)
        .unionByName(bulk_cat_flat)
        .unionByName(bulk_def_flat)
        .localCheckpoint()
    )

    # --- racing enrichment (J5: broadcast build/probe) -----------------------
    enriched = enrich_with_racing(flat)

    index = enriched.select(*SQL_TABLE_COLUMNS).dropDuplicates(
        ["marketMetadataFilePath", "marketDataFilePath"]
    )
    return index, counters
