"""Module-level functional API delegating to BetfairDatabase
(reference: betfairdatabase/api.py:1-119)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession

from betfair_database_spark.const import SQL_TABLE_COLUMNS, DuplicatePolicy


def _db(database_dir: str | Path, spark: SparkSession | None = None):
    from betfair_database_spark.database import BetfairDatabase

    return BetfairDatabase(database_dir, spark=spark)


def index(database_dir: str | Path, force: bool = False, spark=None) -> int:
    """Turn the target directory into a database by indexing its contents."""
    return _db(database_dir, spark).index(force=force)


def select(
    database_dir: str | Path,
    columns: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
    return_dict: bool = True,
    spark=None,
    group_by: list[str] | None = None,
) -> list[dict | tuple]:
    """Select data from the database index. ``group_by`` (engine
    extension) aggregates with rollup auto-routing — see
    BetfairDatabase.select_df."""
    return _db(database_dir, spark).select(
        columns=columns,
        where=where,
        limit=limit,
        return_dict=return_dict,
        group_by=group_by,
    )


def insert(
    database_dir: str | Path,
    source_dir: str | Path,
    copy: bool = False,
    pattern="betfair_historical",
    on_duplicates: DuplicatePolicy | str = DuplicatePolicy.UPDATE,
    spark=None,
) -> int:
    """Insert market files from source_dir into the database."""
    return _db(database_dir, spark).insert(
        source_dir, copy=copy, pattern=pattern, on_duplicates=on_duplicates
    )


def clean(database_dir: str | Path, spark=None) -> int:
    """Delete index entries whose market data file is missing."""
    return _db(database_dir, spark).clean()


def export(database_dir: str | Path, dest: str | Path = ".", spark=None) -> Path:
    """Export the database index to a CSV file."""
    return _db(database_dir, spark).export(dest)


def size(database_dir: str | Path, spark=None) -> int:
    """Number of indexed entries."""
    return _db(database_dir, spark).size()


def columns() -> list:
    """Queryable database columns, in contract order."""
    return list(SQL_TABLE_COLUMNS)


def derive_metadata(market_data_file: str | Path) -> dict:
    """Parse the last market definition of a single data file (no Spark job).

    Raises MarketDefinitionMissingError when the file has no definition line.
    """
    from betfair_database_spark.sources.marketdef import derive_metadata as _dm

    return _dm(market_data_file)


def progress_bar(enable: bool = True) -> None:
    """API-parity shim (reference api.py progress_bar): the reference toggles
    a tqdm bar around its serial loops; this engine reports progress through
    the Spark UI / console progress instead, so this is a documented no-op."""

