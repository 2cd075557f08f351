"""BetfairDatabase facade: index/select/insert/export/clean/size over a
directory of market files, with a Parquet-backed index
(reference: database.py:36-251).

The index is a DataFrame with an explicit 37-field schema persisted as
Parquet inside the database directory; queries run through Spark SQL with the
SQLite dialect shim. All mutation follows the reference's delete-and-rewrite
spirit (processor.py:365-375) as atomic Parquet swaps.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from betfair_database_spark.const import (
    INDEX_DIRNAME,
    SQL_TABLE_COLUMNS,
    SQL_TABLE_NAME,
    DuplicatePolicy,
)
from betfair_database_spark.etl import Counters, build_index_frame
from betfair_database_spark.exceptions import (
    DatabaseDirectoryError,
    IndexExistsError,
    IndexMissingError,
)
from betfair_database_spark.plans.dialect import (
    register_sqlite_functions,
    translate_where,
)
from betfair_database_spark.session import get_spark


class BetfairDatabase:
    """Directory-backed market database with a Parquet index."""

    def __init__(self, database_dir: str | Path, spark: SparkSession | None = None):
        self.database_dir = Path(database_dir)
        if not self.database_dir.exists():
            raise DatabaseDirectoryError(f"'{database_dir}' does not exist.")
        if not self.database_dir.is_dir():
            raise DatabaseDirectoryError(f"'{database_dir}' is not a directory.")
        self.spark = spark or get_spark()
        self._index_path = self.database_dir / INDEX_DIRNAME
        self.last_counters: Counters | None = None

    # ------------------------------------------------------------------ build

    def index(self, force: bool = False) -> int:
        """Index the directory; returns the number of indexed markets
        (reference database.py:55-80)."""
        if self._index_path.exists():
            if force:
                shutil.rmtree(self._index_path)
            else:
                raise IndexExistsError(
                    self.database_dir, " Use force=True option to reindex the database."
                )
        frame, counters = build_index_frame(self.spark, str(self.database_dir))
        self._write_index(frame, str(self._index_path))
        counters.rows_inserted = self._read_index().count()
        self.last_counters = counters
        return counters.rows_inserted

    @staticmethod
    def _write_index(frame: DataFrame, path: str) -> None:
        """Index layout for scale: hive-partitioned by eventTypeId (the most
        selective common predicate → partition pruning) and sorted by
        marketStartTime within partitions (parquet min/max stats → row-group
        skipping for time-range queries). Cardinality of eventTypeId is a few
        dozen sports, so the partition count stays sane at any corpus size."""
        (
            frame.repartition(F.col("eventTypeId"))
            .sortWithinPartitions("marketStartTime")
            .write.mode("overwrite")
            .partitionBy("eventTypeId")
            .parquet(path)
        )

    # ------------------------------------------------------------------ query

    def select_df(
        self,
        columns: list[str] | None = None,
        where: str | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        """DataFrame-returning select — the native query surface."""
        df = self._read_index()
        df.createOrReplaceTempView(SQL_TABLE_NAME)
        register_sqlite_functions(self.spark)
        cols = ",".join(columns) if columns else ",".join(SQL_TABLE_COLUMNS)
        sql = f"SELECT {cols} FROM {SQL_TABLE_NAME}"
        if where:
            sql += f" WHERE {translate_where(where)}"
        if limit is not None:
            sql += f" LIMIT {limit}"
        return self.spark.sql(sql)

    def select(
        self,
        columns: list[str] | None = None,
        where: str | None = None,
        limit: int | None = None,
        return_dict: bool = True,
    ) -> list[dict | tuple]:
        """Reference-parity select returning materialized rows
        (reference database.py:119-157)."""
        rows = self.select_df(columns, where, limit).collect()
        if return_dict:
            return [r.asDict() for r in rows]
        return [tuple(r) for r in rows]

    @staticmethod
    def columns() -> list:
        """Queryable database columns, in contract order."""
        return list(SQL_TABLE_COLUMNS)

    def size(self) -> int:
        """Number of indexed entries (reference database.py:232-237)."""
        return self._read_index().count()

    # ------------------------------------------------------------ maintenance

    def export(self, dest: str | Path = ".") -> Path:
        """Export the index to a single CSV file (reference database.py:165-186).

        Distributed write + atomic single-file move; NULL renders as the
        empty string like csv.DictWriter.
        """
        dest = Path(dest)
        if dest.is_dir():
            dest = dest / (self.database_dir.name + ".csv")
        tmp = dest.parent / (dest.name + ".__tmp__")
        (
            self._read_index()
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .option("nullValue", "")
            .option("emptyValue", "")
            .csv(str(tmp))
        )
        part = next(Path(tmp).glob("part-*.csv"))
        shutil.move(str(part), str(dest))
        shutil.rmtree(tmp)
        return dest

    def clean(self) -> int:
        """Delete index entries whose market data file no longer exists;
        returns the number of removed entries (reference database.py:188-230).

        The reference loops os.path.exists per row; here one distributed
        listing + a left-semi join covers every in-directory path, and only
        out-of-directory stragglers fall back to executor-side stat calls.
        """
        # localCheckpoint (not cache): materializes rows and truncates the
        # plan, so the parquet swap below can't invalidate lazy reads and no
        # identical-plan cache aliasing survives across calls.
        index = self._read_index().localCheckpoint()
        total = index.count()
        base = str(self.database_dir.resolve())

        from betfair_database_spark.sources.discovery import list_files

        existing = list_files(self.spark, str(self.database_dir)).select(
            F.col("path").alias("marketDataFilePath")
        )
        in_dir = index.where(F.col("marketDataFilePath").startswith(base))
        out_dir = index.where(~F.col("marketDataFilePath").startswith(base))
        kept_in = in_dir.join(existing, "marketDataFilePath", "left_semi")
        kept_out = out_dir.where(_exists_udf(F.col("marketDataFilePath")))
        kept = kept_in.unionByName(kept_out)
        kept = kept.localCheckpoint()
        removed = total - kept.count()
        if removed:
            self._rewrite_index(kept)
        return removed

    def insert(
        self,
        source_dir: str | Path,
        copy: bool = False,
        pattern="betfair_historical",
        on_duplicates: DuplicatePolicy | str = DuplicatePolicy.UPDATE,
    ) -> int:
        """Insert market files from source_dir into the database
        (reference database.py:82-117). Returns inserted row count."""
        from betfair_database_spark.inserts import insert_markets

        if not self._index_path.exists():
            self.index()
        return insert_markets(
            self,
            Path(source_dir),
            copy=copy,
            pattern=pattern,
            on_duplicates=DuplicatePolicy(on_duplicates)
            if not isinstance(on_duplicates, DuplicatePolicy)
            else on_duplicates,
        )

    # --------------------------------------------------------------- internal

    def _read_index(self) -> DataFrame:
        if not self._index_path.exists():
            raise IndexMissingError(self.database_dir)
        df = self.spark.read.schema(_index_schema()).parquet(str(self._index_path))
        return df.select(*SQL_TABLE_COLUMNS)  # contract order, partition col included

    def _rewrite_index(self, frame: DataFrame) -> None:
        """Atomic-ish index swap: materialize to a sibling dir, then replace."""
        tmp = self._index_path.with_suffix(".swap")
        self._write_index(frame, str(tmp))
        shutil.rmtree(self._index_path)
        shutil.move(str(tmp), str(self._index_path))


def _index_schema():
    from betfair_database_spark.const import INDEX_SCHEMA

    return INDEX_SCHEMA


def _exists_udf(col):
    import os

    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    def _exists(paths):
        return paths.map(os.path.exists)

    _exists.__annotations__ = {"paths": pd.Series, "return": pd.Series}
    return pandas_udf(_exists, "boolean")(col)
