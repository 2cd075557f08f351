"""betfair_database_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``mzaja/betfair-database`` (reference at
/root/reference, betfairdatabase v1.4.1), re-expressed Spark-first.

The reference is a single-threaded Python + SQLite batch ETL/query tool; this
package reproduces its observable semantics (data model, operators, query
surface, edge-case behavior — see SURVEY.md) as declarative Spark DataFrame
plans so that Catalyst/Tungsten pick the physical strategy and the same code
scales from a laptop to a 1000-executor cluster.

Public API mirrors the reference's module-level functional API
(reference: betfairdatabase/api.py:1-119).
"""

from betfair_database_spark.api import (
    clean,
    columns,
    derive_metadata,
    export,
    index,
    insert,
    select,
    size,
)
from betfair_database_spark.const import DuplicatePolicy
from betfair_database_spark.database import BetfairDatabase
from betfair_database_spark.exceptions import (
    BetfairDatabaseError,
    DatabaseDirectoryError,
    IndexExistsError,
    IndexMissingError,
    MarketDefinitionMissingError,
)

__version__ = "0.1.0"

__all__ = [
    "BetfairDatabase",
    "DuplicatePolicy",
    "BetfairDatabaseError",
    "DatabaseDirectoryError",
    "IndexExistsError",
    "IndexMissingError",
    "MarketDefinitionMissingError",
    "index",
    "select",
    "insert",
    "clean",
    "export",
    "size",
    "columns",
    "derive_metadata",
]
