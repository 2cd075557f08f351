"""Query-plan-level helpers: the SQLite→Spark SQL dialect shim."""
