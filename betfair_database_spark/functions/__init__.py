"""Pure-column transform functions (no Python UDFs in the hot path).

Every function here returns Column expressions or DataFrames built from
built-in pyspark.sql.functions so the whole ETL stays inside whole-stage
codegen and Catalyst can push/prune/reorder freely.
"""
