"""SQLite→Spark dialect shim tests (reference WHERE surface,
tests pinned at reference tests/test_integration.py:265-393)."""

from __future__ import annotations

from betfair_database_spark.plans.dialect import translate_where


def test_true_false_rewrite():
    assert translate_where("bspMarket = true") == "bspMarket = 1"
    assert translate_where("a = FALSE OR b == True") == "a = 0 OR b == 1"


def test_string_literals_untouched():
    assert (
        translate_where("name = 'this is true' AND x = true")
        == "name = 'this is true' AND x = 1"
    )
    assert translate_where("name = 'it''s true'") == "name = 'it''s true'"


def test_identifier_suffix_not_rewritten():
    assert translate_where("is_true = 1") == "is_true = 1"
    assert translate_where("x.true_col = 2") == "x.true_col = 2"


def test_function_renames():
    assert (
        translate_where("time(marketStartTime) > '09:00:00'")
        == "sqlite_time(marketStartTime) > '09:00:00'"
    )
    assert (
        translate_where("strftime('%m', marketStartTime) == '07'")
        == "sqlite_strftime('%m', marketStartTime) == '07'"
    )
    assert translate_where("datetime(x) = '2023-01-01 00:00:00'").startswith(
        "sqlite_datetime("
    )


def test_sql_functions_registered(spark):
    from betfair_database_spark.plans.dialect import register_sqlite_functions

    register_sqlite_functions(spark)
    row = spark.sql(
        "SELECT sqlite_time('2023-07-27T20:30:00.000Z') AS t, "
        "sqlite_strftime('%Y-%m', '2023-07-27T20:30:00.000Z') AS ym, "
        "sqlite_date('2023-07-27T20:30:00.000Z') AS d, "
        "sqlite_datetime('2023-07-27T20:30:00.000Z') AS dt"
    ).first()
    assert row.t == "20:30:00"
    assert row.ym == "2023-07"
    assert row.d == "2023-07-27"
    assert row.dt == "2023-07-27 20:30:00"
