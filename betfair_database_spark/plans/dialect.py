"""SQLite → Spark SQL dialect shim for the ``select(where=...)`` passthrough.

The reference interpolates the user's WHERE string straight into SQLite
(reference database.py:144-152), so the observable query language is SQLite's
expression grammar. Spark SQL accepts almost all of it verbatim (=, ==, AND,
OR, NOT, IN, BETWEEN, IS NULL, LIKE, arithmetic — SURVEY §2.2). The deltas we
bridge:

  - ``true``/``false`` literals compared against 0/1-stored booleans
    (reference tests/test_integration.py:385-393): rewritten to 1/0 outside
    string literals.
  - SQLite scalar datetime functions ``time()``, ``datetime()``,
    ``strftime()`` (reference tests/test_integration.py:327-343): registered
    as Spark SQL user functions (JVM-side expression macros, no Python UDF),
    robust to arbitrary nesting. ``date()`` already exists in Spark with
    compatible comparison semantics.

Documented deltas (not bridged): SQLite's ``%w``/``%W`` strftime codes, GLOB,
and SQLite-specific operators like ``||`` on non-strings.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

# SQLite strftime → java.time format codes (common subset)
_FMT_MAP = (
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%j", "DDD"),
    ("%%", "%"),
)

# SQLite names collide with Spark builtins (Spark 4 has a TIME-typed
# ``time()``), so the WHERE rewriter renames calls to a ``sqlite_`` prefix and
# these SQL UDFs (JVM-side expression macros, no Python) implement them.
_SQL_FUNCTIONS = [
    # time('2023-07-27T20:30:00.000Z') -> '20:30:00'
    """
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_time(x STRING)
    RETURNS STRING
    RETURN date_format(to_timestamp(x), 'HH:mm:ss')
    """,
    # date(x) -> 'YYYY-MM-DD'
    """
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_date(x STRING)
    RETURNS STRING
    RETURN date_format(to_timestamp(x), 'yyyy-MM-dd')
    """,
    # datetime(x) -> 'YYYY-MM-DD HH:MM:SS'
    """
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_datetime(x STRING)
    RETURNS STRING
    RETURN date_format(to_timestamp(x), 'yyyy-MM-dd HH:mm:ss')
    """,
    # strftime('%m', x) -> '07'; format translated inline, stays JVM-side
    """
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_strftime(fmt STRING, x STRING)
    RETURNS STRING
    RETURN date_format(
        to_timestamp(x),
        {chain}
    )
    """,
]

_RENAMED_FUNCS = re.compile(r"(?i)\b(time|date|datetime|strftime)\s*\(")


def _fmt_translation_expr() -> str:
    expr = "fmt"
    for sqlite_code, java_code in _FMT_MAP:
        expr = f"replace({expr}, '{sqlite_code}', '{java_code}')"
    return expr


def register_sqlite_functions(spark: SparkSession) -> None:
    """Register SQLite-compatible scalar SQL functions (idempotent)."""
    for stmt in _SQL_FUNCTIONS:
        spark.sql(stmt.format(chain=_fmt_translation_expr()) if "{chain}" in stmt else stmt)


def translate_where(where: str) -> str:
    """Rewrite a SQLite WHERE clause into Spark SQL.

    Two rewrites, both outside string literals: ``true``/``false`` → ``1``/
    ``0``, and SQLite datetime function calls → their registered ``sqlite_``
    twins. Everything else passes through verbatim.
    """
    out: list[str] = []
    i, n = 0, len(where)
    while i < n:
        ch = where[i]
        if ch == "'":  # skip string literal, '' is the escaped quote
            j = i + 1
            while j < n:
                if where[j] == "'":
                    if j + 1 < n and where[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(where[i : j + 1])
            i = j + 1
            continue
        boundary_ok = i == 0 or not (where[i - 1].isalnum() or where[i - 1] in "_.")
        m = re.match(r"(?i)\b(true|false)\b", where[i:])
        if m and boundary_ok:
            out.append("1" if m.group(1).lower() == "true" else "0")
            i += m.end()
            continue
        m = _RENAMED_FUNCS.match(where[i:])
        if m and boundary_ok:
            out.append(f"sqlite_{m.group(1).lower()}(")
            i += m.end()
            continue
        out.append(ch)
        i += 1
    return "".join(out)
