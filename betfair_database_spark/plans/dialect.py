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

  - ``strftime`` codes ``%w`` (weekday 0-6, Sunday=0) and ``%W`` (week of
    year 00-53, Monday-first) have no java.time pattern equivalent, so the
    shim substitutes their computed values into the pattern before
    ``date_format`` (digits are literals in java.time patterns).
  - ``GLOB`` (case-sensitive ``*``/``?``/``[...]`` matching): rewritten to
    ``RLIKE sqlite_glob_regex('<pattern>')`` — the pattern→regex conversion
    is a JVM-side replace chain.
  - Double-quoted spans follow SQLite's resolution rule: a known index
    column name becomes a backtick identifier, anything else a string
    literal (SQLite prefers identifier, falls back to literal; Spark would
    otherwise always parse ``"x"`` as a string).

``LIKE`` is rewritten to ``RLIKE`` on a pattern→regex conversion carrying
the ``(?i)`` flag WITHOUT ``(?u)``: Java regex case-insensitivity folds the
26 ASCII letters only unless UNICODE_CASE is set, which is byte-for-byte
SQLite's LIKE rule ("case folding for the 26 upper case characters of
ASCII only"). Non-ASCII case pairs stay case-SENSITIVE, exactly like
SQLite (Spark's own ILIKE would fold Unicode — rejected for that reason),
and a backslash in the pattern is a literal character, exactly like
SQLite's escape-less LIKE (Spark LIKE/ILIKE would treat it as an escape).

Documented deltas (not bridged): SQLite-specific operators like ``||`` on
non-strings; ``LIKE ... ESCAPE`` clauses (fall back to ``ILIKE``, i.e.
pre-round-6 semantics); strftime codes the reference-era SQLite (3.40)
itself returns NULL for (``%e %u %k %l %I %T %R %F %p %P %G %g %U %V`` —
bridging them would diverge FROM the reference); ``%%`` immediately
followed by another code letter (``%%Y``); strftime modifier arguments
(``'+N days'`` etc.); and pre-1970 ``%s``/``unixepoch`` (floor vs
euclidean division).
Bridged codes: ``%Y %m %d %H %M %S %f %j %w %W %s %J %%`` plus ``time()``,
``date()``, ``datetime()``, ``julianday()``, ``unixepoch()`` — each
property-tested against the stdlib sqlite3 engine, on SQLite's own
millisecond-rounded time model.
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
    ("%f", "ss.SSS"),  # seconds with milliseconds, e.g. '47.625'
    ("%j", "DDD"),
    ("%%", "%"),
)

# Shared NTZ time expressions for the strftime/unixepoch macros. SQLite's
# internal time representation is MILLISECONDS (iJD), so every input rounds
# to the nearest millisecond before any code is rendered — '47.9999' is
# second 48 to SQLite. All macros therefore run on the rounded timestamp.
_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
_US = f"timestampdiff(MICROSECOND, {_EPOCH}, to_timestamp_ntz(x))"
_MS = f"cast(round({_US} / 1000.0) as bigint)"  # SQLite's iJD resolution
_MUS = f"({_MS} * 1000)"  # millis-rounded micros
_TSR = f"timestampadd(MICROSECOND, {_MUS}, {_EPOCH})"  # millis-rounded timestamp
_EPOCH_SECONDS = f"cast(floor({_MUS} / 1000000.0) as bigint)"
# Julian day BIT-IDENTICAL to SQLite: one double division of the integer
# julian-epoch milliseconds (iJD = epoch-ms + 2440587.5 days of ms), exactly
# the (double)iJD/86400000.0 SQLite computes — summing two rounded terms
# instead would disagree in the last ulp.
_JULIAN = f"(({_MS} + 210866760000000L) / 86400000.0d)"
# SQLite prints %J with C's "%.16g": correctly-rounded 16 significant
# digits, trailing zeros (then a bare trailing dot) stripped. Java's
# format_string('%g') rounds the SHORTEST decimal repr half-up — off by one
# ulp on values like ...4975 — but format_number (DecimalFormat) rounds the
# exact binary value half-even like C. Use it at 16-minus-integer-digits
# decimals, strip its grouping commas, then the zeros.
_JULIAN_TEXT = (
    "regexp_replace(regexp_replace(replace(format_number("
    f"{_JULIAN}, 16 - length(cast(cast(floor({_JULIAN}) as bigint) as string))"
    "), ',', ''), '0+$', ''), '\\\\.$', '')"
)

# SQLite names collide with Spark builtins (Spark 4 has a TIME-typed
# ``time()``), so the WHERE rewriter renames calls to a ``sqlite_`` prefix and
# these SQL UDFs (JVM-side expression macros, no Python) implement them.
#
# Every function parses via to_timestamp_ntz: SQLite's datetime space is UTC
# wall-clock (tz-less strings are UTC; a trailing Z is dropped as offset
# zero), and NTZ arithmetic makes each result IDENTICAL under any session
# timezone — the session may belong to the caller, not this engine.
_SQL_FUNCTIONS = [
    # time('2023-07-27T20:30:00.000Z') -> '20:30:00'
    f"""
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_time(x STRING)
    RETURNS STRING
    RETURN date_format({_TSR}, 'HH:mm:ss')
    """,
    # date(x) -> 'YYYY-MM-DD'
    f"""
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_date(x STRING)
    RETURNS STRING
    RETURN date_format({_TSR}, 'yyyy-MM-dd')
    """,
    # datetime(x) -> 'YYYY-MM-DD HH:MM:SS'
    f"""
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_datetime(x STRING)
    RETURNS STRING
    RETURN date_format({_TSR}, 'yyyy-MM-dd HH:mm:ss')
    """,
    # unixepoch(x) -> integer epoch seconds (floor of the millis-rounded time)
    f"""
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_unixepoch(x STRING)
    RETURNS BIGINT
    RETURN {_EPOCH_SECONDS}
    """,
    # strftime('%m', x) -> '07'; format translated inline, stays JVM-side.
    # %w/%W/%s/%J have no java.time code: their computed values are
    # substituted into the pattern first (unquoted digits, '.' and '-' are
    # literals to date_format).
    f"""
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_strftime(fmt STRING, x STRING)
    RETURNS STRING
    RETURN date_format(
        {_TSR},
        {{chain}}
    )
    """,
    # julianday(x): days since noon UTC, 24 Nov 4714 BC = epoch-days +
    # the epoch's own Julian day number, millis-rounded like SQLite's iJD
    f"""
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_julianday(x STRING)
    RETURNS DOUBLE
    RETURN {_JULIAN}
    """,
    # GLOB pattern -> anchored Java regex: escape regex metachars that GLOB
    # treats literally, then * -> .* and ? -> . ([...] classes pass through —
    # GLOB and regex agree on [seq] and [^seq]).
    r"""
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_glob_regex(pat STRING)
    RETURNS STRING
    RETURN concat('^',
        replace(replace(
            regexp_replace(
                regexp_replace(pat, '([\\\\.$+(){}|])', '\\\\$1'),
                '(?<!\\[)\\^', '\\\\^'),
            '*', '.*'), '?', '.'),
        '$')
    """,
    # LIKE pattern -> Java regex with SQLite's exact fold rule: (?i) without
    # (?u) = ASCII-only case-insensitivity; (?s) lets %/_ cross newlines.
    # Every regex metachar (incl. backslash — SQLite LIKE has no escape
    # char) is matched literally; % -> .*, _ -> . .
    r"""
    CREATE OR REPLACE TEMPORARY FUNCTION sqlite_like_regex(pat STRING)
    RETURNS STRING
    RETURN concat('(?is)^',
        replace(replace(
            regexp_replace(pat, '([\\\\.$+(){}|\\[\\]^*?])', '\\\\$1'),
            '%', '.*'), '_', '.'),
        '$')
    """,
]

_RENAMED_FUNCS = re.compile(
    r"(?i)\b(time|date|datetime|strftime|julianday|unixepoch)\s*\("
)
_GLOB_OP = re.compile(r"(?i)\bGLOB\b\s*")
# SQLite LIKE is case-INSENSITIVE for ASCII; Spark's is case-sensitive.
# ILIKE is Spark's case-insensitive LIKE — the delta narrows to non-ASCII
# case pairs (SQLite stays sensitive there; documented in the header).
_LIKE_OP = re.compile(r"(?i)\bLIKE\b")
_BARE_OPERAND = re.compile(r"[A-Za-z_][\w.]*")

_NEVER_MATCHES = "(?!)"  # SQLite: a malformed class matches nothing


def glob_to_regex(pat: str) -> str:
    """SQLite GLOB pattern → anchored Java regex, stateful scan.

    Faithful to glob(7)/SQLite: ``*``/``?`` wildcards, ``[...]`` classes
    with ``^`` negation and ranges, a ``]`` directly after ``[`` or ``[^``
    is a literal member, wildcards inside a class are literal members, and
    an unterminated class matches nothing.
    """
    out: list[str] = ["^"]
    i, n = 0, len(pat)
    while i < n:
        c = pat[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = i + 1
            cls: list[str] = []
            if j < n and pat[j] == "^":
                cls.append("^")
                j += 1
            if j < n and pat[j] == "]":  # literal ] as first member
                cls.append("\\]")
                j += 1
            while j < n and pat[j] != "]":
                ch = pat[j]
                cls.append("\\" + ch if ch in "\\]^[&" else ch)
                j += 1
            if j >= n:  # unterminated class
                return _NEVER_MATCHES
            out.append("[" + "".join(cls) + "]")
            i = j
        else:
            out.append(re.escape(c))
        i += 1
    out.append("$")
    return "".join(out)


def like_to_regex(pat: str) -> str:
    """SQLite LIKE pattern → anchored Java regex.

    ``(?i)`` WITHOUT ``(?u)`` is Java's ASCII-only case folding — exactly
    SQLite's LIKE rule (ASCII letters fold, non-ASCII stays sensitive);
    ``(?s)`` lets ``%``/``_`` match across newlines. Everything except the
    two wildcards is a literal — including backslash, which escape-less
    SQLite LIKE treats as an ordinary character (Spark LIKE would treat it
    as an escape; ADVICE round-5 delta, now bridged).
    """
    out: list[str] = ["(?is)^"]
    for c in pat:
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        else:
            out.append(re.escape(c))
    out.append("$")
    return "".join(out)


def _fmt_translation_expr() -> str:
    # Codes with no java.time equivalent are VALUE substitutions applied
    # before the code-to-code replaces: %w (weekday, Sunday=0), %W
    # (Monday-first week 00-53, the C strftime formula
    # (yday + 7 - monday_based_wday) / 7), %s (epoch seconds) and %J
    # (Julian day, C %.16g rendering). All run on the millis-rounded
    # timestamp, matching SQLite's internal resolution.
    subs = (
        (
            "%W",
            f"lpad(cast((dayofyear({_TSR}) - 1 + 7"
            f" - weekday({_TSR})) div 7 as string), 2, '0')",
        ),
        ("%w", f"cast(dayofweek({_TSR}) - 1 as string)"),
        ("%s", f"cast({_EPOCH_SECONDS} as string)"),
        ("%J", _JULIAN_TEXT),
    )
    expr = "fmt"
    for code, value in subs:
        expr = f"replace({expr}, '{code}', {value})"
    for sqlite_code, java_code in _FMT_MAP:
        expr = f"replace({expr}, '{sqlite_code}', '{java_code}')"
    return expr


def register_sqlite_functions(spark: SparkSession) -> None:
    """Register SQLite-compatible scalar SQL functions (idempotent)."""
    for stmt in _SQL_FUNCTIONS:
        spark.sql(stmt.format(chain=_fmt_translation_expr()) if "{chain}" in stmt else stmt)


def translate_where(where: str) -> str:
    """Rewrite a SQLite WHERE clause into Spark SQL.

    Rewrites, all outside string literals: ``true``/``false`` → ``1``/``0``,
    SQLite datetime function calls → their registered ``sqlite_`` twins,
    ``GLOB <operand>`` → ``RLIKE sqlite_glob_regex(<operand>)``,
    ``LIKE <operand>`` → ``RLIKE`` on the ASCII-fold regex (see
    ``like_to_regex``; ``ESCAPE`` forms fall back to ``ILIKE``), and
    double-quoted spans resolved the way SQLite would (known column →
    backtick identifier, otherwise a string literal). String literals have
    their backslashes doubled (SQLite literals have no escapes; Spark's
    parser would process them). Everything else passes through verbatim.
    """
    from betfair_database_spark.const import SQL_TABLE_COLUMNS

    # SQLite resolves quoted identifiers case-insensitively
    columns_ci = {c.lower(): c for c in SQL_TABLE_COLUMNS}

    def resolve_double_quoted(span_body: str) -> str:
        """SQLite resolves "x" as an identifier when a column named x exists
        (case-insensitively), else as a string literal; Spark always parses
        "x" as a string, so resolve against the index column contract."""
        actual = columns_ci.get(span_body.lower())
        if actual is not None:
            return f"`{actual}`"
        return "'" + span_body.replace("'", "''") + "'"

    out: list[str] = []
    i, n = 0, len(where)
    while i < n:
        ch = where[i]
        if ch == "'":  # string literal, '' is the escaped quote
            j = _scan_quoted(where, i, "'")
            # SQLite string literals have NO backslash escapes; Spark's
            # parser processes \t, \n, \\ etc. Double every backslash so
            # Spark reads the same bytes SQLite would.
            out.append(where[i : j + 1].replace("\\", "\\\\"))
            i = j + 1
            continue
        if ch == '"':
            j = _scan_quoted(where, i, '"')
            resolved = resolve_double_quoted(where[i + 1 : j].replace('""', '"'))
            if resolved.startswith("'"):  # literal — same backslash bridge
                resolved = resolved.replace("\\", "\\\\")
            out.append(resolved)
            i = j + 1
            continue
        boundary_ok = i == 0 or not (where[i - 1].isalnum() or where[i - 1] in "_.")
        m = re.match(r"(?i)\b(true|false)\b", where[i:])
        if m and boundary_ok:
            out.append("1" if m.group(1).lower() == "true" else "0")
            i += m.end()
            continue
        m = _LIKE_OP.match(where[i:])
        if m and boundary_ok:
            j = i + m.end()
            while j < n and where[j].isspace():
                j += 1
            kind, value, j2 = _parse_pattern_operand(where, j, resolve_double_quoted)
            # LIKE ... ESCAPE has user-defined escape semantics the regex
            # rewrite does not model — fall back to ILIKE (documented
            # delta: Unicode fold + Spark escape handling).
            if kind is None or _ESCAPE_KW.match(where[j2:]):
                out.append("ILIKE")
                i += m.end()
                continue
            if kind == "literal":
                lit = like_to_regex(value).replace("\\", "\\\\").replace("'", "''")
                out.append(f"RLIKE '{lit}'")
            else:
                out.append(f"RLIKE sqlite_like_regex({translate_where(value)})")
            i = j2
            continue
        m = _GLOB_OP.match(where[i:])
        if m and boundary_ok:
            i += m.end()
            # Rewrite by operand form. A literal pattern converts here in
            # Python (full stateful GLOB→regex, all class edge cases); only
            # data-driven patterns (column/function operands) fall back to
            # the sqlite_glob_regex SQL macro. The recursion on expr
            # operands bridges their insides too (e.g. x GLOB
            # strftime('%Y*', col) needs sqlite_strftime).
            kind, value, j2 = _parse_pattern_operand(where, i, resolve_double_quoted)
            if kind == "literal":
                lit = glob_to_regex(value).replace("\\", "\\\\").replace("'", "''")
                out.append(f"RLIKE '{lit}'")
            else:
                out.append(f"RLIKE sqlite_glob_regex({translate_where(value or '')})")
            i = j2
            continue
        m = _RENAMED_FUNCS.match(where[i:])
        if m and boundary_ok:
            out.append(f"sqlite_{m.group(1).lower()}(")
            i += m.end()
            continue
        out.append(ch)
        i += 1
    return "".join(out)


_ESCAPE_KW = re.compile(r"(?i)\s*ESCAPE\b")


def _parse_pattern_operand(where: str, i: int, resolve_double_quoted):
    """Parse the pattern operand of a LIKE/GLOB at ``i`` (whitespace already
    skipped). Returns ``(kind, value, j)``:

    - ``("literal", decoded_body, j)`` — a single quoted literal (or a
      double-quoted span that resolves to one), decoded;
    - ``("expr", raw_text, j)`` — a column, function call, or ``||``
      concatenation chain, as raw source text for the caller to recurse on;
    - ``(None, "", i)`` — nothing parseable (caller falls back).

    ``||`` binds tighter than LIKE/GLOB in SQLite, so a chain like
    ``'R' || '%'`` is part of the pattern and is folded into one expr.
    """
    n = len(where)
    pieces: list[tuple[str, str | None]] = []  # (raw, decoded-literal|None)
    while True:
        if i < n and where[i] == "'":
            j = _scan_quoted(where, i, "'")
            pieces.append((where[i : j + 1], where[i + 1 : j].replace("''", "'")))
            i = j + 1
        elif i < n and where[i] == '"':
            j = _scan_quoted(where, i, '"')
            resolved = resolve_double_quoted(where[i + 1 : j].replace('""', '"'))
            decoded = (
                resolved[1:-1].replace("''", "'")
                if resolved.startswith("'")
                else None
            )
            pieces.append((where[i : j + 1], decoded))
            i = j + 1
        else:
            mo = _BARE_OPERAND.match(where, i)
            if not mo:
                if pieces:  # dangling || — raw chain, let Spark error/handle
                    break
                return None, "", i
            operand = mo.group(0)
            i = mo.end()
            if i < n and where[i] == "(":  # function-call operand
                depth, j = 0, i
                while j < n:
                    if where[j] == "(":
                        depth += 1
                    elif where[j] == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                operand += where[i : j + 1]
                i = j + 1
            pieces.append((operand, None))
        k = i
        while k < n and where[k].isspace():
            k += 1
        if where.startswith("||", k):
            i = k + 2
            while i < n and where[i].isspace():
                i += 1
            continue
        break
    if len(pieces) == 1 and pieces[0][1] is not None:
        return "literal", pieces[0][1], i
    return "expr", " || ".join(raw for raw, _ in pieces), i


def _scan_quoted(s: str, start: int, quote: str) -> int:
    """Index of the closing quote of the span opening at ``start`` (doubled
    quotes are the escape, per SQL)."""
    j = start + 1
    n = len(s)
    while j < n:
        if s[j] == quote:
            if j + 1 < n and s[j + 1] == quote:
                j += 2
                continue
            break
        j += 1
    return j
