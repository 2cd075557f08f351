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
    # literal formats take the segmented emitter (round 7: the generic
    # macro's inlined filter tree blew the JVM 64 KB codegen limit); a
    # computed format still routes through the generic SQL macro
    seg = translate_where("strftime('%m', marketStartTime) == '07'")
    assert "date_format(" in seg and "sqlite_msparse(" in seg
    assert seg.endswith("== '07'")
    assert (
        translate_where("strftime(fmtcol, marketStartTime) == '07'")
        == "sqlite_strftime(fmtcol, marketStartTime) == '07'"
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


def test_double_quoted_spans():
    # known index column -> backtick identifier; unknown -> string literal;
    # neither is touched by the true/false rewrite (ADVICE r1)
    assert (
        translate_where('"marketType" = \'WIN\' AND x = "true"')
        == "`marketType` = 'WIN' AND x = 'true'"
    )
    # SQLite resolves quoted identifiers case-insensitively
    assert translate_where('"MARKETTYPE" = \'WIN\'') == "`marketType` = 'WIN'"
    assert translate_where('"it\'s" = y') == "'it''s' = y"


def test_glob_rewrite():
    # literal patterns convert fully in Python; column operands go through
    # the sqlite_glob_regex SQL macro
    assert (
        translate_where("marketName GLOB 'R1*' AND venue GLOB pat")
        == "marketName RLIKE '^R1.*$'"
        " AND venue RLIKE sqlite_glob_regex(pat)"
    )
    # double-quoted operands resolve like SQLite: column -> identifier,
    # unknown -> literal pattern
    assert (
        translate_where('a GLOB "marketName"')
        == "a RLIKE sqlite_glob_regex(`marketName`)"
    )
    assert translate_where('a GLOB "R1*"') == "a RLIKE '^R1.*$'"
    # function-call operand keeps its argument list intact
    assert (
        translate_where("a GLOB upper(b)")
        == "a RLIKE sqlite_glob_regex(upper(b))"
    )
    # ...and the operand itself is bridged: renamed functions, booleans and
    # double-quoted spans inside it translate like any other expression
    # (the literal strftime format takes the round-7 segmented emitter —
    # '*' is a constant piece, never a java pattern char)
    seg = translate_where("a GLOB strftime('%Y*', eventTime)")
    assert seg.startswith("a RLIKE sqlite_glob_regex(")
    assert "date_format(" in seg and ", '*')" in seg
    assert (
        translate_where('a GLOB substr("marketName", 1, 3)')
        == "a RLIKE sqlite_glob_regex(substr(`marketName`, 1, 3))"
    )
    # not rewritten inside string literals or identifiers
    assert translate_where("a = 'GLOB x'") == "a = 'GLOB x'"
    assert translate_where("globby = 1") == "globby = 1"


def test_strftime_w_codes_and_glob_match_sqlite(spark):
    """Ground truth: the stdlib sqlite3 engine (same engine the reference
    delegates WHERE evaluation to)."""
    import sqlite3

    from betfair_database_spark.plans.dialect import register_sqlite_functions

    register_sqlite_functions(spark)
    con = sqlite3.connect(":memory:")
    for d in [
        "2023-07-27 20:30:00",
        "2023-01-01 00:00:00",
        "2023-01-02 10:00:00",
        "2024-12-31 23:59:59",
        "2020-02-29 08:00:00",
    ]:
        got = spark.sql(
            f"SELECT sqlite_strftime('%w', '{d}') AS w,"
            f" sqlite_strftime('%W', '{d}') AS wk"
        ).first()
        want = con.execute(
            "SELECT strftime('%w', ?), strftime('%W', ?)", (d, d)
        ).fetchone()
        assert (got.w, got.wk) == want, d
    for pat, val in [
        ("R1*", "R1 320m Mdn"),
        ("R1*", "X R1"),
        ("?at", "cat"),
        ("?at", "chat"),
        ("[cb]at", "bat"),
        ("[^cb]at", "rat"),
        ("[^cb]at", "cat"),
        ("a.b*", "axbcd"),
        ("a^b", "a^b"),
        ("x[0-9]y", "x5y"),
    ]:
        got = (
            spark.sql(
                f"SELECT 1 WHERE '{val}' RLIKE sqlite_glob_regex('{pat}')"
            ).count()
            == 1
        )
        want = con.execute("SELECT ? GLOB ?", (val, pat)).fetchone()[0] == 1
        assert got == want, (pat, val)


def test_glob_end_to_end_select(indexed_db):
    rows = indexed_db.select(["marketId"], where="marketName GLOB 'R1*'")
    assert {r["marketId"] for r in rows} == {"1.222000002"}


def test_julianday_matches_sqlite(spark):
    import sqlite3

    from betfair_database_spark.plans.dialect import register_sqlite_functions

    register_sqlite_functions(spark)
    con = sqlite3.connect(":memory:")
    for d in ["2023-08-03 14:00:00", "2000-01-01 12:00:00", "1970-01-01 00:00:00"]:
        got = spark.sql(f"SELECT sqlite_julianday('{d}') AS j").first().j
        want = con.execute("SELECT julianday(?)", (d,)).fetchone()[0]
        assert abs(got - want) < 1e-9
    assert (
        translate_where("julianday(marketStartTime) > 2460000")
        == "sqlite_julianday(marketStartTime) > 2460000"
    )


def test_glob_class_edge_cases_match_sqlite(spark):
    """[*], [?], []], [^...], unmatched '[' — the stateful converter must
    agree with the real SQLite engine on all of them."""
    import sqlite3

    from betfair_database_spark.database import BetfairDatabase  # noqa: F401
    from betfair_database_spark.plans.dialect import glob_to_regex

    con = sqlite3.connect(":memory:")
    cases = [
        ("[*]", "*"), ("[*]", "."), ("[?]", "?"), ("[?]", "x"),
        ("[]]", "]"), ("[]]", "x"), ("a[", "a["), ("a[", "a"),
        ("[^ab]c", "xc"), ("[^ab]c", "ac"), ("x[0-9]*", "x42"),
        ("*.txt", "file.txt"), ("*.txt", "fileAtxt"),
    ]
    for pat, val in cases:
        regex = glob_to_regex(pat)
        lit = regex.replace("\\", "\\\\").replace("'", "''")
        got = spark.sql(f"SELECT 1 WHERE '{val}' RLIKE '{lit}'").count() == 1
        want = con.execute("SELECT ? GLOB ?", (val, pat)).fetchone()[0] == 1
        assert got == want, (pat, val, regex)


def test_shims_independent_of_session_timezone(spark):
    """The session may belong to the caller; every shim must return the
    SQLite (UTC) answer under any session timezone."""
    from betfair_database_spark.plans.dialect import register_sqlite_functions

    register_sqlite_functions(spark)
    q = (
        "SELECT sqlite_time('2023-07-27T20:30:00.000Z') AS t,"
        " sqlite_strftime('%w', '2023-01-01 00:00:00') AS w,"
        " sqlite_julianday('1970-01-01 00:00:00') AS j"
    )
    before = spark.conf.get("spark.sql.session.timeZone")
    utc = spark.sql(q).first()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = spark.sql(q).first()
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
    assert (utc.t, utc.w, utc.j) == (shifted.t, shifted.w, shifted.j)
    assert utc.t == "20:30:00" and utc.w == "0" and utc.j == 2440587.5


def test_strftime_s_f_J_and_unixepoch_match_sqlite(spark):
    """%s, %f, %J and unixepoch() vs the stdlib sqlite3 engine, including
    sub-millisecond inputs (SQLite rounds to its millisecond iJD first) and
    randomized timestamps (VERDICT r4 item 3)."""
    import random
    import sqlite3

    from betfair_database_spark.plans.dialect import (
        register_sqlite_functions,
        translate_where,
    )

    register_sqlite_functions(spark)
    con = sqlite3.connect(":memory:")
    rng = random.Random(20260814)
    fixed = [
        "2023-07-28 13:21:47.625",
        "2023-07-28 13:21:47.6256",   # rounds up to .626
        "2023-07-28 13:21:47.9999",   # rounds into the next second
        "2023-07-28 12:00:00",        # integral julian day -> '2460154'
        "1970-01-01 00:00:00",
        "2024-02-29 23:59:59.999",
    ]
    randoms = [
        f"{rng.randint(1971, 2039)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        f" {rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
        f".{rng.randint(0, 999):03d}"
        for _ in range(40)
    ]
    for d in fixed + randoms:
        got = spark.sql(
            f"SELECT sqlite_strftime('%s', '{d}') AS s,"
            f" sqlite_strftime('%f', '{d}') AS f,"
            f" sqlite_strftime('%J', '{d}') AS J,"
            f" sqlite_unixepoch('{d}') AS ue"
        ).first()
        want = con.execute(
            "SELECT strftime('%s', ?), strftime('%f', ?), strftime('%J', ?),"
            " unixepoch(?)",
            (d, d, d, d),
        ).fetchone()
        assert (got.s, got.f, got.J, got.ue) == want, d
    # unixepoch() routes through translate_where like the other functions
    assert "sqlite_unixepoch(" in translate_where("unixepoch(marketTime) > 0")


def test_like_rewrite_forms():
    """LIKE → RLIKE on the ASCII-fold regex (round-6): literal patterns
    convert in Python; column/function/|| patterns via sqlite_like_regex;
    ESCAPE falls back to ILIKE (documented delta)."""
    assert translate_where("marketName LIKE 'R1%'") == (
        "marketName RLIKE '(?is)^R1.*$'"
    )
    assert translate_where("marketName NOT LIKE 'r_'") == (
        "marketName NOT RLIKE '(?is)^r.$'"
    )
    assert translate_where("a LIKE b") == "a RLIKE sqlite_like_regex(b)"
    assert translate_where("a LIKE upper(b)") == (
        "a RLIKE sqlite_like_regex(upper(b))"
    )
    # || binds tighter than LIKE in SQLite: the chain IS the pattern
    assert translate_where("a LIKE 'R' || '%'") == (
        "a RLIKE sqlite_like_regex('R' || '%')"
    )
    # round 7: literal ESCAPE clauses compile to the exact regex now
    assert (
        translate_where("a LIKE 'x!%' ESCAPE '!'") == "a RLIKE '(?is)^x%$'"
    )
    assert translate_where("a LIKE 'x%' ESCAPE ecol").startswith("a ILIKE")
    # inside string literals the keyword is untouched
    assert translate_where("a = 'LIKE x'") == "a = 'LIKE x'"


def test_like_semantics_match_sqlite(spark):
    """SQLite LIKE folds ONLY the 26 ASCII letters and has no escape char;
    (?i)-without-(?u) Java regex is the exact same rule. Values ride in a
    column (the real query shape); only the pattern is a WHERE literal."""
    import sqlite3

    from betfair_database_spark.plans.dialect import register_sqlite_functions

    register_sqlite_functions(spark)
    con = sqlite3.connect(":memory:")
    cases = [
        ("Race", "race%"), ("RACE", "ra_e"),
        ("über", "ÜBER"), ("über", "üb%"), ("ÜBER", "über"),  # non-ASCII: sensitive
        ("straße", "STRASSE"), ("héllo", "HÉLLO"), ("héllo", "héllo"),
        ("C:\\temp\\x", "C:\\temp%"), ("C:\\temp", "C:\\temp"),  # backslash literal
        ("a\\nb", "a\\_b"), ("100%", "100\\%"),
        ("a.b", "a.b"), ("a.b", "axb"), ("[x]", "[_]"), ("a*b", "a*b"),
        ("line1\nline2", "line1%"), ("line1\nline2", "line1_line2"),
        ("", "%"), ("abc", ""), ("ab", "a%b"), ("aXb", "a%b"),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(cases)], "i int, v string"
    )
    df.createOrReplaceTempView("like_vals")
    for i, (val, pat) in enumerate(cases):
        want = con.execute("SELECT ? LIKE ?", (val, pat)).fetchone()[0] == 1
        tw = translate_where("v LIKE '" + pat.replace("'", "''") + "'")
        got = (
            spark.sql(f"SELECT 1 FROM like_vals WHERE i = {i} AND ({tw})").count()
            == 1
        )
        assert got == want, (val, pat, tw)
    # column-borne pattern goes through the sqlite_like_regex macro
    pdf = spark.createDataFrame(
        [("Race A", "race%"), ("über", "ÜBER"), ("C:\\temp\\x", "C:\\temp%"),
         ("[x]", "[_]"), ("a*b", "a*b")],
        "v string, p string",
    )
    pdf.createOrReplaceTempView("like_vp")
    tw = translate_where("v LIKE p")
    for r in spark.sql(f"SELECT v, p, ({tw}) AS m FROM like_vp").collect():
        want = con.execute("SELECT ? LIKE ?", (r.v, r.p)).fetchone()[0] == 1
        assert bool(r.m) == want, (r.v, r.p)


def test_string_literal_backslash_bridge(spark):
    """SQLite string literals have no backslash escapes — 'C:\\temp' is six
    raw bytes. Spark's parser would read \\t as TAB; translate_where doubles
    backslashes inside literals so both engines compare the same bytes."""
    assert translate_where("v = 'C:\\temp'") == "v = 'C:\\\\temp'"
    df = spark.createDataFrame([("C:\\temp",), ("C:\temp",)], "v string")
    df.createOrReplaceTempView("bs_vals")
    tw = translate_where("v = 'C:\\temp'")
    rows = spark.sql(f"SELECT v FROM bs_vals WHERE {tw}").collect()
    assert [r.v for r in rows] == ["C:\\temp"]


def test_like_escape_matrix_matches_sqlite(spark):
    """Round 7: LIKE ... ESCAPE with literal pattern + escape compiles to
    the exact regex — pinned against stdlib sqlite3 (escape makes the
    following char literal; dangling escape matches nothing; ASCII fold
    still applies; single-char escape enforced)."""
    import sqlite3

    import pytest as _pytest

    from betfair_database_spark.plans.dialect import register_sqlite_functions

    register_sqlite_functions(spark)
    con = sqlite3.connect(":memory:")
    cases = [
        ("100%", "100\\%", "\\"), ("100x", "100\\%", "\\"),
        ("a_b", "a!_b", "!"), ("axb", "a!_b", "!"),
        ("a!b", "a!!b", "!"), ("ab", "a!bb", "!"), ("abb", "a!bb", "!"),
        ("ab", "ab!", "!"), ("ab!", "ab!", "!"),
        ("AB", "a%", "!"), ("A!B", "a!!b", "!"),
        ("a%b", "a!%b", "!"), ("a!%b", "a!!!%b", "!"),
        ("abc", "abc", "c"), ("abc", "abcc", "c"),
        ("a.b", "a.b", "!"), ("axb", "a.b", "!"),
        ("50%", "%!%%", "!"), ("505", "%!%%", "!"),
    ]
    mism = []
    for val, pat, esc in cases:
        v = val.replace("'", "''")
        p = pat.replace("'", "''")
        e = esc.replace("'", "''")
        sql = f"'{v}' LIKE '{p}' ESCAPE '{e}'"
        want = con.execute(f"select {sql}").fetchone()[0]
        got = spark.sql(
            f"SELECT CASE WHEN {translate_where(sql)} THEN 1 ELSE 0 END"
        ).first()[0]
        if int(want) != int(got):
            mism.append(f"{sql}: sqlite={want} spark={got}")
    assert not mism, "\n".join(mism)
    # single-char enforcement (sqlite raises; the bridge raises too)
    with _pytest.raises(ValueError, match="single character"):
        translate_where("x LIKE 'a' ESCAPE 'xy'")
    with _pytest.raises(ValueError, match="single character"):
        translate_where("x LIKE 'a' ESCAPE ''")
    # computed operands keep the ILIKE fallback
    assert "ILIKE" in translate_where("x LIKE col ESCAPE '!'")
    assert "ILIKE" in translate_where("x LIKE 'a%' ESCAPE ecol")


def test_like_escape_fuzz_matches_sqlite(spark):
    """Randomized LIKE ESCAPE patterns vs sqlite3 — values and patterns
    over a small alphabet plus wildcards/escapes so collisions happen."""
    import random
    import sqlite3

    from betfair_database_spark.plans.dialect import register_sqlite_functions

    register_sqlite_functions(spark)
    con = sqlite3.connect(":memory:")
    rng = random.Random(20260815)
    alphabet = "abAB%_!."
    checks = []
    for _ in range(120):
        val = "".join(rng.choice("abAB%_!.x") for _ in range(rng.randint(0, 6)))
        pat = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))
        esc = rng.choice("!.b")
        checks.append((val, pat, esc))
    exprs = []
    wants = []
    for val, pat, esc in checks:
        sql = "'{}' LIKE '{}' ESCAPE '{}'".format(
            val.replace("'", "''"), pat.replace("'", "''"), esc
        )
        wants.append(int(con.execute(f"select {sql}").fetchone()[0]))
        exprs.append(
            f"CASE WHEN {translate_where(sql)} THEN 1 ELSE 0 END"
        )
    row = spark.sql(
        "SELECT " + ", ".join(f"({e}) AS c{i}" for i, e in enumerate(exprs))
    ).first()
    mism = [
        f"{checks[i]}: sqlite={wants[i]} spark={row[f'c{i}']}"
        for i in range(len(checks))
        if int(row[f"c{i}"]) != wants[i]
    ]
    assert not mism, "\n".join(mism[:10])


# ---------------------------------------------------------------------------
# `||` on REAL operands (round 8): sqlite_real_text bridge
# ---------------------------------------------------------------------------


def test_real_concat_translate_forms():
    assert (
        translate_where("eachWayDivisor || '%' = x")
        == "sqlite_real_text(`eachWayDivisor`) || '%' = x"
    )
    # case-insensitive column resolution, both sides of the operator
    assert "sqlite_real_text(`raceDistanceMeters`)" in translate_where(
        "'d:' || racedistancemeters"
    )
    assert "sqlite_real_text(`eachWayDivisor`)" in translate_where(
        '"eachWayDivisor" || marketName'
    )
    # unsigned float literal folds to its SQLite text
    assert translate_where("x || 1e20") == "x || '1.0e+20'"
    assert translate_where("x || 2.50") == "x || '2.5'"
    # NOT in a concat chain: untouched
    assert translate_where("eachWayDivisor = 2.0") == "eachWayDivisor = 2.0"
    # sign-prefixed literal: documented residual, left verbatim
    assert translate_where("x || -1.5") == "x || -1.5"
    # non-REAL columns untouched
    assert translate_where("marketId || '!'") == "marketId || '!'"
    assert translate_where("runners || '!'") == "runners || '!'"
    # 3+ spaces / newline+indent after `||` (whitespace is appended one
    # char per element — a fixed lookback window missed these, silently
    # skipping the bridge on formatted SQL)
    assert (
        translate_where("'x' ||   eachWayDivisor")
        == "'x' ||   sqlite_real_text(`eachWayDivisor`)"
    )
    assert (
        translate_where("'x' ||\n    eachWayDivisor")
        == "'x' ||\n    sqlite_real_text(`eachWayDivisor`)"
    )
    assert translate_where("'x' ||     2.50") == "'x' ||     '2.5'"
    # single `|` (bitwise) with interior space is NOT a concat chain
    assert translate_where("runners | 1 = eachWayDivisor") == (
        "runners | 1 = eachWayDivisor"
    )


def test_real_text_renders_match_sqlite(spark):
    """sqlite_real_text (SQL macro) and sqlite_real_text_py (translate-time
    fold) vs stdlib sqlite3's REAL->TEXT. Exact for every value whose
    shortest repr has <= 15 significant digits; 16-digit/subnormal corners
    may differ by one unit in the 15th digit (documented — Java HALF_UP on
    the shortest repr vs SQLite's own not-correctly-rounded dtoa)."""
    import math
    import random
    import re as _re
    import sqlite3
    import struct

    from betfair_database_spark.plans.dialect import (
        register_sqlite_functions,
        sqlite_real_text_py,
    )

    register_sqlite_functions(spark)
    con = sqlite3.connect(":memory:")
    rng = random.Random(99)
    vals = [
        1.0, 0.1, 1 / 3, 1e15, 999999999999999.0, 1e20, 1e-4, 9.99e-5,
        -0.0, 2.5, 100.0, 1.5e-10, 123456789.123456789,
        1.7976931348623157e308, -1.25, 132.0, 7.75, 480.0,
    ]
    for _ in range(600):
        kind = rng.randrange(4)
        if kind == 0:
            v = rng.uniform(-1e6, 1e6)
        elif kind == 1:
            v = struct.unpack("d", struct.pack("Q", rng.getrandbits(64)))[0]
        elif kind == 2:
            v = rng.uniform(-1, 1) * 10 ** rng.randint(-300, 300)
        else:
            v = float(rng.randint(-10**18, 10**18)) / 10 ** rng.randint(0, 6)
        if v == v and not math.isinf(v):
            vals.append(v)

    df = spark.createDataFrame(list(enumerate(vals)), "i int, v double")
    df.createOrReplaceTempView("real_text_vals")
    got = {
        r.i: r.t
        for r in spark.sql(
            "select i, sqlite_real_text(v) as t from real_text_vals"
        ).collect()
    }

    def sig_digits(s):
        return _re.sub(r"[^0-9]", "", s.split("e")[0]).lstrip("0").rstrip("0")

    for i, v in enumerate(vals):
        want = con.execute("select cast(? as text)", (v,)).fetchone()[0]
        clean = len(sig_digits(repr(v))) <= 15 and -308 < (
            0 if v == 0 else math.floor(math.log10(abs(v)))
        )
        for label, g in (("macro", got[i]), ("pyfold", sqlite_real_text_py(v))):
            if g == want:
                continue
            assert not clean, (label, repr(v), want, g)
            # corner case: must still agree to one unit in the 15th digit
            dw, dg = sig_digits(want)[:15], sig_digits(g)[:15]
            assert abs(int(dw.ljust(15, "0")) - int(dg.ljust(15, "0"))) <= 1, (
                label, repr(v), want, g,
            )


def test_real_concat_end_to_end_matches_sqlite(spark):
    """A WHERE with `eachWayDivisor || suffix` through translate_where vs
    the identical query on sqlite3 — the user-visible contract."""
    import sqlite3

    from betfair_database_spark.plans.dialect import register_sqlite_functions

    register_sqlite_functions(spark)
    vals = [None, 1.0, 2.5, 7.75, 0.0, -0.0, 1e20, 132.0, 0.1]
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (marketId TEXT, eachWayDivisor REAL)")
    rows = [(f"1.{i}", v) for i, v in enumerate(vals)]
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute("SELECT marketId, eachWayDivisor || '!' FROM t").fetchall()
    )
    spark.createDataFrame(
        rows, "marketId string, eachWayDivisor double"
    ).createOrReplaceTempView("real_concat_t")
    tw = translate_where("eachWayDivisor || '!'", projection=True)
    got = dict(
        spark.sql(f"SELECT marketId, {tw} FROM real_concat_t").collect()
    )
    assert got == want
