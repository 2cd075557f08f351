"""Randomized WHERE-clause equivalence fuzzing: generate expressions from
the supported SQLite grammar, run them through the real reference engine
(stdlib sqlite3 over a mirrored index table) AND through translate_where +
Spark SQL over the same rows, and require identical marketId sets.

This is the strongest check the P10 "any SQLite WHERE" contract can get
short of symbolic equivalence: every supported construct — comparison
operators, BETWEEN, IN, IS [NOT] NULL, LIKE (ASCII-case-insensitive),
GLOB, true/false literals against 0/1 booleans, AND/OR/NOT nesting, the
bridged datetime functions — composed randomly, 120 seeded expressions.
"""

from __future__ import annotations

import random
import sqlite3

import pytest

from tests.corpus import build_corpus

COLS = [
    ("marketId", "TEXT"),
    ("marketName", "TEXT"),
    ("marketStartTime", "TEXT"),
    ("eventTypeId", "TEXT"),
    ("bspMarket", "INTEGER"),
    ("runners", "INTEGER"),
    ("numberOfWinners", "INTEGER"),
    ("raceId", "TEXT"),
    ("marketSettledTime", "TEXT"),
    ("marketType", "TEXT"),
]


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    from betfair_database_spark.database import BetfairDatabase

    root = tmp_path_factory.mktemp("fuzzdb") / "db"
    build_corpus(root)
    db = BetfairDatabase(root, spark=spark)
    db.index()
    rows = db.select([c for c, _ in COLS])
    con = sqlite3.connect(":memory:")
    decl = ", ".join(f'"{c}" {t}' for c, t in COLS)
    con.execute(f"CREATE TABLE idx ({decl})")
    con.executemany(
        f"INSERT INTO idx VALUES ({','.join('?' * len(COLS))})",
        [tuple(r[c] for c, _ in COLS) for r in rows],
    )
    con.commit()
    return db, con, rows


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _gen_atom(rng: random.Random, rows) -> str:
    kind = rng.choice(
        ["cmp_text", "cmp_num", "between", "in", "null", "like", "glob",
         "bool", "time_fn", "strftime", "julian", "unixepoch",
         "arith", "concat", "case"]
    )
    sample = rng.choice(rows)
    if kind == "cmp_text":
        col = rng.choice(["marketId", "marketName", "eventTypeId", "marketType", "marketStartTime"])
        val = sample[col] or "x"
        op = rng.choice(["=", "==", "!=", "<>", "<", "<=", ">", ">="])
        return f"{col} {op} {_sq(val)}"
    if kind == "cmp_num":
        col, val = rng.choice(
            [("runners", rng.randint(0, 10)), ("numberOfWinners", rng.randint(0, 3))]
        )
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        return f"{col} {op} {val}"
    if kind == "between":
        lo, hi = sorted([f"1.2220000{rng.randint(0, 9)}", f"1.2220000{rng.randint(0, 9)}"])
        return f"marketId BETWEEN {_sq(lo + '00')} AND {_sq(hi + '99')}"
    if kind == "in":
        vals = rng.sample([r["eventTypeId"] or "?" for r in rows], k=min(3, len(rows)))
        lst = ", ".join(_sq(v) for v in vals)
        neg = "NOT " if rng.random() < 0.3 else ""
        return f"eventTypeId {neg}IN ({lst})"
    if kind == "null":
        col = rng.choice(["raceId", "marketSettledTime"])
        return f"{col} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
    if kind == "like":
        name = (sample["marketName"] or "Race")
        frag = name[: rng.randint(1, max(1, len(name) // 2))]
        # randomize case: SQLite LIKE is ASCII-case-insensitive
        frag = "".join(c.upper() if rng.random() < 0.5 else c.lower() for c in frag)
        pat = frag.replace("%", "").replace("_", "x") + "%"
        r = rng.random()
        if r < 0.15:
            # backslash in pattern: literal char in SQLite (no escape
            # without ESCAPE), bridged by the regex rewrite
            pat = "\\" + pat
        elif r < 0.3:
            # regex metachars must stay literal through the rewrite
            pat = pat[:-1] + rng.choice([".", "*", "[", "]", "(", "^", "$"]) + "%"
        elif r < 0.45 and len(pat) > 2:
            # single-char wildcard mid-pattern
            mid = rng.randint(1, len(pat) - 2)
            pat = pat[:mid] + "_" + pat[mid + 1 :]
        if rng.random() < 0.25:
            # round 7: LIKE ... ESCAPE is bridged exactly for literal
            # operands — escape a wildcard or inject a literal escape char
            esc = rng.choice(["!", "#"])
            if rng.random() < 0.5 and len(pat) > 1:
                mid = rng.randint(0, len(pat) - 1)
                pat = pat[:mid] + esc + rng.choice(["%", "_", esc]) + pat[mid:]
            else:
                pat = esc + rng.choice(["%", "_"]) + pat
            return (
                f"marketName {'NOT ' if rng.random() < 0.3 else ''}"
                f"LIKE {_sq(pat)} ESCAPE {_sq(esc)}"
            )
        return f"marketName {'NOT ' if rng.random() < 0.3 else ''}LIKE {_sq(pat)}"
    if kind == "glob":
        pat = rng.choice(["1.2220000*", "*Mdn*", "?.*", "[12].*", "*[0-9]"])
        return f"marketId GLOB {_sq(pat)}" if pat[0] in "1?[*" else f"marketName GLOB {_sq(pat)}"
    if kind == "bool":
        lit = rng.choice(["true", "false", "0", "1"])
        op = rng.choice(["=", "!="])
        return f"bspMarket {op} {lit}"
    if kind == "time_fn":
        hh = f"{rng.randint(0, 23):02d}:00:00"
        return f"time(marketStartTime) {rng.choice(['<', '>='])} {_sq(hh)}"
    if kind == "strftime":
        code = rng.choice(["%w", "%m", "%d", "%H", "%Y", "%j", "%W"])
        val = sqlite3.connect(":memory:").execute(
            "SELECT strftime(?, ?)", (code, sample["marketStartTime"])
        ).fetchone()[0]
        return f"strftime({_sq(code)}, marketStartTime) = {_sq(val)}"
    if kind == "julian":
        return "julianday(marketStartTime) > julianday('2023-08-01 00:00:00')"
    if kind == "arith":
        k = rng.randint(1, 4)
        return rng.choice(
            [
                f"runners + numberOfWinners > {rng.randint(5, 12)}",
                f"runners * {k} - numberOfWinners >= {rng.randint(4, 30)}",
                f"(runners - {k}) % {rng.randint(2, 4)} = 0",
                f"-numberOfWinners < -{rng.randint(0, 2)}",
            ]
        )
    if kind == "concat":
        val = (sample["eventTypeId"] or "7") + "/" + (sample["marketType"] or "WIN")
        return f"eventTypeId || '/' || marketType = {_sq(val)}"
    if kind == "case":
        et = sample["eventTypeId"] or "7"
        return (
            f"CASE WHEN eventTypeId = {_sq(et)} THEN runners"
            f" ELSE numberOfWinners END >= {rng.randint(1, 8)}"
        )
    return f"unixepoch(marketStartTime) % {rng.randint(2, 5)} = 0"


def _gen_expr(rng: random.Random, rows, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.4:
        atom = _gen_atom(rng, rows)
        return f"NOT ({atom})" if rng.random() < 0.15 else atom
    op = rng.choice(["AND", "OR"])
    left = _gen_expr(rng, rows, depth + 1)
    right = _gen_expr(rng, rows, depth + 1)
    expr = f"({left}) {op} ({right})"
    return f"NOT {expr}" if rng.random() < 0.1 else expr


def test_where_fuzz_matches_sqlite(engines):
    db, con, rows = engines
    rng = random.Random(20260814)
    for trial in range(120):
        where = _gen_expr(rng, rows)
        want = sorted(
            r[0]
            for r in con.execute(f"SELECT marketId FROM idx WHERE {where}")
        )
        got = sorted(r["marketId"] for r in db.select(["marketId"], where=where))
        assert got == want, f"trial {trial}: WHERE {where}\nspark={got}\nsqlite={want}"
