"""CLI surface tests (reference bfdb CLI parity: index/export/insert/clean/size)."""

from __future__ import annotations

import pytest

from tests.corpus import EXPECTED, build_corpus


def test_cli_flow(spark, tmp_path, capsys):
    from betfair_database_spark.cli import main

    db_dir = tmp_path / "db"
    build_corpus(db_dir)

    assert main(["index", str(db_dir)]) == 0
    out = capsys.readouterr().out
    assert f"Indexed {EXPECTED['rows']} markets." in out

    assert main(["size", str(db_dir)]) == 0
    assert capsys.readouterr().out.strip() == str(EXPECTED["rows"])

    assert main(["export", str(db_dir), str(tmp_path)]) == 0
    assert "db.csv" in capsys.readouterr().out
    assert (tmp_path / "db.csv").exists()

    (db_dir / "1.222000014").unlink()
    assert main(["clean", str(db_dir)]) == 0
    assert "Removed 1 entries." in capsys.readouterr().out

    # quiet mode suppresses the message
    assert main(["-q", "clean", str(db_dir)]) == 0
    assert capsys.readouterr().out == ""

    # snapshot history: index + clean committed at least two versions;
    # the live one is marked current, reaped ones show as vacuumed
    assert main(["snapshots", str(db_dir)]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) >= 2 and lines[-1].endswith("current")
    assert any("vacuumed" in line for line in lines[:-1])

    assert main(["vacuum", str(db_dir), "--retain-last", "1"]) == 0
    assert "Reaped" in capsys.readouterr().out
    assert main(["snapshots", str(db_dir)]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 1


def test_cli_parser_shapes():
    from betfair_database_spark.cli import make_parser

    p = make_parser()
    ns = p.parse_args(["insert", "db", "src", "-c", "-p", "event_id", "-d", "skip"])
    assert ns.copy and ns.pattern == "event_id" and ns.on_duplicates == "skip"
    with pytest.raises(SystemExit):
        p.parse_args(["insert", "db", "src", "-d", "bogus"])
    with pytest.raises(SystemExit):
        p.parse_args([])  # subcommand required


def test_cli_rollup_create_and_show(spark, tmp_path, capsys):
    from tests.corpus import build_corpus

    from betfair_database_spark.cli import main

    root = tmp_path / "clidb"
    build_corpus(root)
    assert main(["index", str(root)]) == 0
    assert main(["rollup", str(root), "create"]) == 0
    out1 = capsys.readouterr().out
    assert "Rollup materialized:" in out1
    assert main(["rollup", str(root), "show"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all("\t" in line and "markets" in line for line in out)
    # named spec rollup (round 9): create with --dim/--agg, show, drop
    assert (
        main(
            [
                "rollup", str(root), "create", "--name", "bytype",
                "--dim", "marketType",
                "--dim", "day=to_date(substring(marketStartTime, 1, 10))",
                "--agg", "markets=count()",
                "--agg", "runnersTotal=sum(runners)",
            ]
        )
        == 0
    )
    assert "Rollup 'bytype' materialized:" in capsys.readouterr().out
    assert main(["rollup", str(root), "show", "--name", "bytype"]) == 0
    shown = capsys.readouterr().out.strip().splitlines()
    assert shown and all(len(l.split("\t")) == 4 for l in shown)
    assert main(["rollup", str(root), "drop", "--name", "bytype"]) == 0
    assert "dropped" in capsys.readouterr().out


def test_cli_diff_between_snapshots(spark, tmp_path, capsys):
    import json as _json

    from tests.corpus import build_corpus

    from betfair_database_spark.cli import main
    from betfair_database_spark.database import BetfairDatabase

    root = tmp_path / "diffdb"
    root.mkdir()
    src = tmp_path / "diffsrc"
    build_corpus(src)
    db = BetfairDatabase(root, spark=spark, retain_snapshots=5)
    db.insert(src, copy=True)
    v1 = db.snapshots()[-1]["version"]
    p = src / "1.222000001.json"
    d = _json.loads(p.read_text())
    d["description"]["marketTime"] = "2023-07-28T17:00:00.000Z"
    p.write_text(_json.dumps(d))
    db.insert(src, copy=True, on_duplicates="update")

    assert main(["diff", str(root), str(v1)]) == 0
    out = capsys.readouterr().out
    assert "changed\t" in out and "1.222000001.json" in out
    assert "1 difference(s)." in out
