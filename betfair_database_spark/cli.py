"""``bfdb-spark`` command-line interface — subcommand surface mirrors the
reference's ``bfdb`` CLI (reference cli.py: index/export/insert/clean/size
with the same flags; ``select`` is intentionally API-only there and here)."""

from __future__ import annotations

import argparse
import sys

from betfair_database_spark.const import DuplicatePolicy
from betfair_database_spark.exceptions import BetfairDatabaseError
from betfair_database_spark.functions.patterns import BUILTIN_PATTERNS


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="bfdb-spark",
        description="A PySpark-native database of historical Betfair exchange data.",
    )
    parser.add_argument("--version", action="version", version="%(prog)s 0.1.0")
    parser.add_argument(
        "-q", "--quiet", action="store_true", help="suppress informational output"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_index = sub.add_parser(
        "index",
        description="Turns the target directory into a database by indexing its contents.",
    )
    p_index.add_argument("database_dir")
    p_index.add_argument(
        "-f", "--force", action="store_true", help="Overwrite an existing index."
    )

    p_export = sub.add_parser(
        "export", description="Exports the indexed database to a CSV file."
    )
    p_export.add_argument("database_dir")
    p_export.add_argument("dest", nargs="?", default=".")
    p_export.add_argument(
        "--multi-part",
        action="store_true",
        help="write a directory of parallel part-*.csv shards instead of "
        "one file (each shard carries the header; fast at large index scale)",
    )

    p_insert = sub.add_parser(
        "insert",
        description="Inserts market metadata and data files from source_dir into the database.",
    )
    p_insert.add_argument("database_dir")
    p_insert.add_argument("source_dir")
    p_insert.add_argument(
        "-c", "--copy", action="store_true", help="Copy instead of moving files."
    )
    p_insert.add_argument(
        "-p",
        "--pattern",
        default="betfair_historical",
        choices=sorted(BUILTIN_PATTERNS),
        help="File import pattern.",
    )
    p_insert.add_argument(
        "-d",
        "--on-duplicates",
        default="update",
        choices=[p.value for p in DuplicatePolicy],
        help="Duplicate handling policy.",
    )

    p_clean = sub.add_parser(
        "clean",
        description="Removes entries with missing market data files from the database.",
    )
    p_clean.add_argument("database_dir")

    p_size = sub.add_parser(
        "size", description="Returns the number of indexed entries in the database."
    )
    p_size.add_argument("database_dir")

    p_snaps = sub.add_parser(
        "snapshots",
        description="List committed index snapshots (version / rows / "
        "readable / current).",
    )
    p_snaps.add_argument("database_dir")

    p_vac = sub.add_parser(
        "vacuum",
        description="Prune index snapshot history and reap unreferenced "
        "part-files.",
    )
    p_vac.add_argument("database_dir")
    p_vac.add_argument(
        "--retain-last",
        type=int,
        default=1,
        help="number of newest snapshots to keep readable (default 1)",
    )

    p_roll = sub.add_parser(
        "rollup",
        description="Materialize or show a continuous aggregate (engine "
        "extension; insert/clean keep it consistent). Default: the "
        "built-in per-(sport, day) rollup; --name + --dims + --agg "
        "declare a custom spec rollup.",
    )
    p_roll.add_argument("database_dir")
    p_roll.add_argument(
        "action",
        choices=["create", "show", "drop"],
        help="create = (re)build from the index; show = print the rows; "
        "drop = remove a named rollup",
    )
    p_roll.add_argument(
        "--name", help="named spec rollup (default: the built-in rollup)"
    )
    p_roll.add_argument(
        "--dim",
        action="append",
        dest="dims",
        help="group-by dim: an index column or alias=SQL_EXPR; repeatable "
        "(e.g. --dim countryCode --dim "
        "'day=to_date(substring(marketStartTime,1,10))')",
    )
    p_roll.add_argument(
        "--agg",
        action="append",
        dest="aggs",
        help="alias=op(col) with op in count/sum/sumsq/min/max/"
        "approx_count_distinct; repeatable (e.g. --agg 'markets=count()' "
        "--agg 'runnersTotal=sum(runners)'); declare count(col)+sum(col)"
        "+sumsq(col) together to make avg/stddev/var(col) selects "
        "routable",
    )

    p_diff = sub.add_parser(
        "diff",
        description="What changed between two committed index snapshots "
        "(added/removed/changed market rows).",
    )
    p_diff.add_argument("database_dir")
    p_diff.add_argument("version", type=int, help="older snapshot version")
    p_diff.add_argument(
        "--to-version",
        type=int,
        default=None,
        help="newer snapshot (default: the live index)",
    )

    return parser


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)
    try:
        return _run(args)
    except BetfairDatabaseError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


def _run(args: argparse.Namespace) -> int:
    from betfair_database_spark.database import BetfairDatabase

    db = BetfairDatabase(args.database_dir)

    def say(msg: str) -> None:
        if not args.quiet:
            print(msg)

    if args.command == "index":
        say(f"Indexed {db.index(force=args.force)} markets.")
    elif args.command == "export":
        dest = db.export(args.dest, single_file=not args.multi_part)
        say(f"Exported to '{dest}'.")
    elif args.command == "insert":
        n = db.insert(
            args.source_dir,
            copy=args.copy,
            pattern=args.pattern,
            on_duplicates=args.on_duplicates,
        )
        say(f"Inserted {n} markets.")
    elif args.command == "clean":
        say(f"Removed {db.clean()} entries.")
    elif args.command == "size":
        print(db.size())
    elif args.command == "snapshots":
        for s in db.snapshots():
            flags = ("current" if s["current"] else "") + (
                "" if s["readable"] else " vacuumed"
            )
            print(f"v{s['version']}\t{s['rows']} rows\t{flags.strip()}")
    elif args.command == "vacuum":
        say(f"Reaped {db.vacuum(retain_last=args.retain_last)} files.")
    elif args.command == "rollup":
        if args.action == "create":
            n = db.create_rollup(
                name=args.name, dims=args.dims, aggs=args.aggs
            )
            label = f"Rollup {args.name!r}" if args.name else "Rollup"
            say(f"{label} materialized: {n} rows.")
        elif args.action == "drop":
            if not args.name:
                raise SystemExit("rollup drop requires --name")
            say(
                f"Rollup {args.name!r} "
                + ("dropped." if db.drop_rollup(args.name) else "not found.")
            )
        elif args.name:
            df = db.rollup(args.name)
            cols = df.columns
            for r in sorted(
                df.collect(), key=lambda r: tuple(str(r[c]) for c in cols)
            ):
                print("\t".join(str(r[c]) for c in cols))
        else:
            for r in sorted(
                db.rollup().collect(),
                key=lambda r: (str(r["eventTypeId"]), str(r["startDate"])),
            ):
                print(
                    f"{r['eventTypeId']}	{r['startDate']}	"
                    f"{r['markets']} markets	{r['runnersTotal']} runners"
                )
    elif args.command == "diff":
        rows = sorted(
            (r["change_type"], r["marketMetadataFilePath"])
            for r in db.diff(args.version, args.to_version).collect()
        )
        for change, path in rows:
            print(f"{change}\t{path}")
        say(f"{len(rows)} difference(s).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
