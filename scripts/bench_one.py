"""Measure individual suite queries: wall time through the noop sink and
(optionally) the formatted physical plan.

    python scripts/bench_one.py [--plan DIR] [--reps N] query [query ...]

Prints one line per query: `name  best  runs...`. With --plan DIR, writes
`DIR/<query>.txt` containing `.explain('formatted')` output. Uses the same
session and warmup as bench.py so numbers are comparable.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plan", default=None, help="directory for explain output")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--suffix", default="", help="filename suffix, e.g. _before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from betfair_database_spark.session import get_spark
    from betfair_database_spark.suite import SUITE

    spark = get_spark("bench-one")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args.queries:
        if args.plan:
            df = SUITE[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            Path(args.plan).mkdir(parents=True, exist_ok=True)
            Path(args.plan, f"{name}{args.suffix}.txt").write_text(buf.getvalue())
        runs = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            SUITE[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name:40s} best {min(runs):7.3f}  runs "
            + " ".join(f"{r:.3f}" for r in runs),
            flush=True,
        )


if __name__ == "__main__":
    main()
