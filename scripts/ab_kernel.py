"""Within-session interleaved A/B of env-gated code paths.

    python scripts/ab_kernel.py --env VAR1[,VAR2] [--reps N] q [q ...]

Arm A runs with the listed env vars UNSET, arm B with them set to 1.
The routing switches (veckernels.supports) read os.environ driver-side at
DataFrame-build time, so one Spark session can alternate arms rep by rep:
external load waves hit both arms equally, session startup is paid once,
and codegen warmup is discarded per arm. Prints best + median per arm.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True, help="comma-separated env vars for arm B")
    ap.add_argument("--reps", type=int, default=4, help="timed reps per arm")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    evars = [v for v in args.env.split(",") if v]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for v in evars:
        os.environ.pop(v, None)

    from betfair_database_spark.session import get_spark
    from betfair_database_spark.suite import SUITE

    spark = get_spark("ab-kernel")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def set_arm(b: bool) -> None:
        for v in evars:
            if b:
                os.environ[v] = "1"
            else:
                os.environ.pop(v, None)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        SUITE[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in args.queries:
        spark.sparkContext.setJobDescription(name)
        times: dict[str, list[float]] = {"A": [], "B": []}
        for arm in ("A", "B"):  # discarded codegen/plan warmup per arm
            set_arm(arm == "B")
            run(name)
        for _ in range(args.reps):
            for arm in ("A", "B"):
                set_arm(arm == "B")
                times[arm].append(run(name))
        spark.sparkContext.setJobDescription(None)
        a, b = times["A"], times["B"]
        print(
            f"{name:36s} A(unset) best {min(a):6.3f} med {statistics.median(a):6.3f}"
            f" | B(set) best {min(b):6.3f} med {statistics.median(b):6.3f}"
            f" | runs A {' '.join(f'{t:.2f}' for t in a)}"
            f" B {' '.join(f'{t:.2f}' for t in b)}",
            flush=True,
        )
    set_arm(False)


if __name__ == "__main__":
    main()
