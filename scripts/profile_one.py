"""Per-stage empirical profile of suite queries (guide §1.1/§7.1).

Runs each query through the noop sink with the Spark UI enabled, then
reads the UI REST API for per-stage metrics: duration, executor run time,
shuffle bytes, input bytes, GC. Prints the heaviest stages so the "where
does the time go" question is answered from data, not the static plan.

    python scripts/profile_one.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.environ["SPARK_GRAFT_UI"] = "true"
    from betfair_database_spark.session import get_spark

    spark = get_spark("profile")
    from betfair_database_spark.suite import SUITE

    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    app = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            return json.load(r)

    for name in names:
        before_ids = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        SUITE[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        new = [
            s
            for s in stages()
            if s["stageId"] not in before_ids and s["status"] != "SKIPPED"
        ]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages, "
              f"executorRunTime sum {total_run/1000:.1f}s")
        for s in new[:14]:
            dur = (s.get("executorRunTime") or 0) / 1000
            sr = (s.get("shuffleReadBytes") or 0) / 1e6
            sw = (s.get("shuffleWriteBytes") or 0) / 1e6
            ib = (s.get("inputBytes") or 0) / 1e6
            gc = (s.get("jvmGcTime") or 0) / 1000
            nm = (s.get("name") or "")[:70]
            submit = s.get("firstTaskLaunchedTime", "")[11:23]
            print(
                f"  run {dur:6.2f}s gc {gc:5.2f}s tasks {s.get('numCompleteTasks', 0):4d} "
                f"in {ib:7.1f}MB sr {sr:7.1f}MB sw {sw:7.1f}MB  {submit}  {nm}"
            )


if __name__ == "__main__":
    main()
