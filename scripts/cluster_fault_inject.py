"""Executor-kill fault injection on a REAL multi-JVM cluster (round 11,
verdict #1).

Drives a full corpus insert() on ``local-cluster[2,2,1536]`` with
``spark.bfdb.materialize.mode=reliable`` and SIGKILLs one executor JVM
while the insert's jobs are running. The maintenance path materializes
its long-lived frames (decision join, replacement frame) through
``plans.materialize``, so with reliable mode their blocks live in the
checkpoint directory, not on the killed executor — the insert must
complete and the index must contain exactly the expected markets.

Run standalone (``python scripts/cluster_fault_inject.py``) or via
``tests/test_cluster.py`` (subprocess — a second SparkContext cannot
live in the pytest JVM).
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _executor_pids() -> list[int]:
    try:
        out = subprocess.run(
            ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
            capture_output=True,
            text=True,
            check=False,
        ).stdout
        return [int(x) for x in out.split()]
    except (OSError, ValueError):
        return []


def main() -> int:
    import os

    from pyspark.sql import SparkSession

    repo = str(Path(__file__).resolve().parents[1])
    # executors are separate JVMs with their own Python workers: the
    # package must be importable THERE too (cloudpickled UDFs reference it)
    os.environ["PYTHONPATH"] = repo + ":" + os.environ.get("PYTHONPATH", "")
    base = Path(tempfile.mkdtemp(prefix="bfdb_fault_"))
    spark = (
        SparkSession.builder.master("local-cluster[2,2,1536]")
        .config("spark.executorEnv.PYTHONPATH", repo)
        .appName("bfdb-fault-inject")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.task.maxFailures", "8")
        .config("spark.stage.maxConsecutiveAttempts", "8")
        .config("spark.bfdb.materialize.mode", "reliable")
        .config("spark.bfdb.checkpointDir", str(base / "ckpt"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    try:
        from tests.corpus import EXPECTED, build_corpus
        from betfair_database_spark.database import BetfairDatabase

        src = base / "src"
        build_corpus(src)
        target = base / "db"
        target.mkdir()
        db = BetfairDatabase(target, spark=spark)

        tracker = spark.sparkContext.statusTracker()
        killed: dict = {}

        def killer():
            # wait until the insert's Spark jobs are actually running,
            # then SIGKILL one executor JVM mid-flight
            deadline = time.time() + 120
            while time.time() < deadline:
                jobs = tracker.getActiveJobsIds()
                pids = _executor_pids()
                if jobs and pids:
                    import os
                    import signal

                    os.kill(pids[0], signal.SIGKILL)
                    killed["pid"] = pids[0]
                    killed["at_jobs"] = list(jobs)
                    return
                time.sleep(0.2)

        th = threading.Thread(target=killer, daemon=True)
        th.start()
        n = db.insert(src, copy=True)
        th.join(timeout=5)
        expected = EXPECTED["rows"]
        rows = db.select(columns=["marketId"])
        if not killed:
            print("FAULT-INJECTION INCONCLUSIVE: no executor was killed")
            return 2
        if expected is not None and n != expected:
            print(f"FAULT-INJECTION FAIL: inserted {n} != {expected}")
            return 1
        if len(rows) != n:
            print(f"FAULT-INJECTION FAIL: select {len(rows)} != insert {n}")
            return 1
        print(
            f"FAULT-INJECTION OK inserted={n} rows={len(rows)} "
            f"killed_pid={killed['pid']} at_jobs={killed['at_jobs']}"
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
