"""Round-11 cluster-realism sweep runner: the FULL oracle gate and the
ETL corpus drive on a real multi-JVM cluster (``local-cluster``), with
``spark.bfdb.materialize.mode=reliable`` so every maintenance
materialization goes through the checkpoint FS instead of
executor-local blocks.

Usage::

    python scripts/cluster_gate.py [gate|verify|all] [sf_dir]

Defaults: all, /root/testdata/sf0.01. Master override via
``BFDB_CLUSTER_MASTER`` (default ``local-cluster[4,8,4096]``).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

repo = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(repo))
sys.path.insert(0, str(repo / "scripts"))
sys.path.insert(0, str(repo / "tests"))
os.environ["PYTHONPATH"] = (
    f"{repo}:{repo / 'tests'}:" + os.environ.get("PYTHONPATH", "")
)


def main() -> int:
    from pyspark.sql import SparkSession

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    master = os.environ.get("BFDB_CLUSTER_MASTER", "local-cluster[4,8,4096]")
    ck = tempfile.mkdtemp(prefix="bfdb_cluster_ckpt_")
    spark = (
        SparkSession.builder.master(master)
        .appName("bfdb-cluster-gate")
        .config("spark.executorEnv.PYTHONPATH", f"{repo}:{repo / 'tests'}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        .config("spark.bfdb.materialize.mode", "reliable")
        .config("spark.bfdb.checkpointDir", ck)
        .config("spark.task.maxFailures", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    print(
        f"cluster-gate: master={master} mode={mode} sf={sf_dir} "
        f"executors={spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1}"
    )
    rc = 0
    t0 = time.time()
    try:
        if mode in ("verify", "all"):
            import verify_core

            r = verify_core.main()
            print(f"cluster-gate verify_core rc={r} ({time.time() - t0:.0f}s)")
            rc = rc or r
        if mode in ("gate", "all"):
            import check_oracle

            r = check_oracle.main(sf_dir, set())
            print(f"cluster-gate oracle rc={r} total {time.time() - t0:.0f}s")
            rc = rc or r
    finally:
        spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
