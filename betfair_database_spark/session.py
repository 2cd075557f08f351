"""SparkSession factory with scale-oriented defaults.

All engine code receives a SparkSession; this helper only standardizes the
local test/bench configuration. On a real cluster the session comes from the
deployment, and every plan in this package is partition-count-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "betfair-database-spark") -> SparkSession:
    """Build (or reuse) a SparkSession with AQE and sane local defaults.

    Settings rationale (tuned for correctness at small SF, designed for scale):
      - AQE on: runtime partition coalescing + skew-join handling.
      - shuffle.partitions: sized to local cores; on a cluster AQE coalesces.
      - session timezone UTC: the reference stores ISO-8601 UTC strings and
        derives local times explicitly (reference: metadata.py:40-72), so the
        engine must never depend on machine-local time.
      - Arrow enabled: every Python-side exchange is vectorized.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalesces post-shuffle partitions by BYTES, but bytes are a
        # poor proxy for CPU in array-heavy stages (shingle arrays, pair
        # verify, wedge joins): profiled at sf0.1, a 15 MB exchange was
        # coalesced to ~11 partitions and the CPU-dense verify stage ran
        # on a third of the cores. Lowering the coalesce floor keeps such
        # stages at full parallelism; measured -35..-41% on the graph
        # rows, -13% containment ssjoin, no regression on scan/agg rows
        # (interleaved A/B, OPTIMIZATION_r13.md). At production scale the
        # floor never binds (partitions are sized by the 64 MB advisory
        # target); it only matters when shuffle bytes are small relative
        # to cores x per-row CPU — true on any cluster running CPU-dense
        # last-mile stages, not a local[32] artifact.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # SPARK_GRAFT_UI=true exposes the UI REST API for the per-stage
        # profiler (scripts/profile_one.py); off by default so bench runs
        # pay no listener/UI overhead
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.ui.showConsoleProgress", "false")
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
