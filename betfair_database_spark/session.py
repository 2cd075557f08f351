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
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
