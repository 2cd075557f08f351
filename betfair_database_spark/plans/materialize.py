"""Lineage-cutting materialization with a cluster-survivability switch.

Round 11 (verdict #1): the engine cuts lineage at ~76 sites — decision
joins, rollup replacement frames, ANN id-frames, iterative-round
carriers. All of them used ``localCheckpoint()``, which stores blocks on
EXECUTORS with the lineage truncated: on a real cluster an executor loss
mid-query makes the job unrecoverable, and on preemptible 100-TB-scale
fleets that is the common case, not the corner. ``local[32]`` never
surfaces this.

Every MAINTENANCE-path site (etl, inserts, rollup, database, streaming
ingest, ANN lifecycle) now routes through :func:`materialize`, switched
by ``spark.bfdb.materialize.mode``:

- ``local`` (default): ``df.localCheckpoint()`` — the single-box fast
  path. Blocks die with their executor; acceptable when the process IS
  the cluster (local mode) or when a failed maintenance job is simply
  re-run (every maintenance op here is crash-atomic: a failed job never
  commits, so the cost of an executor loss is a retry, never
  corruption).
- ``reliable``: ``df.checkpoint(eager=True)`` — blocks go to the
  SparkContext checkpoint directory (set it to durable shared storage:
  HDFS/S3A/NFS), so maintenance survives executor loss and task retry
  re-reads instead of recomputing. The checkpoint dir is taken from
  ``spark.bfdb.checkpointDir`` on first use if the context has none;
  ``materialize`` raises loudly when neither is set — a half-configured
  fleet must not silently fall back to executor-local blocks.

Why not ``persist(MEMORY_AND_DISK_2)``: replicated persist keeps the
frame registered in Spark's CacheManager keyed by its LOGICAL PLAN, and
this engine routinely re-creates identical plans over paths it has since
rewritten (the documented localCheckpoint-over-cache rule, see
README/verify notes) — a replicated cache would serve pre-rewrite data
to a post-rewrite read. Reliable checkpoint truncates the plan like
localCheckpoint does, so it composes with the rewrite protocol; the only
cost is a write to the checkpoint FS, which is maintenance-sized, not
corpus-sized, at every call site.

COMPUTE-path sites (graph/dedup/sampling iteration carriers, gate-row
scratch frames) keep ``localCheckpoint`` with a per-site ``# lc-ok:``
annotation stating the recompute story; ``tests/test_cluster.py``
mechanically enforces that every remaining site is either this module
or carries the annotation.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

MODE_CONF = "spark.bfdb.materialize.mode"
CKPT_DIR_CONF = "spark.bfdb.checkpointDir"
# Reliable checkpoints are only reaped by Spark's ContextCleaner when
# spark.cleaner.referenceTracking.cleanCheckpoints=true was set at
# CONTEXT construction (and then only on RDD GC) — a long-lived cluster
# running dozens of materialize sites per maintenance op otherwise grows
# the checkpoint directory without bound (round-12 ADVICE). The engine
# therefore sweeps aged checkpoint data itself: any rdd-* dir older than
# the TTL predates every live maintenance op by construction (maintenance
# frames live minutes, not days) and is garbage regardless of which
# (possibly dead) SparkContext wrote it.
SWEEP_TTL_CONF = "spark.bfdb.checkpoint.ttlSeconds"  # default 1 day
SWEEP_INTERVAL_CONF = "spark.bfdb.checkpoint.sweepIntervalSeconds"
# Monotonic time of the last sweep (throttle). -inf = never swept, so the
# first reliable materialize of a driver process always sweeps: monotonic()
# counts from BOOT on Linux, and a 0.0 sentinel silently suppressed the
# first sweep for the first sweepInterval seconds of host uptime.
_SWEEP_STATE = {"t": float("-inf")}


def materialize(df: DataFrame, role: str = "intermediate") -> DataFrame:
    """Cut lineage and pin a frame the engine will re-use across jobs
    (and, for maintenance, across the files it is about to rewrite).

    ``role`` is a short human label ("decision-join", "replacement-
    frame", "ann-ids", ...) surfaced in error messages so a
    misconfigured cluster names the site that tripped."""
    spark = df.sparkSession
    try:
        mode = str(spark.conf.get(MODE_CONF, "local")).lower()
    except Exception:
        mode = "local"
    if mode in ("local", ""):
        return df.localCheckpoint()  # lc-ok: the mode explicitly asks for it
    if mode != "reliable":
        raise ValueError(
            f"{MODE_CONF}={mode!r} is not a materialize mode "
            "(expected 'local' or 'reliable')"
        )
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        ckpt = spark.conf.get(CKPT_DIR_CONF, "")
        if not ckpt:
            raise ValueError(
                f"{MODE_CONF}=reliable needs a checkpoint directory: set "
                f"{CKPT_DIR_CONF} (durable shared storage) or call "
                f"sparkContext.setCheckpointDir — refusing to fall back "
                f"to executor-local blocks for {role!r}"
            )
        sc.setCheckpointDir(ckpt)
    out = df.checkpoint(eager=True)
    _maybe_sweep(spark)
    return out


def _maybe_sweep(spark) -> None:
    """Throttled aged-checkpoint sweep in reliable mode — at most one
    sweep per ``SWEEP_INTERVAL_CONF`` seconds (default 600; 0 disables)
    per driver process. Sweep trouble never fails the maintenance op."""
    try:
        interval = float(spark.conf.get(SWEEP_INTERVAL_CONF, "600") or 0)
    except Exception:
        interval = 600.0
    if interval <= 0:
        return
    now = time.monotonic()
    if now - _SWEEP_STATE["t"] < interval:
        return
    _SWEEP_STATE["t"] = now
    try:
        sweep_checkpoints(spark)
    except Exception:
        pass


def sweep_checkpoints(spark, ttl_seconds: "float | None" = None) -> int:
    """Delete reliable-checkpoint ``rdd-*`` directories older than the
    TTL (default ``SWEEP_TTL_CONF`` = 86400 s), across ALL context
    subdirectories of the configured checkpoint root — dead contexts
    (each SparkContext checkpoints under its own UUID subdir) leave
    their garbage behind forever otherwise. Foreign context dirs left
    empty by the reap are removed too. Uses the Hadoop FileSystem of the
    checkpoint path, so the sweep works on HDFS/S3A exactly like the
    local FS. Returns the number of rdd dirs deleted.

    Safety: the TTL must dwarf the longest maintenance op (materialize
    frames are consumed within the op that created them, minutes at
    most); anything older is unreferenced by every LIVE job regardless
    of which driver wrote it. The current context's fresh checkpoints
    are always younger than the TTL and untouched."""
    sc = spark.sparkContext
    cur = sc.getCheckpointDir()
    root = spark.conf.get(CKPT_DIR_CONF, "") or None
    if ttl_seconds is None:
        try:
            ttl_seconds = float(spark.conf.get(SWEEP_TTL_CONF, "86400"))
        except ValueError:
            ttl_seconds = 86400.0
    jvm = spark._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    if root is not None:
        base = HPath(root)
    elif cur is not None:
        base = HPath(cur).getParent()
    else:
        return 0
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(base):
        return 0
    cutoff_ms = (time.time() - ttl_seconds) * 1000.0
    cur_uri = HPath(cur).toUri().getPath() if cur is not None else None
    removed = 0
    for ctx in fs.listStatus(base):
        if not ctx.isDirectory():
            continue
        ctx_path = ctx.getPath()
        live = 0
        for child in fs.listStatus(ctx_path):
            name = child.getPath().getName()
            if (
                child.isDirectory()
                and name.startswith("rdd-")
                and child.getModificationTime() < cutoff_ms
            ):
                fs.delete(child.getPath(), True)
                removed += 1
            else:
                live += 1
        if live == 0 and ctx_path.toUri().getPath() != cur_uri:
            fs.delete(ctx_path, True)  # emptied dead-context dir
    return removed
