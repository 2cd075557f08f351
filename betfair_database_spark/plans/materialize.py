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

from pyspark.sql import DataFrame

MODE_CONF = "spark.bfdb.materialize.mode"
CKPT_DIR_CONF = "spark.bfdb.checkpointDir"


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
    return df.checkpoint(eager=True)
