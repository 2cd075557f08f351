"""Cluster realism (round 11, verdict #1): the engine must survive
multi-JVM execution and executor loss, not just local[32].

Three layers:
- a mechanical audit: every lineage-cut site in package source either
  routes through plans.materialize (maintenance paths — switchable to
  reliable checkpoint for preemptible fleets) or carries an ``lc-ok:``
  annotation stating its recompute story (pure-compute / gate-scratch
  sites, where an executor loss fails the query and a rerun recomputes);
- unit behavior of the materialize switch itself;
- a REAL fault injection: scripts/cluster_fault_inject.py runs a full
  corpus insert() on local-cluster[2,2,1536] in reliable mode and
  SIGKILLs an executor JVM while the insert's jobs run — the insert
  must complete with the exact expected rows. (Subprocess: a second
  SparkContext cannot live inside the pytest JVM.)
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

import pytest

PKG = Path(__file__).resolve().parents[1] / "betfair_database_spark"


def test_every_localcheckpoint_site_is_audited():
    """No naked localCheckpoint in package source: maintenance sites go
    through plans.materialize (cluster-survivability switch); the rest
    must carry an ``lc-ok:`` recompute-story annotation on the line."""
    pat = re.compile(r"\.localCheckpoint\(")
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        if py.name == "materialize.py":
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if pat.search(line) and "lc-ok:" not in line:
                offenders.append(f"{py.relative_to(PKG)}:{i}: {line.strip()}")
    assert not offenders, (
        "unaudited localCheckpoint site(s) — route maintenance frames "
        "through plans.materialize.materialize, or annotate pure-compute "
        "sites with '# lc-ok: <recompute story>':\n" + "\n".join(offenders)
    )


def test_materialize_mode_switch(spark, tmp_path):
    from betfair_database_spark.plans.materialize import materialize

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    # default: localCheckpoint semantics (lineage cut, rows served)
    out = materialize(df, "unit")
    assert out.count() == 100
    # reliable without a checkpoint dir: loud, names the site
    try:
        spark.conf.set("spark.bfdb.materialize.mode", "reliable")
        if spark.sparkContext.getCheckpointDir() is None:
            with pytest.raises(ValueError, match="decision-frame"):
                materialize(df, "decision-frame")
        # reliable with a dir: checkpoints to it and serves the rows
        spark.conf.set("spark.bfdb.checkpointDir", str(tmp_path / "ckpt"))
        out = materialize(df, "unit-reliable")
        assert out.count() == 100
        assert spark.sparkContext.getCheckpointDir() is not None
        # unknown mode: loud
        spark.conf.set("spark.bfdb.materialize.mode", "replicated")
        with pytest.raises(ValueError, match="not a materialize mode"):
            materialize(df, "unit")
    finally:
        spark.conf.unset("spark.bfdb.materialize.mode")
        spark.conf.unset("spark.bfdb.checkpointDir")


def test_sweep_checkpoints_reaps_aged_dirs(spark, tmp_path):
    """Round-12 ADVICE: nothing reaped reliable checkpoints (Spark's
    ContextCleaner only does with cleanCheckpoints set at context start,
    and only on RDD GC), so a long-lived cluster's checkpoint dir grew
    without bound. sweep_checkpoints deletes rdd-* dirs older than the
    TTL across ALL context subdirs — dead contexts included — and reaps
    context dirs it empties; younger checkpoints are untouched."""
    import os
    import time

    from betfair_database_spark.plans import materialize as M

    root = tmp_path / "ckroot"
    aged = root / "dead-ctx" / "rdd-42"
    aged.mkdir(parents=True)
    (aged / "part-00000").write_text("x")
    fresh = root / "dead-ctx2" / "rdd-7"
    fresh.mkdir(parents=True)
    old = time.time() - 7 * 86400
    os.utime(aged, (old, old))
    try:
        spark.conf.set(M.CKPT_DIR_CONF, str(root))
        removed = M.sweep_checkpoints(spark, ttl_seconds=86400)
    finally:
        spark.conf.unset(M.CKPT_DIR_CONF)
    assert removed == 1
    assert not aged.exists()
    assert not (root / "dead-ctx").exists()  # emptied dead-context dir
    assert fresh.exists()  # younger than the TTL: kept


def test_materialize_reliable_triggers_throttled_sweep(
    spark, tmp_path, monkeypatch
):
    """Reliable-mode materialize runs the sweep opportunistically, at
    most once per sweep interval per driver process."""
    from betfair_database_spark.plans import materialize as M

    calls = []
    monkeypatch.setattr(M, "sweep_checkpoints", lambda s: calls.append(1))
    # -inf = "never swept": time.monotonic() counts from boot on Linux, so
    # a 0.0 sentinel only means "long ago" once the HOST has been up longer
    # than the sweep interval — this test used to fail on a freshly booted
    # box because now - 0.0 was still inside the throttle window.
    monkeypatch.setitem(M._SWEEP_STATE, "t", float("-inf"))
    df = spark.range(10)
    try:
        spark.conf.set(M.MODE_CONF, "reliable")
        spark.conf.set(M.CKPT_DIR_CONF, str(tmp_path / "ck"))
        assert M.materialize(df, "t1").count() == 10
        assert M.materialize(df, "t2").count() == 10  # within interval
    finally:
        spark.conf.unset(M.MODE_CONF)
        spark.conf.unset(M.CKPT_DIR_CONF)
    assert len(calls) == 1


def test_insert_survives_executor_kill_on_local_cluster():
    """The verdict-#1 fault injection: SIGKILL an executor JVM while a
    reliable-mode insert runs on a real multi-JVM cluster; the insert
    completes with the exact corpus row count. ~2-3 min (worker JVM
    startup + corpus ETL)."""
    script = PKG.parents[0] / "scripts" / "cluster_fault_inject.py"
    r = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=str(PKG.parents[0]),
    )
    tail = (r.stdout + r.stderr)[-2000:]
    assert r.returncode == 0, tail
    assert "FAULT-INJECTION OK" in r.stdout, tail
