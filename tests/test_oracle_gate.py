"""The full local oracle gate as a pytest (VERDICT r4 item 10): every suite
query under Spark vs its DuckDB oracle at sf0.01, in one session.

Skipped by default (it takes ~4 min); run explicitly with

    python -m pytest -m oracle tests/test_oracle_gate.py

so a broken query family can never ship silently (round 3's `_events`
regression is the motivating incident).
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.oracle

REPO = Path(__file__).resolve().parents[1]


def test_full_oracle_gate():
    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    if not Path(sf_dir).exists():
        pytest.skip(f"no testdata at {sf_dir}")
    # Subprocess: the gate owns a full Spark session and ~4 minutes; keep it
    # out of the shared session the rest of the suite uses.
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_oracle.py"), sf_dir],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.replace("\r", "\n").splitlines()[-20:])
    assert proc.returncode == 0, f"oracle gate failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "\n0 failures: []" in proc.stdout.replace("\r", "\n")
