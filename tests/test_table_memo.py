"""Per-session suite table registry (round 13): `_t` resolves each
(sf_dir, table) once per session — schema/pipeline metadata only, never
data — and the kill-switch restores per-call resolution for A/B runs.
Results must be identical either way."""

from __future__ import annotations

import os

from betfair_database_spark.suite import _t

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_memo_reuses_per_session_and_key(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_TABLE_MEMO", raising=False)
    a = _t(spark, SF_DIR, "lineitem")
    b = _t(spark, SF_DIR, "lineitem")
    assert a is b  # same session + key -> one resolved plan
    c = _t(spark, SF_DIR, "orders")
    assert c is not a  # different table -> different entry
    # the registry lives on the session object (dies with the session) and
    # is keyed by (sf_dir, name)
    assert (SF_DIR, "lineitem") in spark._bfdb_suite_tables


def test_memo_killswitch_and_result_parity(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_TABLE_MEMO", raising=False)
    memo_count = _t(spark, SF_DIR, "documents").count()
    memo_df = _t(spark, SF_DIR, "documents")
    monkeypatch.setenv("SPARK_GRAFT_NO_TABLE_MEMO", "1")
    fresh = _t(spark, SF_DIR, "documents")
    assert fresh is not memo_df  # kill-switch bypasses the registry
    assert fresh.count() == memo_count
    # identical rows, not just counts: the memo holds a lazy plan, so both
    # frames scan the same parquet and must agree exactly
    assert fresh.exceptAll(memo_df).count() == 0
    assert memo_df.exceptAll(fresh).count() == 0
