"""Python UDTF surface: LATERAL-join parsing of raw mcm lines in pure SQL,
agreement with the streaming reader's extraction, and poison-line safety."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def registered(spark):
    from betfair_database_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    return spark


def _line(market, pt, version=None, n_rc=0):
    mc = {"id": market}
    if version is not None:
        mc["marketDefinition"] = {"status": "OPEN", "version": version}
    if n_rc:
        mc["rc"] = [{"id": 100 + i, "ltp": 2.0} for i in range(n_rc)]
    return json.dumps({"op": "mcm", "pt": pt, "clk": "c", "mc": [mc]})


def test_lateral_join_sql(registered):
    spark = registered
    rows = [
        (_line("1.1", 1000, version=2),),
        (_line("1.2", 2000, n_rc=3),),
        ('{"op": "connection"}',),  # non-mcm -> no rows
        ("not json at all",),  # poison -> no rows
        (None,),
    ]
    spark.createDataFrame(rows, "value string").createOrReplaceTempView("raw")
    got = spark.sql(
        """
        SELECT p.marketId, p.pt, p.version, p.n_runner_changes
        FROM raw, LATERAL parse_mcm(raw.value) p
        ORDER BY p.marketId
        """
    ).collect()
    assert [(r.marketId, r.pt, r.version, r.n_runner_changes) for r in got] == [
        ("1.1", 1000, 2, 0),
        ("1.2", 2000, None, 3),
    ]


def test_multi_change_message(registered):
    spark = registered
    msg = json.dumps(
        {
            "op": "mcm",
            "pt": 5,
            "mc": [
                {"id": "1.9", "rc": [{"id": 1, "ltp": 3.0}]},
                {"id": "1.8", "marketDefinition": {"status": "CLOSED", "version": 7}},
                {"no_id": True},
            ],
        }
    )
    spark.createDataFrame([(msg,)], "value string").createOrReplaceTempView("raw2")
    got = spark.sql(
        "SELECT marketId, status FROM raw2, LATERAL parse_mcm(value) ORDER BY marketId"
    ).collect()
    assert [(r.marketId, r.status) for r in got] == [("1.8", "CLOSED"), ("1.9", None)]


def test_agrees_with_stream_reader(registered, tmp_path):
    """The UDTF and read_mcm_stream extract identical (marketId, pt) change
    rows from the same file."""
    from betfair_database_spark.streaming.mcm import read_mcm_stream, run_to_memory

    spark = registered
    lines = [
        _line("1.5", 10, version=1),
        _line("1.5", 20, n_rc=2),
        _line("1.6", 30, version=4),
    ]
    (tmp_path / "stream").mkdir()
    (tmp_path / "stream" / "f").write_text("\n".join(lines))

    run_to_memory(
        read_mcm_stream(spark, str(tmp_path / "stream")), "udtf_cmp", "append"
    )
    stream_rows = sorted(
        (r.marketId, r.pt) for r in spark.sql("SELECT * FROM udtf_cmp").collect()
    )
    spark.read.text(str(tmp_path / "stream")).createOrReplaceTempView("raw3")
    udtf_rows = sorted(
        (r.marketId, r.pt)
        for r in spark.sql("SELECT marketId, pt FROM raw3, LATERAL parse_mcm(value)").collect()
    )
    assert udtf_rows == stream_rows == [("1.5", 10), ("1.5", 20), ("1.6", 30)]
