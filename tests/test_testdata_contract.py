"""Schema-drift guard for the driver-generated testdata.

The suite's queries (and their DuckDB oracles) encode assumptions about
`/root/testdata/sf*/\\*.parquet` — column names, types, and the handful of
layout details the driver environment has silently changed before (round 3:
`events.ts` moved from nanosecond to microsecond parquet timestamps and
broke 9 queries at the driver gate). This test pins those assumptions so
the NEXT silent testdata change fails loudly in pytest, where it's cheap,
instead of in the driver's correctness gate, where it costs a round.

Columns the suite touches are asserted exactly; extra columns the driver
may add are tolerated (the suite always selects explicitly).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.01")

# column -> pyarrow type string; values the suite/oracles genuinely depend on.
# `ts`/timestamp columns accept either vintage the suite knows how to load
# (see suite._events): raw int64 nanos or a native parquet timestamp.
_TIMESTAMP_OK = {"timestamp[us]", "timestamp[ns]", "timestamp[ms]", "int64"}

EXPECTED: dict[str, dict[str, set[str] | str]] = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": _TIMESTAMP_OK,
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": _TIMESTAMP_OK,
    },
    "events": {
        "event_id": "int64",
        "ts": _TIMESTAMP_OK,
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_matches_suite_assumptions(table):
    path = f"{SF_DIR}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} not present in this environment")
    schema = pq.read_schema(path)
    actual = {name: str(schema.field(name).type) for name in schema.names}
    for col, want in EXPECTED[table].items():
        assert col in actual, (
            f"{table}.parquet lost column {col!r} the suite depends on "
            f"(has: {sorted(actual)})"
        )
        allowed = want if isinstance(want, set) else {want}
        assert actual[col] in allowed, (
            f"{table}.{col} changed type: {actual[col]!r} not in {allowed} — "
            "audit suite.py loaders (_t/_events) and every oracle touching it"
        )


def test_events_ts_loads_as_ntz_or_long(spark):
    """_events must normalize ts to TIMESTAMP_NTZ whatever the vintage."""
    path = f"{SF_DIR}/events.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} not present in this environment")
    from pyspark.sql.types import TimestampNTZType

    from betfair_database_spark.suite import _events

    df = _events(spark, SF_DIR)
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType), (
        f"_events produced {df.schema['ts'].dataType}; every event-family "
        "query assumes NTZ wall-clock"
    )
