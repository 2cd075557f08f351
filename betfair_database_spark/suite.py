"""Operator showcase suite: every SURVEY §2 operator family expressed over the
driver's synthetic tables, each with an exact ANSI-SQL oracle for the DuckDB
correctness harness (__spark_entry__.queries / oracle_sql).

Conventions for engine-independent hash matching:
  - every double is round()ed identically on both sides;
  - integer sums are CAST to BIGINT in the oracle (DuckDB sums ints to
    HUGEINT, Spark to LONG);
  - timestamps are rendered to strings (date_format / strftime);
  - LIMIT queries carry a total ORDER BY (value, then id) on both sides;
  - aggregate/computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from betfair_database_spark.operators import asof, dedup, similarity, textstats
from betfair_database_spark.plans.dialect import (
    register_sqlite_functions,
    translate_where,
)


_ID_COLS = {"documents": "doc_id", "embeddings": "vec_id"}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Set the parquet-reader confs BEFORE ANY table read, not lazily inside
    # the events loader: inferTimestampNTZ changes how every tz-naive
    # timestamp column in the suite is surfaced, so setting it mid-session
    # would make results depend on whether an events query ran first
    # (order-dependent reads under a non-UTC driver session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    # Per-SESSION table registry (round 13, guide §1.2/§6): every
    # `spark.read.parquet` call re-resolves the datasource and re-infers
    # the schema from the footer — measured 0.14-0.21 s PER CALL on this
    # box, paid by every query build (the suite's per-query floor). A
    # metastore deployment pays this once at CREATE TABLE; this registry
    # is the same idea session-scoped — the memo holds the LAZY DataFrame
    # (logical plan + pinned schema), never data: every action still
    # scans the parquet files, so nothing is precomputed across runs. The
    # fixture dirs are immutable while a session is alive (suite queries
    # write only to tempdirs); the registry dies with the session.
    # SPARK_GRAFT_NO_TABLE_MEMO exists for A/B measurement only.
    import os as _os

    if _os.environ.get("SPARK_GRAFT_NO_TABLE_MEMO"):
        return _t_build(spark, sf_dir, name)
    # Thread-safety (round 14, ADVICE): the threaded recall builds call _t
    # concurrently. The get-then-set race is benign under the GIL (frames
    # are deterministic, last write wins), but setdefault makes the memo
    # single-assignment by construction — losers build a duplicate frame
    # once and discard it; no lock needed on this read-mostly path.
    try:
        memo = spark._bfdb_suite_tables
    except AttributeError:
        memo = spark.__dict__.setdefault("_bfdb_suite_tables", {})
    key = (sf_dir, name)
    df = memo.get(key)
    if df is None:
        df = memo.setdefault(key, _t_build(spark, sf_dir, name))
    return df


def _t_build(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _ID_COLS:
        # these small single-row-group tables feed CPU-heavy per-row
        # operators (md5 shingling, regex stats, array math) — spread them
        # across cores; scans/aggs on the big tables stay shuffle-free
        df = dedup.spread(df, _ID_COLS[name])
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet tolerating either testdata vintage of ``ts``.

    The driver has shipped this column two ways across rounds: as a
    nanosecond parquet timestamp (which Spark's vectorized reader can only
    surface as raw int64 nanos via ``nanosAsLong``) and as a native
    ``timestamp[us]`` (which Spark 4 reads as TIMESTAMP_NTZ directly).
    Branch on the dtype Spark actually observed rather than pinning either
    layout, so a silent testdata change degrades to a no-op instead of a
    DATATYPE_MISMATCH across the whole event-query family.
    """
    # reader confs are applied by _t before any read (see _t)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if not isinstance(ts_type, LongType):
        # native parquet timestamp: already micros wall-clock. Normalize LTZ
        # to NTZ (cast is a wall-clock reinterpretation, timezone-free) so
        # downstream date_format output can't depend on the driver's session
        # timezone, which is not ours to configure.
        if isinstance(ts_type, TimestampNTZType):
            return df
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    # legacy raw-nanos layout: epoch-micros → NTZ by pure arithmetic on an
    # NTZ base — no LTZ hop, identical under ANY session timezone
    return df.withColumn(
        "ts",
        F.expr(
            "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ),
    )


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


SUITE: dict[str, QuerySpec] = {}


def _q(name: str, oracle: str | None):
    def deco(fn):
        SUITE[name] = QuerySpec(fn, oracle)
        return fn

    return deco


# =========================================================================
# Flagship: TPC-H Q1-style pricing summary (scan + filter + hash aggregate)
# =========================================================================


@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf):
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@_q(
    "q5_supplier_volume",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('EUROPE', 'ASIA')
    GROUP BY n.n_name
    """,
)
def q5_supplier_volume(spark, sf):
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").where(F.col("r_name").isin("EUROPE", "ASIA"))
    o = _t(spark, sf, "orders")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "q4_exists_semijoin",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_exists_semijoin(spark, sf):
    """TPC-H Q4 shape: correlated EXISTS → left-semi hash join (one shuffle,
    no decorrelation gymnastics; Catalyst plans EXISTS the same way)."""
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf, "lineitem").where(F.col("l_discount") > 0.05)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_q(
    "q16_notin_distinct_suppliers",
    """
    SELECT p_brand, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_size >= 25
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand ORDER BY supplier_cnt DESC, p_brand
    """,
)
def q16_notin_distinct_suppliers(spark, sf):
    """TPC-H Q16 shape: NOT IN over a non-null key = left-anti join (the
    exclusion set is tiny → broadcast), then distinct-count per brand."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").where(F.col("p_size") >= 25)
    bad = _t(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy("p_brand")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"))
    )


@_q(
    "q22_scalar_subquery_anti",
    """
    WITH avg_bal AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_mktsegment ORDER BY segment
    """,
)
def q22_scalar_subquery_anti(spark, sf):
    """TPC-H Q22 shape: scalar aggregate subquery (1-row broadcast cross
    join — never a driver collect) + NOT EXISTS anti join."""
    c = _t(spark, sf, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    o = (
        _t(spark, sf, "orders")
        .where(
            F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("segment")
    )


@_q(
    "skew_salted_join_agg",
    """
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def skew_salted_join_agg(spark, sf):
    """The fact-fact join routed through the salted-join operator: hot order
    keys fan out across n_salts reducers; the result is provably identical
    to the plain join (that IS the oracle)."""
    from betfair_database_spark.operators.skew import salted_join

    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    return (
        salted_join(li, o, "l_orderkey", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@_q(
    "agg_percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 2) AS p95
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentiles(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p95"),
        )
    )


@_q(
    "pivot_event_types",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'view')     AS view,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_event_types(spark, sf):
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


# =========================================================================
# P: projection / filter / predicate surface (SURVEY §2.2)
# =========================================================================


@_q(
    "p1_projection",
    "SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total FROM orders",
)
def p1_projection(spark, sf):
    return _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("total")
    )


@_q(
    "p2_filter_eq_and",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
    """,
)
def p2_filter_eq_and(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .where((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F"))
        .select(
            "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
        )
    )


@_q(
    "p3_or_in",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') OR c_acctbal < 0
    """,
)
def p3_or_in(spark, sf):
    return (
        _t(spark, sf, "customer")
        .where(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            | (F.col("c_acctbal") < 0)
        )
        .select("c_custkey", "c_mktsegment")
    )


@_q(
    "p4_between",
    """
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
    """,
)
def p4_between(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .where(
            F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("1996-12-31 00:00:00").cast("timestamp_ntz"),
            )
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


@_q(
    "p5_not_and_null",
    """
    SELECT o_orderkey FROM orders
    WHERE NOT (o_orderstatus = 'O') AND nullif(o_orderpriority, '1-URGENT') IS NOT NULL
    """,
)
def p5_not_and_null(spark, sf):
    return (
        _t(spark, sf, "orders")
        .where(
            (~(F.col("o_orderstatus") == "O"))
            & F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).isNotNull()
        )
        .select("o_orderkey")
    )


@_q(
    "p7_bool_literal_shim",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE CAST(l_discount > 0.05 AS INT) = 1
    """,
)
def p7_bool_literal_shim(spark, sf):
    # exercises the SQLite true/false literal rewrite end to end
    _t(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    where = translate_where("CAST(l_discount > 0.05 AS INT) = true")
    return spark.sql(f"SELECT l_orderkey, l_linenumber FROM lineitem_v WHERE {where}")


@_q(
    "p8_strftime_time_shim",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%m') AS order_month
    FROM orders
    WHERE strftime(o_orderdate, '%m') = '03' AND strftime(o_orderdate, '%H:%M:%S') = '00:00:00'
    """,
)
def p8_strftime_time_shim(spark, sf):
    # SQLite-dialect strftime()/time() through the select() surface: the
    # predicate AND the projected month both go through translate_where
    # (round 7: the segmented emitter keeps the whole stage inside one
    # compiled WholeStageCodegen — the generic macro in the SELECT list
    # used to push the shared stage method past the JVM's 64 KB limit).
    # No repartition: Catalyst pushes the filter to the scan (the right
    # plan at 100 TB — filter early, and real tables arrive in many
    # splits); the remaining bench cost is the single-split scan running
    # the 4-parse predicate serially, priced in PLANS.md.
    register_sqlite_functions(spark)
    _t(spark, sf, "orders").createOrReplaceTempView("orders_v")
    where = translate_where(
        "strftime('%m', o_orderdate) = '03' AND time(o_orderdate) == '00:00:00'"
    )
    month = translate_where("strftime('%m', o_orderdate)", projection=True)
    return spark.sql(
        f"SELECT o_orderkey, ({month}) AS order_month "
        f"FROM orders_v WHERE {where}"
    )


@_q(
    "p9_limit_topk",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def p9_limit_topk(spark, sf):
    return (
        _t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .limit(10)
    )


# =========================================================================
# J: joins (SURVEY §2.3)
# =========================================================================


@_q(
    "j1_inner_join",
    """
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def j1_inner_join(spark, sf):
    o = _t(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    c = _t(spark, sf, "customer")
    return o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_name", "c_mktsegment"
    )


@_q(
    "j2_left_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j2_left_anti(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "j3_left_semi",
    """
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
    """,
)
def j3_left_semi(spark, sf):
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem").where(F.col("l_quantity") > 45)
    return p.join(li, p["p_partkey"] == li["l_partkey"], "left_semi").select(
        "p_partkey", "p_name"
    )


@_q(
    "j5_broadcast_dim_enrich",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation, r.r_name AS region
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def j5_broadcast_dim_enrich(spark, sf):
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            "s_suppkey", "s_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region")
        )
    )


@_q(
    "j4_nonequi_join",
    """
    SELECT l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
    """,
)
def j4_nonequi_join(spark, sf):
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") <= F.expr("o_orderdate + INTERVAL 7 DAY"))
        .select("l_orderkey", "l_linenumber")
    )


# =========================================================================
# A: aggregations (SURVEY §2.4)
# =========================================================================


@_q(
    "a1_global_aggs",
    """
    SELECT count(*) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           round(sum(l_quantity), 2) AS total_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
)
def a1_global_aggs(spark, sf):
    return _t(spark, sf, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@_q(
    "a2_last_per_group",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def a2_last_per_group(spark, sf):
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
    )


@_q(
    "a3_group_having",
    """
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey HAVING count(*) > 12
    """,
)
def a3_group_having(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .where(F.col("n_orders") > 12)
    )


@_q(
    "a5_array_length",
    "SELECT vec_id, CAST(len(embedding) AS INT) AS dim FROM embeddings",
)
def a5_array_length(spark, sf):
    return _t(spark, sf, "embeddings").select(
        "vec_id", F.size("embedding").alias("dim")
    )


@_q(
    "agg_rollup",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n",
        )
    )


# =========================================================================
# W: windows / top-k per group / set ops (SURVEY §2.5)
# =========================================================================


@_q(
    "w1_topk_per_group",
    """
    SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS total
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def w1_topk_per_group(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@_q(
    "w2_running_sum",
    """
    SELECT event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_value
    FROM events
    """,
)
def w2_running_sum(spark, sf):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf, "events").select(
        "event_id", F.round(F.sum("value").over(w), 2).alias("running_value")
    )


@_q(
    "w3_lag_lead_ntile",
    """
    SELECT event_id,
           round(value - lag(value) OVER w, 4)  AS delta_prev,
           round(lead(value) OVER w - value, 4) AS delta_next,
           ntile(4) OVER w                      AS quartile,
           round(first_value(value) OVER w, 4)  AS first_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w3_lag_lead_ntile(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return _t(spark, sf, "events").select(
        "event_id",
        F.round(v - F.lag(v).over(w), 4).alias("delta_prev"),
        F.round(F.lead(v).over(w) - v, 4).alias("delta_next"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.first(v).over(w), 4).alias("first_val"),
    )


@_q(
    "set_ops_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_ops_except(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct) semantics, matching the oracle


# =========================================================================
# F: scalar functions (SURVEY §2.6)
# =========================================================================


@_q(
    "f6_regex_extract",
    """
    SELECT regexp_extract(o_orderpriority, '(\\d+)', 1) AS priority_num,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def f6_regex_extract(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy(
            F.regexp_extract("o_orderpriority", r"(\d+)", 1).alias("priority_num")
        )
        .agg(F.count("*").alias("n"))
    )


@_q(
    "f7_composite_key",
    """
    SELECT concat_ws(',', CAST(c_nationkey AS VARCHAR), c_mktsegment) AS grp_key,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
)
def f7_composite_key(spark, sf):
    return (
        _t(spark, sf, "customer")
        .groupBy(
            F.concat_ws(",", F.col("c_nationkey").cast("string"), "c_mktsegment").alias(
                "grp_key"
            )
        )
        .agg(F.count("*").alias("n"))
    )


@_q(
    "f11_partition_path",
    """
    SELECT strftime(o_orderdate, '%Y/%b/') || CAST(day(o_orderdate) AS VARCHAR)
             || '/' || CAST(o_custkey AS VARCHAR) AS dest_dir,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def f11_partition_path(spark, sf):
    # the betfair_historical import-pattern shape (reference imports.py:12-39)
    path = F.concat(
        F.date_format("o_orderdate", "yyyy/MMM/"),
        F.dayofmonth("o_orderdate").cast("string"),
        F.lit("/"),
        F.col("o_custkey").cast("string"),
    )
    return (
        _t(spark, sf, "orders")
        .groupBy(path.alias("dest_dir"))
        .agg(F.count("*").alias("n"))
    )


@_q(
    "f12_json_access",
    """
    SELECT event_type, round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def f12_json_access(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.round(
                F.avg(F.get_json_object("props", "$.k").cast("int")), 4
            ).alias("avg_k")
        )
    )


@_q(
    "f5_weekday_name",
    """
    SELECT strftime(ts, '%A') AS weekday, count(*) AS n
    FROM events GROUP BY 1
    """,
)
def f5_weekday_name(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy(F.date_format("ts", "EEEE").alias("weekday"))
        .agg(F.count("*").alias("n"))
    )


# =========================================================================
# Events / time-series (windowed agg, sessionize, as-of — SURVEY §2.9 ext)
# =========================================================================


@_q(
    "ev_hourly_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def ev_hourly_window(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@_q(
    "ev_sessionize",
    """
    SELECT user_id, CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id,
             sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               date_diff('second',
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         ts) AS gap_s
        FROM events
      )
    ) GROUP BY user_id
    """,
)
def ev_sessionize(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NTZ → epoch seconds without an LTZ hop (session-timezone independent);
    # truncating each side to the second before differencing equals DuckDB's
    # date_diff('second', ...) boundary count
    secs = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', date_trunc('second', ts))"
    )
    gap = secs - F.lag(secs).over(w)
    return (
        _t(spark, sf, "events")
        .withColumn("gap_s", gap)
        .withColumn(
            "session_id",
            F.sum(
                F.when(F.col("gap_s").isNull() | (F.col("gap_s") > 1800), 1).otherwise(0)
            ).over(wall),
        )
        .groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n_sessions"))
    )


@_q(
    "asof_join_last_order",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           r.o_orderkey AS last_order_key,
           strftime(r.o_orderdate, '%Y-%m-%d') AS last_order_date
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
)
def asof_join_last_order(spark, sf):
    ev = _t(spark, sf, "events").select("event_id", "user_id", "ts")
    r = (
        _t(spark, sf, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumn("o_orderdate_str", F.date_format("o_orderdate", "yyyy-MM-dd"))
    )
    joined = asof.asof_join(
        ev.withColumn("_ts", F.col("ts").cast("timestamp_ntz")),
        r.withColumn("o_custkey2", F.col("o_custkey")).drop("o_custkey")
        .withColumnRenamed("o_custkey2", "user_id"),
        on="user_id",
        left_ts="_ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate_str"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_orderdate_str").alias("last_order_date"),
    )


def _asof_inputs(spark, sf):
    ev = _t(spark, sf, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("_ts")
    )
    r = (
        _t(spark, sf, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    return ev, r


@_q(
    "asof_join_next_order",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           r.o_orderkey AS next_order_key,
           strftime(r.o_orderdate, '%Y-%m-%d') AS next_order_date
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate
    """,
)
def asof_join_next_order(spark, sf):
    """Forward as-of: each event gains the EARLIEST order at-or-after it."""
    ev, r = _asof_inputs(spark, sf)
    joined = asof.asof_join(
        ev,
        r.withColumn("o_orderdate_str", F.date_format("o_orderdate", "yyyy-MM-dd")),
        on="user_id",
        left_ts="_ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate_str"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_order_key"),
        F.col("o_orderdate_str").alias("next_order_date"),
    )


@_q(
    "asof_join_nearest_order",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    b AS (
      SELECT e.event_id, e.user_id, e.ts,
             r.o_orderkey AS bk, r.o_orderdate AS bts
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    ),
    f AS (
      SELECT e.event_id, r.o_orderkey AS fk, r.o_orderdate AS fts
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate
    )
    SELECT b.event_id, b.user_id,
           CASE WHEN bts IS NULL OR (fts IS NOT NULL AND (fts - ts) < (ts - bts))
                THEN fk ELSE bk END AS near_order_key
    FROM b JOIN f USING (event_id)
    """,
)
def asof_join_nearest_order(spark, sf):
    """Nearest as-of: the closer of the two directions, backward on ties —
    one shuffle, both window frames over the same hash partitioning."""
    ev, r = _asof_inputs(spark, sf)
    joined = asof.asof_join(
        ev,
        r,
        on="user_id",
        left_ts="_ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
        direction="nearest",
    )
    return joined.select(
        "event_id", "user_id", F.col("o_orderkey").alias("near_order_key")
    )


# =========================================================================
# Dedup (SURVEY §2.11)
# =========================================================================


@_q(
    "dedup_exact_stats",
    """
    SELECT count(*) AS n_docs,
           CAST(count(DISTINCT md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS BIGINT) AS n_unique
    FROM documents
    """,
)
def dedup_exact_stats(spark, sf):
    d = _t(spark, sf, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(dedup.normalized_text(F.col("text")))).alias("n_unique"),
    )


_MINHASH_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
                               i -> substr(lower(text), CAST(i AS INT), 5))) AS w
  FROM documents
),
tx AS (
  SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS x FROM tok
),
mh AS (
  SELECT doc_id, s, min((a * x + b) % {dedup.MINHASH_P}) AS h
  FROM tx, (VALUES {dedup.minhash_oracle_values(16)}) t(s, a, b)
  GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, CAST(s // 8 AS INT) AS band,
         md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY s)) AS bh
  FROM mh GROUP BY doc_id, s // 8
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
),
wc AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c JOIN tok ta ON ta.doc_id = c.a JOIN tok tb ON tb.doc_id = c.b AND tb.w = ta.w
  GROUP BY c.a, c.b
)
SELECT i.a, i.b, round(CAST(i.i AS DOUBLE) / (wa.n + wb.n - i.i), 4) AS jaccard
FROM inter i JOIN wc wa ON wa.doc_id = i.a JOIN wc wb ON wb.doc_id = i.b
WHERE CAST(i.i AS DOUBLE) / (wa.n + wb.n - i.i) >= 0.8
"""


@_q("dedup_minhash_pairs", _MINHASH_ORACLE)
def dedup_minhash_pairs(spark, sf):
    return dedup.minhash_near_dups(
        _t(spark, sf, "documents"), num_hashes=16, bands=2, threshold=0.8
    )


# Same pipeline with the production exact-collapse pre-pass: the oracle is
# the minhash oracle computed over one representative per normalized text
# (min doc_id, that doc's text) instead of the raw table.
_MINHASH_COLLAPSED_ORACLE = _MINHASH_ORACLE.replace(
    "FROM documents", "FROM rep"
).replace(
    "WITH tok AS (",
    """WITH rep AS (
  SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text
  FROM documents
  GROUP BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
),
tok AS (""",
)


@_q("dedup_minhash_collapsed", _MINHASH_COLLAPSED_ORACLE)
def dedup_minhash_collapsed(spark, sf):
    """Exact-collapse → MinHash-LSH: the scale ordering (near-dup stage
    bounded by unique texts; identical-replica clusters never reach the
    band join — see minhash_near_dups(collapse_exact=True))."""
    return dedup.minhash_near_dups(
        _t(spark, sf, "documents"),
        num_hashes=16,
        bands=2,
        threshold=0.8,
        collapse_exact=True,
    )


_SIMHASH_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
                               i -> substr(lower(text), CAST(i AS INT), 5))) AS w
  FROM documents
),
h AS (SELECT doc_id, md5(w) AS hh FROM tok),
bits AS (
  SELECT doc_id, j,
         CASE WHEN sum(CASE WHEN substr(hh, j, 1) IN ('8','9','a','b','c','d','e','f')
                            THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END AS bit
  FROM h, range(1, 17) t(j) GROUP BY doc_id, j
)
SELECT doc_id, string_agg(bit, '' ORDER BY j) AS simhash
FROM bits GROUP BY doc_id
"""


@_q("dedup_simhash_fingerprints", _SIMHASH_ORACLE)
def dedup_simhash_fingerprints(spark, sf):
    d = _t(spark, sf, "documents")
    return dedup.simhash16(dedup.shingles(d, "doc_id", "text", 5), "doc_id")


_NGRAM_JACCARD_ORACLE = """
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS w FROM docs
),
wc AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT ta.doc_id AS a, tb.doc_id AS b, count(*) AS i
  FROM tok ta JOIN tok tb ON ta.w = tb.w AND ta.doc_id < tb.doc_id
  GROUP BY ta.doc_id, tb.doc_id
)
SELECT a, b, round(CAST(i.i AS DOUBLE) / (wa.n + wb.n - i.i), 4) AS jaccard
FROM inter i JOIN wc wa ON wa.doc_id = i.a JOIN wc wb ON wb.doc_id = i.b
ORDER BY jaccard DESC, a, b LIMIT 20
"""


@_q("dedup_ngram_jaccard_top20", _NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard_top20(spark, sf):
    d = _t(spark, sf, "documents").where(F.col("doc_id") < 50)
    tok = dedup.tokens(d, "doc_id", "text")
    pairs = (
        tok.alias("ta")
        .join(
            tok.alias("tb"),
            (F.col("ta.w") == F.col("tb.w")) & (F.col("ta.doc_id") < F.col("tb.doc_id")),
        )
        .groupBy(F.col("ta.doc_id").alias("a"), F.col("tb.doc_id").alias("b"))
        .agg(F.count("*").alias("i"))
    )
    counts = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    j = (
        pairs.join(counts.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(counts.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")), 4
            ).alias("jaccard"),
        )
    )
    return j.orderBy(F.desc("jaccard"), "a", "b").limit(20)


_EMB_NEARDUP_ORACLE = """
WITH e AS (SELECT vec_id, label, embedding FROM embeddings WHERE label = 0),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b, a.embedding AS va, b.embedding AS vb
  FROM e a JOIN e b ON a.vec_id < b.vec_id
),
scored AS (
  SELECT a, b,
         round(sum(CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE))
               / (sqrt(sum(CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)))
                  * sqrt(sum(CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)))), 4) AS cos_sim
  FROM pairs, range(1, 65) t(i) GROUP BY a, b, va, vb
)
SELECT a, b, cos_sim FROM scored ORDER BY cos_sim DESC, a, b LIMIT 10
"""


@_q("dedup_embedding_cosine_top10", _EMB_NEARDUP_ORACLE)
def dedup_embedding_cosine_top10(spark, sf):
    e = _t(spark, sf, "embeddings").where(F.col("label") == 0)
    pairs = similarity.embedding_near_dup_pairs(e, threshold=-1.0, block_col="label")
    return pairs.orderBy(F.desc("cos_sim"), "a", "b").limit(10)


# =========================================================================
# Similarity search (SURVEY §2.11)
# =========================================================================

_KNN_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         round(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))), 4) AS cos_sim
  FROM embeddings e, q, range(1, 65) t(i)
  GROUP BY e.vec_id
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


def _query_vec(spark, sf) -> list[float]:
    row = (
        _t(spark, sf, "embeddings").where(F.col("vec_id") == 0).select("embedding").first()
    )
    return [float(v) for v in row[0]]


@_q("knn_cosine_top10", _KNN_ORACLE)
def knn_cosine_top10(spark, sf):
    return similarity.cosine_topk(_t(spark, sf, "embeddings"), _query_vec(spark, sf), 10)


_KNN_LSH_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
bucketed AS (
  SELECT e.vec_id, e.embedding,
         (SELECT string_agg(CASE WHEN e.embedding[i] >= 0 THEN '1' ELSE '0' END, '' ORDER BY i)
          FROM range(1, 9) t(i)) AS bucket
  FROM embeddings e
),
qb AS (
  SELECT (SELECT string_agg(CASE WHEN q.qe[i] >= 0 THEN '1' ELSE '0' END, '' ORDER BY i)
          FROM range(1, 9) t(i)) AS bucket
  FROM q
),
scored AS (
  SELECT b.vec_id,
         round(sum(CAST(b.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
               / (sqrt(sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))), 4) AS cos_sim
  FROM bucketed b, q, qb, range(1, 65) t(i)
  WHERE b.bucket = qb.bucket
  GROUP BY b.vec_id
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


@_q("knn_lsh_bucket_top10", _KNN_LSH_ORACLE)
def knn_lsh_bucket_top10(spark, sf):
    return similarity.bucketed_topk(
        _t(spark, sf, "embeddings"), _query_vec(spark, sf), 10
    )


# Multi-table random-hyperplane LSH. The hyperplane components are
# md5-seeded doubles computed once in Python (similarity.hyperplanes) and
# embedded as a VALUES clause, so DuckDB derives every sign bit from the
# exact same constants the Spark plan embeds as literals. bits=4, tables=8:
# measured recall 0.8 of the exact top-10 on the sf0.001 fixture (the
# recall/scan trade is the lsh_hyperplane_buckets docstring).
_HYPER_BITS = 4
_HYPER_TABLES = 8
_HYPER_SEED = 42


def _hyperplane_oracle() -> str:
    vals = similarity.hyperplane_oracle_values(
        _HYPER_SEED, _HYPER_TABLES * _HYPER_BITS, 64
    )
    return f"""
WITH planes(j, i, w) AS (VALUES {vals}),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
bits AS (
  SELECT e.vec_id, p.j,
         CASE WHEN sum(p.w * CAST(e.embedding[p.i] AS DOUBLE)) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM embeddings e, planes p
  GROUP BY e.vec_id, p.j
),
buckets AS (
  SELECT vec_id, (j // {_HYPER_BITS}) AS t,
         string_agg(bit, '' ORDER BY j) AS bucket
  FROM bits GROUP BY vec_id, (j // {_HYPER_BITS})
),
qbits AS (
  SELECT p.j,
         CASE WHEN sum(p.w * CAST(q.qe[p.i] AS DOUBLE)) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM q, planes p GROUP BY p.j
),
qbuckets AS (
  SELECT (j // {_HYPER_BITS}) AS t, string_agg(bit, '' ORDER BY j) AS bucket
  FROM qbits GROUP BY (j // {_HYPER_BITS})
),
cand AS (
  SELECT DISTINCT b.vec_id
  FROM buckets b JOIN qbuckets qb ON b.t = qb.t AND b.bucket = qb.bucket
),
scored AS (
  SELECT e.vec_id,
         round(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))), 4) AS cos_sim
  FROM embeddings e JOIN cand c ON e.vec_id = c.vec_id, q, range(1, 65) t(i)
  GROUP BY e.vec_id
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


@_q("knn_hyperplane_top10", _hyperplane_oracle())
def knn_hyperplane_top10(spark, sf):
    return similarity.hyperplane_topk(
        _t(spark, sf, "embeddings"),
        _query_vec(spark, sf),
        10,
        bits=_HYPER_BITS,
        tables=_HYPER_TABLES,
        seed=_HYPER_SEED,
    )


# Near-dup blocking wants finer buckets than the top-k probe: bits=8 keeps
# recall ≈ 1 for cos >= 0.99 pairs while quartering candidates per halved
# bucket population (see embedding_near_dup_pairs_lsh).
_NEARDUP_BITS = 8
_NEARDUP_TABLES = 8


def _lsh_neardup_oracle(src: str = "embeddings", prelude: str = "") -> str:
    vals = similarity.hyperplane_oracle_values(
        _HYPER_SEED, _NEARDUP_TABLES * _NEARDUP_BITS, 64
    )
    return f"""
WITH {prelude}planes(j, i, w) AS (VALUES {vals}),
bits AS (
  SELECT e.vec_id, p.j,
         CASE WHEN sum(p.w * CAST(e.embedding[p.i] AS DOUBLE)) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM {src} e, planes p GROUP BY e.vec_id, p.j
),
buckets AS (
  SELECT vec_id, (j // {_NEARDUP_BITS}) AS t,
         string_agg(bit, '' ORDER BY j) AS bucket
  FROM bits GROUP BY vec_id, (j // {_NEARDUP_BITS})
),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM buckets x
  JOIN buckets y ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
scored AS (
  SELECT c.a, c.b,
         round(sum(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))
               / (sqrt(sum(CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE)))
                  * sqrt(sum(CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))), 4) AS cos_sim
  FROM cand c
  JOIN {src} ea ON ea.vec_id = c.a
  JOIN {src} eb ON eb.vec_id = c.b, range(1, 65) t(i)
  GROUP BY c.a, c.b
)
SELECT a, b, cos_sim FROM scored ORDER BY cos_sim DESC, a, b LIMIT 10
"""


@_q("dedup_embedding_lsh_top10", _lsh_neardup_oracle())
def dedup_embedding_lsh_top10(spark, sf):
    """Label-free scale path of embedding near-dup: hyperplane-LSH buckets
    as the blocking key (candidates bounded by bucket collisions), exact
    cosine on the candidate set, global top-10."""
    pairs = similarity.embedding_near_dup_pairs_lsh(
        _t(spark, sf, "embeddings"),
        threshold=-1.0,
        bits=_NEARDUP_BITS,
        tables=_NEARDUP_TABLES,
        seed=_HYPER_SEED,
    )
    return pairs.orderBy(F.desc("cos_sim"), "a", "b").limit(10)


@_q(
    "dedup_embedding_lsh_collapsed",
    _lsh_neardup_oracle(
        src="reps",
        prelude=(
            "reps AS (SELECT min(vec_id) AS vec_id, embedding "
            "FROM embeddings GROUP BY embedding), "
        ),
    ),
)
def dedup_embedding_lsh_collapsed(spark, sf):
    """The production composition of embedding near-dup: collapse EXACT
    duplicate vectors first (min-id representative per distinct vector),
    then hyperplane-LSH blocking + exact cosine on the distinct set.

    This isn't an optimization nicety — it's the difference between bounded
    and unbounded: exact-dup clusters share every LSH bucket, so the
    uncollapsed pair join grows as cluster^2 (the 100x replica sweep hits
    ~800M candidates); after the one-shuffle collapse the candidate set is
    bounded by real bucket collisions again. Mirrors what
    dedup_minhash_collapsed does for text."""
    reps = similarity.collapse_exact_vectors(_t(spark, sf, "embeddings"))
    pairs = similarity.embedding_near_dup_pairs_lsh(
        reps,
        threshold=-1.0,
        bits=_NEARDUP_BITS,
        tables=_NEARDUP_TABLES,
        seed=_HYPER_SEED,
    )
    return pairs.orderBy(F.desc("cos_sim"), "a", "b").limit(10)


_IVF_ORACLE = """
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id BETWEEN 1 AND 8
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id, c.cid, e.embedding,
         sum(CAST(e.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE))
           / (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
              * sqrt(sum(CAST(c.ce[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))) AS sim
  FROM embeddings e, cents c, range(1, 65) t(i)
  GROUP BY e.vec_id, c.cid, e.embedding
),
asg AS (
  SELECT vec_id, cid, embedding FROM (
    SELECT vec_id, cid, embedding,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
probes AS (
  SELECT c.cid
  FROM cents c, q, range(1, 65) t(i)
  GROUP BY c.cid
  ORDER BY sum(CAST(c.ce[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
             / (sqrt(sum(CAST(c.ce[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))
                * sqrt(sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))) DESC,
           c.cid
  LIMIT 2
),
scored AS (
  SELECT a.vec_id,
         round(sum(CAST(a.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
               / (sqrt(sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))), 4) AS cos_sim
  FROM asg a JOIN probes p ON a.cid = p.cid, q, range(1, 65) t(i)
  GROUP BY a.vec_id
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


@_q("knn_ivf_top10", _IVF_ORACLE)
def knn_ivf_top10(spark, sf):
    emb = _t(spark, sf, "embeddings")
    # one driver round-trip fetches query vector + centroids (vec_id 0..8)
    rows = {
        int(r.vec_id): [float(v) for v in r.embedding]
        for r in emb.where(F.col("vec_id").between(0, 8))
        .select("vec_id", "embedding")
        .collect()
    }
    centroids = [(cid, rows[cid]) for cid in sorted(rows) if cid >= 1]
    return similarity.ivf_topk(emb, centroids, rows[0], k=10, nprobe=2)


def _recall_oracle() -> str:
    # Each approximate method's full oracle runs as a WITH-in-subquery CTE,
    # so recall is computed from the very same SQL the per-method oracle
    # rows are checked against.
    return f"""
WITH exact AS (SELECT * FROM ({_KNN_ORACLE})),
     hyper AS (SELECT * FROM ({_hyperplane_oracle()})),
     ivf AS (SELECT * FROM ({_IVF_ORACLE})),
     bucket AS (SELECT * FROM ({_KNN_LSH_ORACLE}))
SELECT 'hyperplane' AS method, (SELECT count(*) FROM exact) AS k,
       count(*) AS hits,
       round(count(*) * 1.0 / (SELECT count(*) FROM exact), 4) AS recall
FROM hyper h WHERE h.vec_id IN (SELECT vec_id FROM exact)
UNION ALL
SELECT 'ivf', (SELECT count(*) FROM exact), count(*),
       round(count(*) * 1.0 / (SELECT count(*) FROM exact), 4)
FROM ivf i WHERE i.vec_id IN (SELECT vec_id FROM exact)
UNION ALL
SELECT 'bucket', (SELECT count(*) FROM exact), count(*),
       round(count(*) * 1.0 / (SELECT count(*) FROM exact), 4)
FROM bucket b WHERE b.vec_id IN (SELECT vec_id FROM exact)
"""


@_q("knn_recall_at_10", _recall_oracle())
def knn_recall_at_10(spark, sf):
    """Recall@10 of the hyperplane-LSH, IVF and sign-bucket ANN paths
    against the exact cosine top-10 — the tuning harness
    (similarity.recall_at_k) as a first-class query, so users can sweep
    tables/bits/nprobe on their own corpus and read recall as a result
    frame. (The int8-quantized path has its own recall row in suite_ext4:
    knn_recall_quantized.)

    The four sub-pipelines are independent until recall_report unions
    them, but their BUILDS each run 1-2 tiny driver actions (query-vector
    fetch, the IVF centroid collect, the exact frame's k-row checkpoint)
    — sequentially that serializes ~5 jobs of scheduler+scan latency
    before the real query even starts. A 4-thread pool overlaps the
    builds (guide §2.6: actions are only sequential because driver code
    calls them sequentially); every frame is deterministic, so the result
    is identical — only the build-time jobs overlap. Kill-switch
    SPARK_GRAFT_NO_THREAD_BUILD pins the sequential shape for A/B."""
    import os as _os

    if _os.environ.get("SPARK_GRAFT_NO_THREAD_BUILD"):
        exact = knn_cosine_top10(spark, sf).localCheckpoint()  # lc-ok: k rows
        return similarity.recall_report(
            {
                "hyperplane": knn_hyperplane_top10(spark, sf),
                "ivf": knn_ivf_top10(spark, sf),
                "bucket": knn_lsh_bucket_top10(spark, sf),
            },
            exact,
            checkpoint=False,
        )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        f_exact = pool.submit(
            lambda: knn_cosine_top10(spark, sf).localCheckpoint()  # lc-ok: k-row harness frame; rerun recomputes
        )
        f_hyper = pool.submit(knn_hyperplane_top10, spark, sf)
        f_ivf = pool.submit(knn_ivf_top10, spark, sf)
        f_bucket = pool.submit(knn_lsh_bucket_top10, spark, sf)
        methods = {
            "hyperplane": f_hyper.result(),
            "ivf": f_ivf.result(),
            "bucket": f_bucket.result(),
        }
        exact = f_exact.result()
    return similarity.recall_report(methods, exact, checkpoint=False)


# =========================================================================
# Text analysis (SURVEY §2.11)
# =========================================================================


@_q(
    "text_token_counts",
    """
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_subword_tokens
    FROM documents
    """,
)
def text_token_counts(spark, sf):
    t = F.col("text")
    return _t(spark, sf, "documents").select(
        "doc_id",
        textstats.token_count(t).alias("n_tokens"),
        textstats.bpe_ish_token_count(t).cast("int").alias("n_subword_tokens"),
    )


@_q(
    "text_quality",
    """
    SELECT doc_id,
           round(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                 / CAST(nullif(length(text), 0) AS DOUBLE), 4) AS alpha_ratio,
           round(len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                 / CAST(nullif(length(text), 0) AS DOUBLE), 4) AS punct_ratio,
           round((len(regexp_extract_all(lower(text), '\\bthe\\b'))
                  + len(regexp_extract_all(lower(text), '\\band\\b'))
                  + len(regexp_extract_all(lower(text), '\\bof\\b'))
                  + len(regexp_extract_all(lower(text), '\\bto\\b'))
                  + len(regexp_extract_all(lower(text), '\\ba\\b')))
                 / CAST(nullif(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 0) AS DOUBLE), 4)
             AS stopword_ratio
    FROM documents
    """,
)
def text_quality(spark, sf):
    t = F.col("text")
    feats = textstats.quality_features(t)
    return _t(spark, sf, "documents").select(
        "doc_id",
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    )


@_q(
    "text_fingerprint",
    """
    SELECT doc_id,
           substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 16) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", textstats.fingerprint(F.col("text")).alias("fingerprint")
    )


@_q(
    "sample_stratified_hash",
    """
    WITH b AS (
      SELECT lang, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100
               AS bucket
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 50 ELSE 20 END
    GROUP BY lang ORDER BY lang
    """,
)
def sample_stratified_hash(spark, sf):
    """Reproducible per-language downsampling: keep/drop decided by a hash
    bucket of doc_id, never by df.sample() (seed- and partitioning-
    dependent). 50% of English, 20% of everything else."""
    from betfair_database_spark.operators import sampling

    d = _t(spark, sf, "documents")
    kept = sampling.stratified_sample(
        d, "lang", {"en": 50}, key_col="doc_id", default_rate=20
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@_q(
    "corpus_token_budget",
    """
    WITH t AS (
      SELECT source, doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
               AS n_tokens,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
      FROM documents
    ),
    c AS (
      SELECT source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum
      FROM t
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM c WHERE cum <= 1500 GROUP BY source ORDER BY source
    """,
)
def corpus_token_budget(spark, sf):
    """Corpus mixing by token budget: per source, greedily keep documents in
    deterministic hash order until 1500 tokens — the standard way to cut a
    weighted training mix, as a single windowed pass."""
    from betfair_database_spark.operators import sampling

    d = _t(spark, sf, "documents").select(
        "source",
        "doc_id",
        textstats.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    kept = sampling.token_budget_take(
        d, group_col="source", key_col="doc_id", tokens_col="n_tokens", budget=1500
    )
    return (
        kept.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .orderBy("source")
    )


@_q(
    "text_unigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    freq AS (SELECT w, count(*) AS f FROM tok GROUP BY w),
    tot AS (SELECT sum(f) AS n, count(*) AS v FROM freq)
    SELECT t.doc_id, round(avg(ln((f.f + 1) / (tot.n + tot.v))), 4) AS logprob
    FROM tok t JOIN freq f USING (w), tot
    GROUP BY t.doc_id
    """,
)
def text_unigram_logprob(spark, sf):
    """Corpus-frequency unigram log-probability per document (perplexity
    proxy for quality filtering)."""
    return textstats.unigram_logprob_scores(_t(spark, sf, "documents"))


@_q(
    "chunk_documents_windows",
    """
    WITH st AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 50, 1), 150)) AS s
      FROM documents
    )
    SELECT doc_id, CAST((s - 1) // 150 AS INT) AS chunk_ix,
           substr(text, CAST(s AS INT), 200) AS chunk
    FROM st
    """,
)
def chunk_documents_windows(spark, sf):
    """Overlapping character-window chunking (size 200, overlap 50) — the
    map stage in front of a tokenizer/embedder; zero shuffle."""
    from betfair_database_spark.operators import sampling

    return sampling.chunk_documents(
        _t(spark, sf, "documents"), chunk_size=200, overlap=50
    )


@_q(
    "pack_sequences_bins",
    """
    WITH t AS (
      SELECT source, doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)
               - n_tokens AS strt
      FROM t
    )
    SELECT source, CAST(strt // 500 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM c GROUP BY source, bin
    """,
)
def pack_sequences_bins(spark, sf):
    """Sequence packing into 500-token training bins per source (documents
    in deterministic hash order; a bin holds the docs whose cumulative
    window starts inside it), summarized per bin."""
    from betfair_database_spark.operators import sampling

    d = _t(spark, sf, "documents").select(
        "source",
        "doc_id",
        textstats.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    packed = sampling.pack_sequences(
        d, group_col="source", key_col="doc_id", tokens_col="n_tokens", budget=500
    )
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens")
    )


@_q(
    "multimodal_decode_meta",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'audio/wav' ELSE 'image/bmp' END AS mime,
           CASE WHEN doc_id % 3 = 0 THEN NULL ELSE doc_id % 30 + 1 END AS width,
           CASE WHEN doc_id % 3 = 0 THEN NULL ELSE n_chars % 20 + 1 END AS height,
           CASE WHEN doc_id % 3 = 0 THEN (n_chars % 50 + 1) * 10 ELSE NULL END AS duration_ms,
           CASE WHEN doc_id % 3 = 0 THEN 44 + (n_chars % 50 + 1) * 80
                ELSE 54 + ((3 * (doc_id % 30 + 1) + 3) // 4) * 4 * (n_chars % 20 + 1)
           END AS n_bytes
    FROM documents
    """,
)
def multimodal_decode_meta(spark, sf):
    """End-to-end binary-column round trip: synthesize real BMP/WAV payloads
    from (doc_id, n_chars), decode the container headers back, and verify the
    recovered metadata against the closed form (the oracle computes what the
    decode must recover — a full check of both mapInPandas stages)."""
    from betfair_database_spark.operators import multimodal

    media = multimodal.synthesize_media(_t(spark, sf, "documents"))
    return multimodal.decode_media(media)


@_q(
    "multimodal_resize_png",
    """
    SELECT d.doc_id, 8 AS width, 5 AS height,
           CAST(sum(
             ((x * (d.doc_id % 13 + 1)) // 8) % 256
             + ((y * (d.n_chars % 9 + 1)) // 5) % 256
             + (((x * (d.doc_id % 13 + 1)) // 8)
                + ((y * (d.n_chars % 9 + 1)) // 5)) % 256
           ) AS BIGINT) AS pix_sum
    FROM documents d, range(0, 8) tx(x), range(0, 5) ty(y)
    GROUP BY d.doc_id, d.n_chars
    """,
)
def multimodal_resize_png(spark, sf):
    """PNG raster pipeline end-to-end: synthesize a real zlib-deflated
    pattern PNG per document, nearest-neighbor resize to 8x5 (full IDAT
    inflate + un-filter + re-encode, stdlib only), then decode the RESIZED
    payload back and emit the per-image pixel checksum. The oracle computes
    the checksum from the sampling closed form — every output pixel's
    position-dependent bytes are pinned, so the whole
    decode->resize->encode chain is verified pixel-exactly."""
    from betfair_database_spark.operators import multimodal

    media = multimodal.synthesize_png(_t(spark, sf, "documents"))
    resized = multimodal.resize_images(media, 8, 5)
    return multimodal.png_pixel_stats(resized.where(F.col("ok")))


@_q(
    "multimodal_decode_jpeg_mp3",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'audio/mpeg' ELSE 'image/jpeg' END AS mime,
           CASE WHEN doc_id % 2 = 0 THEN NULL ELSE doc_id % 100 + 1 END AS width,
           CASE WHEN doc_id % 2 = 0 THEN NULL ELSE n_chars % 50 + 1 END AS height,
           CASE WHEN doc_id % 2 = 0 THEN ((n_chars % 20 + 1) * 26122) // 1000
                ELSE NULL END AS duration_ms,
           CASE WHEN doc_id % 2 = 0 THEN (n_chars % 20 + 1) * 417
                ELSE 35 END AS n_bytes
    FROM documents
    """,
)
def multimodal_decode_jpeg_mp3(spark, sf):
    """JPEG-SOF + MP3-frame-header round trip: synthesize real JPEG/MP3
    bytes, decode the headers back (marker scan / frame walk — no codec
    library), verify against the closed form."""
    from betfair_database_spark.operators import multimodal

    media = multimodal.synthesize_media_jpeg_mp3(_t(spark, sf, "documents"))
    return multimodal.decode_media(media)


@_q(
    "text_top_tokens",
    """
    SELECT w AS token, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (
      SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS w
      FROM documents
    )
    GROUP BY w ORDER BY doc_freq DESC, token LIMIT 20
    """,
)
def text_top_tokens(spark, sf):
    d = _t(spark, sf, "documents")
    tok = dedup.tokens(d, "doc_id", "text")
    return (
        tok.groupBy(F.col("w").alias("token"))
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(20)
    )


@_q(
    "fuzzy_levenshtein_pairs",
    """
    SELECT a.p_partkey AS a, b.p_partkey AS b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 6
    """,
)
def fuzzy_levenshtein_pairs(spark, sf):
    """COMPOSITE-blocked edit-distance pairs (brand AND size — round 12:
    the single-brand block grew quadratically under replication, ~800M
    pairs and a measured driver-heap OOM at sf1; the second key is the
    same scale rule pipeline_entity_resolution documents). Measured A/B
    at 8M pairs: the plain levenshtein beats both "optimizations" — the
    |len diff| <= 6 prefilter prunes nothing on fixed-format names yet
    costs 2 length() evals per pair (+70%), and Spark's THRESHOLDED
    levenshtein is slower than the full DP at ~25-char strings (banding
    overhead exceeds the saved cells). Both would matter on long,
    variable-length strings; neither does here. Round 13: the blocking
    rule is enforced by assert_pair_budget — a block key that stops
    keeping expected block size flat now refuses loudly before the
    shuffle instead of filling the disk."""
    from betfair_database_spark.plans.guards import assert_pair_budget

    p = _t(spark, sf, "part")
    assert_pair_budget(
        p,
        ["p_brand", "p_size"],
        context="fuzzy_levenshtein_pairs (brand, size) blocks",
        remediation=(
            "refine the blocking key (add a container/length-band "
            "component) so expected block size stays flat as the "
            "catalog grows"
        ),
    )
    a = p.select(
        F.col("p_partkey").alias("a"), F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"), F.col("p_name").alias("na"),
    )
    b = p.select(
        F.col("p_partkey").alias("b"), F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"), F.col("p_name").alias("nb"),
    )
    return (
        a.join(b, ["brand", "size"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.levenshtein("na", "nb").alias("dist"))
        .where(F.col("dist") <= 6)
    )


@_q(
    "agg_cube",
    """
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           count(*) AS n
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf):
    return (
        _t(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n",
        )
    )


@_q(
    "f_date_arithmetic",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT) AS days_to_y2k,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter
    FROM orders
    """,
)
def f_date_arithmetic(spark, sf):
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        F.date_format(F.expr("o_orderdate + INTERVAL 30 DAY"), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.datediff(
            F.lit("2000-01-01 00:00:00").cast("timestamp_ntz").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).cast("long").alias("days_to_y2k"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
    )


@_q(
    "set_ops_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_ops_intersect(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_LANGID_ORACLE = """
WITH scores AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\\bthe\\b')) + len(regexp_extract_all(lower(text), '\\band\\b'))
           + len(regexp_extract_all(lower(text), '\\bof\\b')) + len(regexp_extract_all(lower(text), '\\bto\\b'))
           + len(regexp_extract_all(lower(text), '\\ba\\b')) AS s_en,
         len(regexp_extract_all(lower(text), '\\ble\\b')) + len(regexp_extract_all(lower(text), '\\bla\\b'))
           + len(regexp_extract_all(lower(text), '\\bet\\b')) + len(regexp_extract_all(lower(text), '\\bles\\b'))
           + len(regexp_extract_all(lower(text), '\\bdes\\b')) AS s_fr,
         len(regexp_extract_all(lower(text), '\\bel\\b')) + len(regexp_extract_all(lower(text), '\\bla\\b'))
           + len(regexp_extract_all(lower(text), '\\bde\\b')) + len(regexp_extract_all(lower(text), '\\bque\\b'))
           + len(regexp_extract_all(lower(text), '\\blos\\b')) AS s_es,
         len(regexp_extract_all(lower(text), '\\bder\\b')) + len(regexp_extract_all(lower(text), '\\bdie\\b'))
           + len(regexp_extract_all(lower(text), '\\bund\\b')) + len(regexp_extract_all(lower(text), '\\bdas\\b'))
           + len(regexp_extract_all(lower(text), '\\bein\\b')) AS s_de
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
            WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
            WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
            WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM scores
"""


@_q("text_lang_id", _LANGID_ORACLE)
def text_lang_id(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", textstats.lang_id(F.col("text")).alias("pred_lang")
    )


# Extended plan shapes (deep TPC-H joins, grouping sets, duplicate
# clustering, batch ANN) register themselves into SUITE on import; kept in a
# separate module so this file stays the §2 core. Bottom import: suite_ext
# needs _q/_t/_MINHASH_ORACLE, all defined above.
from betfair_database_spark import suite_ext as _suite_ext  # noqa: E402,F401
from betfair_database_spark import suite_ext2 as _suite_ext2  # noqa: E402,F401
from betfair_database_spark import suite_ext3 as _suite_ext3  # noqa: E402,F401
from betfair_database_spark import suite_ext4 as _suite_ext4  # noqa: E402,F401
from betfair_database_spark import suite_ext5 as _suite_ext5  # noqa: E402,F401
from betfair_database_spark import suite_ext6 as _suite_ext6  # noqa: E402,F401
from betfair_database_spark import suite_ext7 as _suite_ext7  # noqa: E402,F401
from betfair_database_spark import suite_ext8 as _suite_ext8  # noqa: E402,F401
from betfair_database_spark import suite_ext9 as _suite_ext9  # noqa: E402,F401
from betfair_database_spark import suite_ext10 as _suite_ext10  # noqa: E402,F401
from betfair_database_spark import suite_ext11 as _suite_ext11  # noqa: E402,F401
from betfair_database_spark import suite_ext12 as _suite_ext12  # noqa: E402,F401
from betfair_database_spark import suite_ext13 as _suite_ext13  # noqa: E402,F401
from betfair_database_spark import suite_ext14 as _suite_ext14  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Registration order. External harnesses sample the FIRST 50 queries, so the
# head of the dict is a curated cross-section — at least one query from every
# operator family (TPC-H plan shapes, dialect shims, join/agg/window/set-op
# cores, event windows, as-of, every dedup algorithm, every ANN variant,
# text stats, curation, sampling, multimodal) — and the tail holds the
# remaining within-family variants. Names listed here must exist; anything
# registered but not listed keeps its definition order after the curated head.
# ---------------------------------------------------------------------------
_CURATED_HEAD = [
    # TPC-H plan shapes (scan-agg, join-topk, semi/anti, outer-count, nested)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_exists_semijoin",
    "q9_profit_by_nation",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    # skew + aggregate variants
    "skew_salted_join_agg",
    "pivot_event_types",
    # reference passthrough / dialect shims
    "p1_projection",
    "p2_filter_eq_and",
    "p7_bool_literal_shim",
    "p8_strftime_time_shim",
    # join + aggregate core
    "j1_inner_join",
    "j4_nonequi_join",
    "a1_global_aggs",
    "a2_last_per_group",
    # windows + set ops
    "w1_topk_per_group",
    "w3_lag_lead_ntile",
    "set_ops_except",
    # scalar functions
    "f5_weekday_name",
    "f6_regex_extract",
    "f12_json_access",
    # event-time windows + as-of (backward + nearest directions) + funnel
    "ev_hourly_window",
    "ev_sessionize",
    "asof_join_last_order",
    # deduplication (each algorithm is its own operator)
    "dedup_exact_stats",
    "dedup_minhash_pairs",
    "dedup_simhash_fingerprints",
    "dedup_cluster_components",
    "dedup_span_c4_stats",
    "dedup_embedding_lsh_top10",
    # similarity search / clustering
    "knn_cosine_top10",
    "knn_hyperplane_top10",
    "knn_ivf_top10",
    "knn_recall_at_10",
    "kmeans_fit_3iter",
    # text analysis + curation + sampling + chunking/packing + multimodal
    "text_quality",
    "text_lang_id",
    "text_pii_redaction",
    "curation_decontaminate",
    "sample_match_target_mix",
    "chunk_documents_windows",
    "pack_sequences_bins",
    "text_bpe_top_merges",
    "multimodal_decode_jpeg_mp3",
    "multimodal_resize_png",
    # round-4 batch 2: range joins, gap-fill, heavy hitters, quantized ANN,
    # graph, per-key EWMA fold — one per new operator family; the dropped
    # within-family variants (ngram verify, sign-LSH, nearest as-of, tfidf,
    # funnel, q16, embedding-cosine near-dup, basic multimodal meta decode)
    # remain registered + locally oracle-checked in the tail
    "range_events_in_windows",
    "ts_gapfill_hourly_ffill",
    "heavy_hitters_tokens",
    "knn_quantized_top10",
    "graph_triangle_count",
    "ts_ewma_user_value",
]


def _reorder_suite() -> None:
    missing = [n for n in _CURATED_HEAD if n not in SUITE]
    if missing:  # a typo here must fail loudly at import, not silently reorder
        raise RuntimeError(f"curated suite head names not registered: {missing}")
    tail = [n for n in SUITE if n not in _CURATED_HEAD]
    ordered = {n: SUITE[n] for n in [*_CURATED_HEAD, *tail]}
    SUITE.clear()
    SUITE.update(ordered)


_reorder_suite()
