"""Suite extension 2: remaining classic TPC-H plan shapes (Q6/Q8/Q9/Q13/Q21
adapted to the driver schema — no partsupp/commitdate columns exist, so cost
and lateness are derived from retail price and order date) plus two pipeline
operators: TF-IDF term ranking and a k-means update step (the Lloyd iteration
over the IVF cell assignment).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``; same
hash-matching conventions as ``suite.py`` (identical rounding/aliases/casts
both sides; total ORDER BY whenever there is a LIMIT; ratios divide rounded
sums so the 4-decimal hash is stable under either engine's summation order).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from betfair_database_spark.operators import similarity
from betfair_database_spark.suite import _q, _t


# =========================================================================
# TPC-H shapes
# =========================================================================


@_q(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf):
    """TPC-H Q6: the pure scan-filter-aggregate shape. Everything must reach
    the parquet scan as PushedFilters — the aggregate sees only qualifying
    rows, there is no shuffle beyond the final 1-row partial-agg merge. The
    reference runs the same shape as a SQLite full-table predicate scan
    (reference database.py select() WHERE passthrough)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


@_q(
    "q8_market_share",
    """
    WITH flat AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part      ON p_partkey  = l_partkey
      JOIN supplier  ON s_suppkey  = l_suppkey
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey  = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
    )
    SELECT o_year,
           round(round(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                                ELSE 0 END), 2) / round(sum(volume), 2), 6)
             AS mkt_share
    FROM flat
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf):
    """TPC-H Q8: 8-way snowflake with a conditional-aggregate ratio. The
    customer-side region restriction is resolved dim-side (region⨝nation
    broadcast into customer) BEFORE touching the facts; part's type filter
    makes it a small broadcast; lineitem⨝orders stays the only data-sized
    exchange. Numerator and denominator come out of ONE aggregate pass
    (CASE-in-SUM), not two scans; both are rounded before the division so
    the 6-decimal ratio is invariant to each engine's summation order."""
    nat_eu = (
        _t(spark, sf, "nation")
        .join(
            F.broadcast(
                _t(spark, sf, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cust_nkey"))
    )
    cus = (
        _t(spark, sf, "customer")
        .join(F.broadcast(nat_eu), F.col("c_nationkey") == F.col("cust_nkey"))
        .select("c_custkey")
    )
    prt = (
        _t(spark, sf, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    sup = (
        _t(spark, sf, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf, "nation").select(
                    "n_nationkey", F.col("n_name").alias("supp_nation")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    o = _t(spark, sf, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    li = _t(spark, sf, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        li.join(prt, li["l_partkey"] == prt["p_partkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cus, o["o_custkey"] == cus["c_custkey"])
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    share = F.round(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0.0)),
            2,
        )
        / F.round(F.sum("volume"), 2),
        6,
    )
    return flat.groupBy("o_year").agg(share.alias("mkt_share"))


@_q(
    "q9_profit_by_nation",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity * 0.1 AS DECIMAL(38,6))), 2)
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey  = l_partkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def q9_profit_by_nation(spark, sf):
    """TPC-H Q9 shape (profit by supplier nation and year). The driver schema
    has no partsupp, so supply cost is derived as 10% of retail price per
    unit — the PLAN shape is the point: the p_name LIKE filter shrinks part
    to a broadcast that prunes lineitem FIRST (most selective join first),
    then supplier+nation broadcast, and lineitem⨝orders is the only
    shuffle-sized join before the two-key aggregate."""
    prt = (
        _t(spark, sf, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = (
        _t(spark, sf, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        li.join(prt, li["l_partkey"] == prt["p_partkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        # sum in DECIMAL(38,6): exact addition is associative, so the rounded
        # cent can't flip with partial-aggregation order (FP double sums sat
        # exactly at the rounding noise floor and flickered across runs)
        .agg(
            F.round(F.sum(profit.cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("profit")
        )
    )


@_q(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf):
    """TPC-H Q13: outer join with an ON-clause filter feeding a two-level
    aggregation (orders per customer, then the histogram of those counts).
    The right-side-only predicate is applied BEFORE the join (semantically
    identical for a left outer join, and it prunes the shuffle). The first
    groupBy keys on c_custkey — the join's own partitioning — so Catalyst
    reuses the exchange; only the tiny histogram agg reshuffles. count() of
    the right-side key counts 0 for unmatched customers, matching SQL
    count(o_orderkey) null-skipping."""
    cus = _t(spark, sf, "customer").select("c_custkey")
    o = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cus.join(o, cus["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_q(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_suppliers(spark, sf):
    """TPC-H Q21 shape: the correlated EXISTS / NOT EXISTS pair over the
    fact table itself (suppliers who were the ONLY late shipper on a
    multi-supplier finished order; lateness adapted to ship > order + 120
    days since the schema has no commit/receipt dates). The oracle states it
    in the correlated form; here both subqueries DECORRELATE into one
    per-order aggregate each — distinct-supplier counts keyed on
    l_orderkey — so the whole query is two hash aggregates and two
    key-aligned joins on the same l_orderkey partitioning instead of two
    nested-loop probes per row. EXISTS(other supplier) ⇔ n_supp ≥ 2;
    NOT EXISTS(other LATE supplier) ⇔ n_late_supp = 1 (l1 itself is late,
    so its supplier is always in the late set)."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    late = (
        li.join(
            o.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    n_supp = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    n_late = late.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_late_supp")
    )
    qualifying = (
        late.join(n_supp, "l_orderkey")
        .join(n_late, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    sup = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        qualifying.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# =========================================================================
# Pipeline operators: TF-IDF ranking + k-means update step
# =========================================================================


@_q(
    "tfidf_top_terms",
    """
    WITH tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      GROUP BY doc_id, w
    ),
    df AS (
      SELECT w, CAST(count(*) AS BIGINT) AS df
      FROM (SELECT DISTINCT doc_id, w FROM tf)
      GROUP BY w
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.w,
           round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
    FROM tf JOIN df ON tf.w = df.w, n
    ORDER BY tfidf DESC, tf.doc_id, tf.w
    LIMIT 20
    """,
)
def tfidf_top_terms(spark, sf):
    """TF-IDF term ranking over the corpus: term frequency per (doc, term),
    document frequency per term, idf = ln(N/df), top-20 by tf·idf. One
    explode feeds BOTH aggregates; df is derived from the tf frame (already
    distinct per doc), so the corpus is tokenized exactly once. N arrives as
    a 1-row broadcast (IdentityBroadcastMode cross join — never a driver
    collect), the df⨝tf join keys on the term. Top-20 is
    TakeOrderedAndProject on the ROUNDED score with (doc_id, w) tiebreak —
    a total order, so the LIMIT is deterministic across engines."""
    docs = _t(spark, sf, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "w")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    return scored.orderBy(F.col("tfidf").desc(), "doc_id", "w").limit(20)


_KMEANS_ORACLE = """
WITH cents AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id BETWEEN 1 AND 8
),
sims AS (
  SELECT e.vec_id, c.cid,
         sum(CAST(e.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE))
           / (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
              * sqrt(sum(CAST(c.ce[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))) AS sim,
         sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS nrm,
         CAST(e.embedding[1] AS DOUBLE) AS e1
  FROM embeddings e, cents c, range(1, 65) t(i)
  GROUP BY e.vec_id, c.cid, e.embedding
),
asg AS (
  SELECT vec_id, cid, nrm, e1 FROM (
    SELECT vec_id, cid, nrm, e1,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
)
SELECT cid AS cell, CAST(count(*) AS BIGINT) AS n,
       round(avg(nrm), 6) AS avg_norm,
       round(avg(e1), 6) AS c1
FROM asg GROUP BY cell
"""


def _kmeans_fit_oracle(k: int = 4, iters: int = 3, dims: int = 64) -> str:
    """Unrolled Lloyd iterations as a CTE chain — the ITERATIVE algorithm is
    still exactly oracle-checkable because the iteration count is fixed.
    Centroids travel in long form (cid, i, w); c0 is the md5-hash-order
    seed set (kmeans_seeds), a{n} assigns against c{n-1} by max cosine
    (smallest cid on ties), c{n} is the member mean. Cells that lose every
    member drop out (the documented kmeans_fit semantics)."""
    return _kmeans_fit_oracle_impl(k, iters, dims)


def _kmeans_fit_parts(k: int = 4, iters: int = 3, dims: int = 64) -> list:
    parts = [
        f"""
c0 AS (
  SELECT CAST(s.rn AS INT) AS cid, t.i, CAST(s.embedding[t.i] AS DOUBLE) AS w
  FROM (
    SELECT vec_id, embedding,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM embeddings
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
  ) s, range(1, {dims + 1}) t(i)
)"""
    ]
    for n in range(1, iters + 1):
        parts.append(
            f"""
s{n} AS (
  SELECT e.vec_id, c.cid,
         sum(c.w * CAST(e.embedding[c.i] AS DOUBLE))
           / (sqrt(sum(CAST(e.embedding[c.i] AS DOUBLE) * CAST(e.embedding[c.i] AS DOUBLE)))
              * sqrt(sum(c.w * c.w))) AS sim
  FROM embeddings e, c{n - 1} c
  GROUP BY e.vec_id, c.cid
),
a{n} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM s{n}
  ) WHERE rn = 1
),
c{n} AS (
  SELECT a.cid, t.i, avg(CAST(e.embedding[t.i] AS DOUBLE)) AS w
  FROM a{n} a JOIN embeddings e USING (vec_id), range(1, {dims + 1}) t(i)
  GROUP BY a.cid, t.i
)"""
        )
    # final assignment against the trained centroids, reported per cell
    parts.append(
        f"""
sF AS (
  SELECT e.vec_id, c.cid,
         sum(c.w * CAST(e.embedding[c.i] AS DOUBLE))
           / (sqrt(sum(CAST(e.embedding[c.i] AS DOUBLE) * CAST(e.embedding[c.i] AS DOUBLE)))
              * sqrt(sum(c.w * c.w))) AS sim
  FROM embeddings e, c{iters} c
  GROUP BY e.vec_id, c.cid
),
aF AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
    FROM sF
  ) WHERE rn = 1
)"""
    )
    return parts


def _kmeans_fit_ctes(k: int = 4, iters: int = 3, dims: int = 64) -> str:
    """The WITH-chain of _kmeans_fit_oracle without its final SELECT —
    composed rows (round-7 pipeline_cluster_balance) append their own
    tail over the trained assignment ``aF``."""
    return "WITH " + ",".join(_kmeans_fit_parts(k, iters, dims))


def _kmeans_fit_oracle_impl(k: int, iters: int, dims: int) -> str:
    return (
        _kmeans_fit_ctes(k, iters, dims)
        + f"""
SELECT a.cid AS cell, CAST(count(*) AS BIGINT) AS n, round(c.w, 6) AS c1
FROM aF a JOIN c{iters} c ON c.cid = a.cid AND c.i = 1
GROUP BY a.cid, c.w
"""
    )


@_q("kmeans_fit_3iter", _kmeans_fit_oracle())
def kmeans_fit_3iter(spark, sf):
    """Three full Lloyd iterations (seed → assign → mean, ×3) trained by
    similarity.kmeans_fit, reported as per-cell population + first centroid
    coordinate. The oracle unrolls the identical iterations as a CTE chain
    — iterative ≠ unoracleable when the trip count is pinned."""
    emb = _t(spark, sf, "embeddings")
    centroids, assigned = similarity.kmeans_fit(
        emb, k=4, max_iters=3, tol=0.0
    )
    c1 = {cid: vec[0] for cid, vec in centroids}
    c1_col = F.create_map(
        *[F.lit(x) for pair in c1.items() for x in pair]
    )[F.col("cell")]
    return assigned.groupBy("cell").agg(F.count("*").alias("n")).select(
        "cell", "n", F.round(c1_col, 6).alias("c1")
    )


@_q("kmeans_update_step", _KMEANS_ORACLE)
def kmeans_update_step(spark, sf):
    """One Lloyd iteration over the IVF layout: assign every vector to its
    nearest centroid (broadcast-literal centroids, argmax in whole-stage
    codegen — similarity.ivf_assign), then the UPDATE step: per-cell count
    and mean statistics (the new centroid). One narrow assignment pass plus
    ONE shuffle keyed on the cell — at 100 TB the cell is the table's
    partition key, so iterating k-means is a sequence of map-side-heavy
    aggregates, never an all-pairs distance matrix. Reported per cell:
    population, mean vector norm, and the first coordinate of the new
    centroid (the full mean vector is the same aggregate over every
    coordinate; one coordinate keeps the oracle hash exact)."""
    emb = _t(spark, sf, "embeddings")
    cent_rows = (
        emb.where(F.col("vec_id").between(1, 8))
        .select("vec_id", "embedding")
        .collect()
    )
    centroids = [
        (int(r.vec_id), [float(v) for v in r.embedding]) for r in cent_rows
    ]
    assigned = similarity.ivf_assign(emb, centroids)
    return (
        assigned.select(
            "cell",
            F.expr(
                "sqrt(aggregate(embedding, 0D,"
                " (a, x) -> a + cast(x AS double) * cast(x AS double)))"
            ).alias("nrm"),
            F.element_at("embedding", 1).cast("double").alias("e1"),
        )
        .groupBy("cell")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.avg("e1"), 6).alias("c1"),
        )
    )
