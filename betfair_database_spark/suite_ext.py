"""Suite extension: deeper TPC-H plan shapes + pipeline graph/batch-ANN ops.

Registered into :data:`betfair_database_spark.suite.SUITE` via the ``_q``
decorator; imported from the bottom of ``suite.py`` so the registry stays a
single dict for ``__spark_entry__``.

Same hash-matching conventions as ``suite.py`` (identical rounding/aliases/
casts both sides; total ORDER BY whenever there is a LIMIT).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from betfair_database_spark.operators import dedup, graph, similarity
from betfair_database_spark.suite import _MINHASH_ORACLE, _q, _t


# =========================================================================
# TPC-H plan shapes (joins/aggregates the reference's SQL surface covers
# via SQLite passthrough — here each one is tuned for the distributed plan)
# =========================================================================


@_q(
    "q7_nation_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN orders    ON o_orderkey  = l_orderkey
    JOIN customer  ON c_custkey   = o_custkey
    JOIN supplier  ON s_suppkey   = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark, sf):
    """TPC-H Q7 shape (6-way join). The nation filter is applied BEFORE the
    fact joins: the broadcast nation filter shrinks supplier/customer
    first. Only the 25-row nation dim is HINTED broadcast — the shrunken
    supplier/customer sides are left to AQE, which promotes them to
    broadcast at bench scale but degrades gracefully to shuffle joins when
    they outgrow the driver at 100 TB. The OR-of-nation-pairs residual runs
    on the already-joined rows."""
    nat = _t(spark, sf, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sup = (
        _t(spark, sf, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cus = (
        _t(spark, sf, "customer")
        .join(
            F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    joined = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cus, o["o_custkey"] == cus["c_custkey"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@_q(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS acctbal
    FROM customer
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf):
    """TPC-H Q10 shape: returned-item revenue per customer over a half-year
    window, top 20. Both filters sit UNDER the joins (date range prunes
    orders, returnflag prunes lineitem scan-side); nation is broadcast; the
    final top-20 is a TakeOrderedAndProject, not a global sort."""
    o = _t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@_q(
    "q12_priority_linecount",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q12_priority_linecount(spark, sf):
    """TPC-H Q12 shape: join + conditional aggregation (CASE inside SUM —
    one pass, no per-branch scans). The non-equi l_shipdate >= o_orderdate
    is a residual on the equi-join, not a join condition."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@_q(
    "q14_promo_revenue",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE year(l_shipdate) = 1996
    """,
)
def q14_promo_revenue(spark, sf):
    """TPC-H Q14 shape: dim join (AQE-promoted to broadcast at bench scale;
    part outgrows the driver at 100 TB) + ratio-of-conditional-sums in a
    single aggregate (no second scan for the denominator)."""
    li = _t(spark, sf, "lineitem").where(F.year("l_shipdate") == 1996)
    p = _t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue"),
            F.count("*").alias("n"),
        )
    )


@_q(
    "q17_small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN pa ON pk = l_partkey
    WHERE l_quantity < thresh
    """,
)
def q17_small_quantity_revenue(spark, sf):
    """TPC-H Q17 shape: correlated per-part average. The classic plan is
    aggregate-then-self-join (two scans + two shuffles); a window over
    l_partkey computes the per-part average and filters in ONE shuffle and
    one scan — the shape that wins at 100 TB."""
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("thresh", 0.5 * F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < F.col("thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n"),
        )
    )


@_q(
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey AS ok, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(total_qty, 2) AS total_qty
    FROM orders JOIN big ON ok = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_orders(spark, sf):
    """TPC-H Q18 shape: HAVING-qualified aggregate subquery joined back to
    the fact. The aggregate runs map-side-partial on l_orderkey; the
    surviving key set joins back to orders un-hinted — AQE broadcasts it
    while it fits and falls back to a key-partitioned join when the
    qualified set grows with the data."""
    li = _t(spark, sf, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(big, o["o_orderkey"] == big["ok"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


@_q(
    "q19_disjunctive_filter",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_filter(spark, sf):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst extracts
    the common sub-predicates it can push below the join (brand/size terms to
    the part scan, quantity bounds to the lineitem scan) and keeps the full
    disjunction as the residual — the join itself stays a plain equi-join,
    never a nested loop."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.where(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n"),
    )


@_q(
    "q20_qualified_suppliers",
    """
    SELECT s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
      GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
    ORDER BY s_name
    """,
)
def q20_qualified_suppliers(spark, sf):
    """TPC-H Q20 shape: IN over an aggregated subquery = left-semi join on
    the qualifying key set. The name-filtered part side and the
    qualified supplier set are both left un-hinted: AQE broadcasts them at
    bench scale, and both degrade to partitioned joins as they grow —
    neither is bounded at 100 TB."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").where(F.col("p_name").like("%red%"))
    qual = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = _t(spark, sf, "supplier")
    return (
        s.join(qual, s["s_suppkey"] == qual["l_suppkey"], "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


@_q(
    "agg_grouping_sets",
    """
    SELECT coalesce(o_orderstatus, '<all>')   AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
)
def agg_grouping_sets(spark, sf):
    """Explicit GROUPING SETS (beyond the rollup/cube lattices already in
    the suite): Spark expands the sets into one Expand node feeding a single
    hash aggregate — one scan, one shuffle, regardless of set count."""
    return (
        _t(spark, sf, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], ["o_orderstatus", "o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n",
            "total",
        )
    )


# =========================================================================
# Pipeline extensions: duplicate clustering + batch ANN (SURVEY §2.11)
# =========================================================================


_CC_ORACLE = f"""
WITH RECURSIVE pairs AS (SELECT a, b FROM ({_MINHASH_ORACLE}) mp),
sym AS (SELECT a AS s, b AS d FROM pairs UNION SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT s AS node FROM sym),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, sym.d FROM reach JOIN sym ON sym.s = reach.r
)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component FROM reach GROUP BY node
"""


@_q("dedup_cluster_components", _CC_ORACLE)
def dedup_cluster_components(spark, sf):
    """MinHash candidate pairs → duplicate CLUSTERS via distributed
    connected components (iterative min-label propagation, one shuffle per
    round, lineage cut per round). The oracle computes the same components
    with a recursive reachability CTE over the identical pair set."""
    pairs = dedup.minhash_near_dups(
        _t(spark, sf, "documents"), num_hashes=16, bands=2, threshold=0.8
    )
    cc = graph.connected_components(pairs, "a", "b")
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").cast("long")
    )


_INCR_ORACLE = f"""
WITH p AS (SELECT a, b, jaccard FROM ({_MINHASH_ORACLE}) mp),
flt AS (SELECT * FROM p WHERE a < 50 OR b < 50)
SELECT CASE WHEN a < 50 THEN a ELSE b END AS a,
       CASE WHEN a < 50 THEN b ELSE a END AS b,
       jaccard
FROM flt
"""


@_q("dedup_minhash_incremental", _INCR_ORACLE)
def dedup_minhash_incremental(spark, sf):
    """Append-time near-dup detection: docs with id < 50 arrive as the NEW
    batch against the rest as the standing corpus; only new-vs-all pairs
    are produced (corpus-internal pairs were found when those docs landed).
    Candidate generation probes the new docs' LSH buckets against
    everyone's — O(new x collisions), never O(corpus^2). The oracle is the
    full-corpus pair oracle filtered and re-oriented to the same contract
    (a = the new doc). See dedup.minhash_incremental_pairs."""
    d = _t(spark, sf, "documents")
    new = d.where(F.col("doc_id") < 50)
    corpus = d.where(F.col("doc_id") >= 50)
    return dedup.minhash_incremental_pairs(
        new, corpus, num_hashes=16, bands=2, threshold=0.8
    )


_SPLIT_ORACLE = f"""
WITH RECURSIVE pairs AS (SELECT a, b FROM ({_MINHASH_ORACLE}) mp),
sym AS (SELECT a AS s, b AS d FROM pairs UNION SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT s AS node FROM sym),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, sym.d FROM reach JOIN sym ON sym.s = reach.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
g AS (
  SELECT d.doc_id,
         CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS group_id
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
)
SELECT doc_id, group_id,
       CASE WHEN CAST('0x' || substr(md5('split|' || CAST(group_id AS VARCHAR)), 1, 4)
                 AS INT) % 100 < 90
            THEN 'train' ELSE 'eval' END AS split
FROM g
"""


@_q("sample_leakage_safe_split", _SPLIT_ORACLE)
def sample_leakage_safe_split(spark, sf):
    """Group-aware train/eval split: near-dup CLUSTERS (MinHash pairs →
    connected components) are the assignment unit, so no evaluation
    document has a training near-duplicate — the decontaminated-split
    primitive an LLM data pipeline needs. The oracle rebuilds the
    components with a recursive CTE and derives the identical md5 bucket
    per group."""
    from betfair_database_spark.operators import sampling

    d = _t(spark, sf, "documents")
    pairs = dedup.minhash_near_dups(d, num_hashes=16, bands=2, threshold=0.8)
    return sampling.leakage_safe_split(d, pairs, train_pct=90)


_BATCH_KNN_ORACLE = """
WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, e.vec_id,
         round(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))), 4) AS cos_sim
  FROM embeddings e, q, range(1, 65) t(i)
  GROUP BY q.q_id, e.vec_id
),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rank
FROM ranked WHERE rn <= 3
"""


@_q("knn_batch_top3", _BATCH_KNN_ORACLE)
def knn_batch_top3(spark, sf):
    """Batch brute-force kNN: 5 query vectors broadcast against the full
    embedding table, scored JVM-side in one pass, top-3 per query."""
    emb = _t(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return similarity.batch_cosine_topk(emb, queries, k=3)


_HARD_NEG_ORACLE = """
WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, e.vec_id,
         round(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))), 4) AS cos_sim
  FROM embeddings e, q, range(1, 65) t(i)
  WHERE e.vec_id <> q.q_id
  GROUP BY q.q_id, e.vec_id
),
banded AS (SELECT * FROM scored WHERE cos_sim < 0.95),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
  FROM banded
)
SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rank
FROM ranked WHERE rn <= 3
"""


@_q("knn_hard_negatives", _HARD_NEG_ORACLE)
def knn_hard_negatives(spark, sf):
    """Hard-negative mining: per query, the 3 most similar vectors BELOW
    the 0.95 near-dup band (self excluded) — the contrastive-training
    companion to the near-dup join. One base-table pass, broadcast query
    set, windowed top-k (similarity.hard_negatives)."""
    emb = _t(spark, sf, "embeddings")
    return similarity.hard_negatives(
        emb, emb.where(F.col("vec_id") < 5), k=3, max_sim=0.95
    )


# =========================================================================
# Curation: PII redaction, decontamination, repetition (SURVEY §2.11)
# =========================================================================


_PII_INJECT_SQL = """
CASE WHEN doc_id % 5 = 0
     THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@example.com or 555-0199 at 10.0.0.'
               || CAST(doc_id % 256 AS VARCHAR)
     ELSE text END
"""

_PII_ORACLE = f"""
WITH injected AS (SELECT doc_id, {_PII_INJECT_SQL} AS t FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
           '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '[IP]', 'g'),
           '\\b[0-9]{{3}}-[0-9]{{4}}\\b', '[PHONE]', 'g') AS redacted,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '\\b[0-9]{{3}}-[0-9]{{4}}\\b')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(t, '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b')) AS INT) AS n_ips
FROM injected
"""


@_q("text_pii_redaction", _PII_ORACLE)
def text_pii_redaction(spark, sf):
    """PII scrub as pure column expressions (codegen, zero shuffle). The
    corpus has no natural PII, so deterministic email/phone/IP strings are
    injected into every 5th doc identically on both sides; the redaction
    chain and per-class counts are then fully exercised."""
    from betfair_database_spark.operators import curation

    d = _t(spark, sf, "documents")
    injected = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-0199 at 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ),
    ).otherwise(F.col("text"))
    counts = curation.pii_counts(injected)
    return d.select(
        "doc_id",
        curation.redact_pii(injected).alias("redacted"),
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ips"].alias("n_ips"),
    )


_DECONTAM_ORACLE = """
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gs
  FROM tok
),
bench AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 0),
doc_g AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 97 <> 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM doc_g JOIN bench USING (g)
GROUP BY doc_id
"""


@_q("curation_decontaminate", _DECONTAM_ORACLE)
def curation_decontaminate(spark, sf):
    """Benchmark decontamination: docs sharing a word 3-gram with the
    held-out set (doc_id % 97 == 0 stands in for the benchmark). The
    benchmark gram set broadcasts; the corpus is scanned once."""
    from betfair_database_spark.operators import curation

    d = _t(spark, sf, "documents")
    return curation.contamination(
        d.where(F.col("doc_id") % 97 != 0),
        d.where(F.col("doc_id") % 97 == 0),
        n=3,
    )


_REPETITION_ORACLE = """
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                        i -> ws[i] || ' ' || ws[i+1]) AS gs
  FROM tok
),
counts AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams) GROUP BY doc_id, g
),
best AS (SELECT doc_id, max(c) AS best FROM counts GROUP BY doc_id),
nb AS (SELECT doc_id, len(gs) AS n_bigrams FROM grams)
SELECT nb.doc_id, CAST(n_bigrams AS INT) AS n_bigrams,
       CASE WHEN n_bigrams > 0
            THEN round(CAST(best AS DOUBLE) / n_bigrams, 4) END AS top_bigram_ratio
FROM nb LEFT JOIN best ON nb.doc_id = best.doc_id
"""


@_q("text_repetition_ratio", _REPETITION_ORACLE)
def text_repetition_ratio(spark, sf):
    """Most-frequent-bigram fraction per doc, computed map-side (sorted
    bigram array + one fold — no explode, no shuffle); the oracle computes
    the same ratio the explode-and-group way."""
    from betfair_database_spark.operators import curation

    return curation.repetition_score(_t(spark, sf, "documents"))


@_q(
    "q11_share_of_total",
    """
    WITH nr AS (
      SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      GROUP BY n_name
    )
    SELECT n_name, round(rev, 2) AS revenue
    FROM nr WHERE rev > (SELECT sum(rev) * 0.045 FROM nr)
    """,
)
def q11_share_of_total(spark, sf):
    """TPC-H Q11 shape: groups whose share exceeds a fraction of the global
    total. The per-nation aggregate is persisted and reused for both the
    threshold (1-row re-aggregate, broadcast cross join) and the filter —
    one lineitem scan, not two."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    nr = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
        )
        .persist()
    )
    threshold = nr.agg((F.sum("rev") * 0.045).alias("thresh"))
    return (
        nr.crossJoin(F.broadcast(threshold))
        .where(F.col("rev") > F.col("thresh"))
        .select("n_name", F.round("rev", 2).alias("revenue"))
    )


@_q(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS sk, sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_rev, 2) AS total_rev
    FROM supplier JOIN rev ON sk = s_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark, sf):
    """TPC-H Q15 shape: the supplier(s) hitting the maximum of an aggregated
    view — scalar max as a 1-row broadcast cross join against the persisted
    aggregate (each engine compares its own unrounded values, so FP noise
    cannot flip membership across engines)."""
    li = _t(spark, sf, "lineitem").where(F.year("l_shipdate") == 1997)
    rev = (
        li.groupBy(F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_rev"
            )
        )
        .persist()
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf, "supplier")
    return (
        s.join(rev, s["s_suppkey"] == rev["sk"])
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_rev"))
    )
