"""Suite extension 3: the last TPC-H shape (Q2 — correlated-min over a
derived part/supplier cost table, completing all 22 classic plan shapes),
event-stream product analytics (staged funnel, cohort retention, fixed-bin
histogram), and two training-pipeline additions (random-projection
dimensionality reduction, deterministic weighted priority sampling).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``; same
hash-matching conventions as ``suite.py`` (identical rounding/aliases/casts
both sides; total ORDER BY whenever there is a LIMIT).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from betfair_database_spark.operators import sampling, similarity
from betfair_database_spark.operators.textstats import (
    _ALPHA as textstats_ALPHA,
    token_count as token_count_col,
)
from betfair_database_spark.suite import _q, _t


# =========================================================================
# TPC-H Q2 (adapted: no partsupp table exists, so the supply cost of a
# (part, supplier) pair is the minimum observed unit price in lineitem)
# =========================================================================


@_q(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    j AS (
      SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.n_name,
             ps.supplycost,
             min(ps.supplycost) OVER (PARTITION BY p.p_partkey) AS mincost
      FROM ps JOIN eu e ON ps.l_suppkey = e.s_suppkey
      JOIN part p ON ps.l_partkey = p.p_partkey
      WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
    )
    SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name, p_partkey, p_name,
           floor(supplycost * 10000 + 0.5) / 10000 AS supplycost
    FROM j WHERE supplycost = mincost
    ORDER BY acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf):
    """TPC-H Q2 shape: correlated MIN subquery = window-min + equality
    filter (one pass, no self-join re-scan of the derived cost table). The
    region filter is a 1-row broadcast; supplier/nation stay un-hinted so
    AQE broadcasts them at bench scale and they degrade to shuffle joins as
    dims grow. The window partitions by part key — the same key the
    part-side join shuffles on, so AQE can reuse the exchange.

    The FP subtlety that makes `supplycost = mincost` hash-safe: both
    engines derive each cost by the same correctly-rounded division and MIN
    is a selection (not a sum), so the equality compares bit-identical
    doubles.  The output rounding is the floor(x*1e4+0.5)/1e4 quantization
    rather than round(x, 4): a quotient can land exactly on a half boundary
    (seen at sf0.001: 26.24125), where Spark's BigDecimal HALF_UP and
    DuckDB's FP-multiply round() disagree in the last digit — the floor
    form is the same IEEE op sequence on both engines, so it cannot.
    """
    li = _t(spark, sf, "lineitem")
    r = _t(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    n = _t(spark, sf, "nation")
    eu = (
        _t(spark, sf, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        _t(spark, sf, "part")
        .where(F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    # Catalyst cannot push the part/region joins through the cost aggregate,
    # so restrict lineitem BEFORE the big (partkey, suppkey) shuffle: two
    # semi-joins on the qualifying key sets (both selective dims — AQE
    # broadcasts them) cut the aggregate input to the ~1% of lineitems that
    # can reach the output. Semantically identical: dropped pairs could
    # never survive the later joins, and the window-min ranges over the
    # post-join (EU-only) frame either way. Measured 18.9 s -> much smaller
    # shuffle at the 100x point.
    li_f = li.join(
        p.select("p_partkey"), li["l_partkey"] == F.col("p_partkey"), "left_semi"
    ).join(
        eu.select("s_suppkey"), li["l_suppkey"] == F.col("s_suppkey"), "left_semi"
    )
    ps = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    j = ps.join(eu, ps["l_suppkey"] == eu["s_suppkey"]).join(
        p, F.col("l_partkey") == p["p_partkey"]
    )
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("mincost", F.min("supplycost").over(w))
        .where(F.col("supplycost") == F.col("mincost"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # floor-quantize, not F.round — see docstring (half-boundary safety)
            (F.floor(F.col("supplycost") * 10000 + 0.5) / 10000).alias("supplycost"),
        )
        .orderBy(F.desc("acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


# =========================================================================
# Event-stream product analytics
# =========================================================================


@_q(
    "ev_funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS stage_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS stage_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS stage_purchase
    """,
)
def ev_funnel_conversion(spark, sf):
    """Ordered funnel view -> click -> purchase (each stage strictly after
    the user's previous stage). The oracle's three joined CTEs collapse to
    THREE WINDOW AGGREGATES over one user-hash partitioning: t1 = first
    view, t2 = first click after t1, t3 = first purchase after t2 — each a
    whole-partition conditional MIN, so Spark shuffles the events ONCE and
    re-sorts nothing (unbounded frames need no ordering). At 100 TB this is
    one exchange + a 1-row reduce; the naive 3-way self-join would re-scan
    and re-shuffle the fact table per stage.
    """
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    df = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    df = df.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    df = df.withColumn("t3", t3)
    per_user = df.select("user_id", "t1", "t2", "t3").distinct()
    return per_user.agg(
        F.count("t1").alias("stage_view"),
        F.count("t2").alias("stage_click"),
        F.count("t3").alias("stage_purchase"),
    )


@_q(
    "ev_cohort_retention",
    """
    WITH f AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id,
             strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
             CAST(floor(date_diff('day', f.cohort, CAST(e.ts AS DATE)) / 7)
                  AS BIGINT) AS wk
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT cohort_day, wk, CAST(count(*) AS BIGINT) AS users
    FROM act GROUP BY cohort_day, wk
    ORDER BY cohort_day, wk
    """,
)
def ev_cohort_retention(spark, sf):
    """Cohort retention: users grouped by first-seen date, counted once per
    week-offset they remain active. The oracle's first-seen CTE + join is
    ONE window MIN over the user partitioning (no second scan of the fact
    table); the distinct + count shuffles only (user, cohort, wk) triples.
    """
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id")
    cohort = F.min("ts").over(w).cast("date")
    act = (
        ev.withColumn("cohort", cohort)
        .select(
            "user_id",
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort")) / 7
            ).alias("wk"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort_day", "wk")
        .agg(F.count("*").alias("users"))
        .orderBy("cohort_day", "wk")
    )


@_q(
    "ev_value_histogram",
    """
    SELECT event_type,
           CAST(least(floor("value" / 50), 9) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(sum("value"), 2) AS sum_value
    FROM events
    GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
)
def ev_value_histogram(spark, sf):
    """Fixed-bin histogram (width 50, clamped top bin) per event type — the
    binning is a pure column expression so the whole query is one scan + one
    hash aggregate on (type, bin); no per-bin passes, no driver-side
    min/max pre-query."""
    ev = _t(spark, sf, "events")
    bin_ = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("long")
    return (
        ev.groupBy("event_type", bin_.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type", "bin")
    )


# =========================================================================
# Training-pipeline additions
# =========================================================================


def _rp_oracle() -> str:
    exprs = ",\n           ".join(
        similarity.random_projection_oracle_exprs(seed=7, out_dims=8, dims=64)
    )
    return f"SELECT vec_id, {exprs} FROM embeddings"


@_q("embed_random_projection", _rp_oracle())
def embed_random_projection(spark, sf):
    """Random-projection dimensionality reduction 64 -> 8 (JL transform).
    Both engines evaluate the SAME left-to-right multiply-add chain built
    from the seeded plane literals, so every projected double is
    bit-identical before rounding — see similarity.random_projection."""
    return similarity.random_projection(
        _t(spark, sf, "embeddings"), seed=7, out_dims=8, dims=64
    )


@_q(
    "sample_weighted_topk",
    """
    WITH pr AS (
      SELECT doc_id, n_chars,
             round(
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) AS DOUBLE)
               / CAST(n_chars AS DOUBLE), 6) AS priority
      FROM documents
    )
    SELECT doc_id, n_chars, priority
    FROM pr ORDER BY priority ASC, doc_id ASC
    LIMIT 20
    """,
)
def sample_weighted_topk(spark, sf):
    """Deterministic weighted sample: 20 documents, selection probability
    increasing in n_chars, membership a pure function of doc_id (see
    sampling.weighted_priority_sample for why the rational hash/weight
    priority is used instead of the transcendental A-ES key)."""
    return sampling.weighted_priority_sample(
        _t(spark, sf, "documents"), "doc_id", "n_chars", 20
    ).select("doc_id", "n_chars", "priority")


@_q(
    "text_bigram_lift",
    """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    bi AS (
      SELECT bg, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i + 1])) AS bg
            FROM toks)
      GROUP BY bg
    ),
    n AS (
      SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS n_uni,
             (SELECT CAST(sum(c) AS DOUBLE) FROM bi) AS n_bi
    )
    SELECT bi.bg AS bigram, bi.c AS n_pair,
           round((bi.c / n.n_bi)
                 / ((u1.c / n.n_uni) * (u2.c / n.n_uni)), 4) AS lift
    FROM bi
    JOIN uni u1 ON u1.w = split_part(bi.bg, ' ', 1)
    JOIN uni u2 ON u2.w = split_part(bi.bg, ' ', 2)
    , n
    WHERE bi.c >= 5
    ORDER BY lift DESC, bigram
    LIMIT 20
    """,
)
def text_bigram_lift(spark, sf):
    """Collocation mining: top bigrams by LIFT = p(ab) / (p(a)p(b)) — the
    monotone core of PMI, kept rational (ratios of exact integer counts, so
    every double is a correctly-rounded IEEE division and the ranking is
    bit-identical across engines; log-based PMI would hang the hash on libm
    agreement). One tokenize pass feeds both the unigram and bigram counts;
    the totals ride along as a 1-row broadcast; top-20 is
    TakeOrderedAndProject on the rounded score with a bigram tiebreak."""
    docs = _t(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("t")
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bigrams = F.when(
        F.size("t") >= 2,
        F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))"),
    ).otherwise(F.array().cast("array<string>"))
    bi_all = (
        toks.select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds (both consumers reuse ONE explode)
    )
    bi = bi_all.where(F.col("c") >= 5)
    n_uni = uni.agg(F.sum("c").cast("double").alias("n_uni"))
    n_bi_all = bi_all.agg(F.sum("c").cast("double").alias("n_bi"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.withColumn("w1", F.substring_index("bg", " ", 1))
        .withColumn("w2", F.substring_index("bg", " ", -1))
        .join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi_all))
        .select(
            F.col("bg").alias("bigram"),
            F.col("c").alias("n_pair"),
            F.round(
                (F.col("c") / F.col("n_bi"))
                / ((F.col("c1") / F.col("n_uni")) * (F.col("c2") / F.col("n_uni"))),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "bigram").limit(20)


@_q(
    "sample_group_reservoir",
    """
    WITH r AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 3 ORDER BY lang, rn
    """,
)
def sample_group_reservoir(spark, sf):
    """Per-group deterministic 'reservoir': the first 3 documents of each
    language in md5(doc_id) order — the grouped counterpart of the
    stratified/weighted samplers (same reproducible-hash-order principle,
    one window shuffle on the group key, no rand())."""
    d = _t(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).cast("long").alias("rn"))
        .where(F.col("rn") <= 3)
        .orderBy("lang", "rn")
    )


@_q(
    "pipeline_curate_sample",
    """
    WITH q AS (
      SELECT doc_id, lang, n_chars, text FROM documents
      WHERE len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10
              >= 6 * length(text)
        AND (CASE WHEN trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) >= 5
    ),
    keep AS (
      SELECT min(doc_id) AS doc_id
      FROM q GROUP BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
    ),
    kept AS (
      SELECT q.lang, q.n_chars FROM q JOIN keep USING (doc_id)
      WHERE CAST('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 4) AS INT)
              % 100 < 50
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM kept GROUP BY lang ORDER BY lang
    """,
)
def pipeline_curate_sample(spark, sf):
    """End-to-end curation pipeline in ONE logical plan: quality gate ->
    exact dedup -> deterministic 50% sample -> per-language stats. The
    stages compose the existing operators (translate-count quality filter,
    min-id exact_dedup, md5-bucket sample) without materializing between
    steps — Catalyst fuses the filter+sample into the scan side of the
    dedup semi-join, so the corpus is read once and shuffles only for the
    dedup key and the final (tiny) language aggregate. The quality gate
    compares INTEGER counts (alpha*10 >= 6*len) so the cut is exact on
    both engines — no rounded-ratio boundary cases."""
    from betfair_database_spark.operators import dedup as dd

    d = _t(spark, sf, "documents")
    t = F.col("text")
    n_alpha = F.length(t) - F.length(F.translate(t, textstats_ALPHA, ""))
    q = d.where(
        (n_alpha * 10 >= 6 * F.length(t)) & (token_count_col(t) >= 5)
    )
    deduped = dd.exact_dedup(q)
    kept = deduped.where(sampling.hash_bucket(F.col("doc_id")) < 50)
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@_q(
    "j6_full_outer",
    """
    SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
                WHEN o_orderkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS side,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c
    FULL OUTER JOIN (SELECT o_orderkey, o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00') o
      ON o.o_custkey = c.c_custkey
    GROUP BY side ORDER BY side
    """,
)
def j6_full_outer(spark, sf):
    """FULL OUTER join shape (the one join type the suite lacked):
    BUILDING customers without recent orders surface with a null order
    side, recent orders of other-segment customers with a null customer
    side — both null classes non-empty on the test data;
    the summary collapses to presence-class counts so the result is stable
    at any scale. One shuffle on the key; both null classes stream out of
    the same sort-merge join."""
    c = _t(spark, sf, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey")
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "full_outer")
    side = (
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_orderkey").isNull(), "customer_only")
        .otherwise("both")
    )
    return (
        j.groupBy(side.alias("side"))
        .agg(F.count("*").alias("n"))
        .orderBy("side")
    )


@_q(
    "w4_percent_rank_cume",
    """
    SELECT c_custkey,
           round(percent_rank() OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS pr,
           round(cume_dist() OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS cd
    FROM customer
    """,
)
def w4_percent_rank_cume(spark, sf):
    """Relative-rank windows (percent_rank, cume_dist) per market segment —
    the remaining window family beyond rank/lag/ntile. The total (acctbal,
    custkey) ordering makes both fractions deterministic; exact (rank-1)/
    (n-1) divisions hash identically across engines."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return _t(spark, sf, "customer").select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@_q(
    "set_ops_except_all",
    """
    SELECT status, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT l_linestatus AS status FROM lineitem WHERE l_quantity < 10
      EXCEPT ALL
      SELECT l_linestatus AS status FROM lineitem WHERE l_quantity < 5
    ) GROUP BY status ORDER BY status
    """,
)
def set_ops_except_all(spark, sf):
    """EXCEPT ALL (multiset difference — keeps surplus duplicate counts,
    unlike the distinct EXCEPT already in the suite). Spark plans it as a
    count-propagating aggregate, not a join per duplicate."""
    li = _t(spark, sf, "lineitem")
    a = li.where(F.col("l_quantity") < 10).select(
        F.col("l_linestatus").alias("status")
    )
    b = li.where(F.col("l_quantity") < 5).select(
        F.col("l_linestatus").alias("status")
    )
    return (
        a.exceptAll(b)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy("status")
    )


def _dedup_canonical_oracle() -> str:
    from betfair_database_spark.suite_ext import _CC_ORACLE

    return f"""
    WITH comp AS ({_CC_ORACLE}),
    dropped AS (SELECT doc_id FROM comp WHERE doc_id <> component)
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
    GROUP BY d.lang ORDER BY d.lang
    """


@_q("pipeline_dedup_canonical", _dedup_canonical_oracle())
def pipeline_dedup_canonical(spark, sf):
    """The other end-to-end pipeline: near-dup CLUSTERS to a canonical
    corpus. MinHash banding proposes pairs, connected components groups
    them, the min-id member of each cluster survives, and everything
    outside any cluster passes through — the keep-one decision a real
    dedup pass feeds into training-data selection. Survivor removal is a
    broadcast-able anti-join on the (tiny) dropped-id set; the stats
    aggregate is the only other shuffle past the clustering itself."""
    from betfair_database_spark.operators import dedup as dd
    from betfair_database_spark.operators import graph

    docs = _t(spark, sf, "documents")
    pairs = dd.minhash_near_dups(docs, num_hashes=16, bands=2, threshold=0.8)
    cc = graph.connected_components(pairs, "a", "b")
    dropped = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    surv = docs.join(dropped, "doc_id", "left_anti")
    return (
        surv.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@_q(
    "sketch_kmv_distinct",
    """
    WITH h AS (
      SELECT DISTINCT
        CAST(CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
             AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM orders
    ),
    mins AS (SELECT u FROM h ORDER BY u LIMIT 256),
    agg AS (SELECT max(u) AS kth, count(*) AS n_kept FROM mins),
    ex AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
           FROM orders)
    SELECT CAST(CASE WHEN agg.n_kept < 256 THEN agg.n_kept
                ELSE round(255.0 / agg.kth) END AS BIGINT) AS kmv_estimate,
           CAST(agg.n_kept AS BIGINT) AS n_kept,
           ex.exact_distinct
    FROM agg, ex
    """,
)
def sketch_kmv_distinct(spark, sf):
    """Deterministic distinct-count sketch (K-Minimum-Values) next to the
    exact answer — the oracle-checkable alternative to HLL: same O(k)
    memory and associative merge (TakeOrderedAndProject = partial top-k
    per partition + k-row driver merge), but any engine reproduces the
    estimate exactly. See operators/sketches.py."""
    from betfair_database_spark.operators import sketches

    o = _t(spark, sf, "orders")
    est = sketches.kmv_distinct(o, "o_custkey", k=256, hasher="md5")
    exact = o.agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return est.join(F.broadcast(exact))


@_q(
    "sketch_kmv_jaccard",
    """
    WITH a AS (
      SELECT DISTINCT
        CAST(CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
             AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ),
    b AS (
      SELECT DISTINCT
        CAST(CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
             AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    ),
    mins AS (SELECT u FROM (SELECT u FROM a UNION SELECT u FROM b)
             ORDER BY u LIMIT 256),
    tagged AS (
      SELECT m.u,
             CASE WHEN m.u IN (SELECT u FROM a)
                   AND m.u IN (SELECT u FROM b) THEN 1 ELSE 0 END AS in_both
      FROM mins m
    )
    SELECT round(sum(in_both) / CAST(count(*) AS DOUBLE), 4) AS jaccard_est,
           CAST(count(*) AS BIGINT) AS n_union_kept
    FROM tagged
    """,
)
def sketch_kmv_jaccard(spark, sf):
    """Set-similarity from merged KMV sketches: Jaccard of the early-vs-
    late customer sets estimated from the union's k-min hash sample —
    deterministic, so the DuckDB oracle lands on the identical fraction."""
    from betfair_database_spark.operators import sketches

    o = _t(spark, sf, "orders")
    cut = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    early = o.where(F.col("o_orderdate") < cut)
    late = o.where(F.col("o_orderdate") >= cut)
    return sketches.kmv_jaccard(early, late, "o_custkey", k=256, hasher="md5")


def _cm_bucket_sql(key_expr: str, j: int, width: int) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5('{j}:' || CAST({key_expr} AS VARCHAR)),"
        f" 1, 8) AS BIGINT) AS BIGINT) % {width}"
    )


def _countmin_oracle(depth: int = 4, width: int = 64) -> str:
    sketch_rows = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, {_cm_bucket_sql('o_orderpriority', j, width)} AS bucket"
        " FROM orders"
        for j in range(depth)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT p.probe_key, {j} AS j,"
        f" {_cm_bucket_sql('p.probe_key', j, width)} AS bucket FROM probes p"
        for j in range(depth)
    )
    return f"""
    WITH sketch AS (
      SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
      FROM ({sketch_rows}) GROUP BY j, bucket
    ),
    probes(probe_key) AS (VALUES ('1-URGENT'), ('3-MEDIUM'), ('5-LOW'),
                                 ('no-such-priority')),
    pb AS ({probe_rows}),
    est AS (
      SELECT pb.probe_key,
             CAST(min(coalesce(s.c, 0)) AS BIGINT) AS cm_estimate
      FROM pb LEFT JOIN sketch s ON s.j = pb.j AND s.bucket = pb.bucket
      GROUP BY pb.probe_key
    ),
    exact AS (
      SELECT o_orderpriority AS probe_key, CAST(count(*) AS BIGINT) AS exact_n
      FROM orders GROUP BY o_orderpriority
    )
    SELECT est.probe_key, est.cm_estimate, coalesce(exact.exact_n, 0) AS exact_n
    FROM est LEFT JOIN exact ON exact.probe_key = est.probe_key
    ORDER BY est.probe_key
    """


@_q("sketch_countmin_counts", _countmin_oracle())
def sketch_countmin_counts(spark, sf):
    """Count-Min point estimates next to exact counts for 3 real keys and
    one absent key. Counters are order/partition-independent sums, so the
    whole sketch (and therefore the estimate) is reproducible on any
    engine — see operators/sketches.py for the merge story at scale."""
    from betfair_database_spark.operators import sketches

    o = _t(spark, sf, "orders")
    sk = sketches.countmin_table(o, "o_orderpriority", hasher="md5")
    probes = spark.createDataFrame(
        [("1-URGENT",), ("3-MEDIUM",), ("5-LOW",), ("no-such-priority",)],
        ["probe_key"],
    )
    est = sketches.countmin_lookup(sk, probes, "probe_key", hasher="md5")
    exact = o.groupBy(F.col("o_orderpriority").alias("probe_key")).agg(
        F.count("*").alias("exact_n")
    )
    return (
        est.join(exact, "probe_key", "left")
        .select(
            "probe_key",
            F.col("cm_estimate").cast("long"),
            F.coalesce("exact_n", F.lit(0)).cast("long").alias("exact_n"),
        )
        .orderBy("probe_key")
    )


def _bloom_oracle(hashes: int = 5, bits: int = 4096) -> str:
    bloom_rows = "\nUNION ALL\n".join(
        f"SELECT {_cm_bucket_sql('s_name', j, bits)} AS pos FROM supplier"
        for j in range(hashes)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT p.probe_key, {_cm_bucket_sql('p.probe_key', j, bits)} AS pos"
        " FROM probes p"
        for j in range(hashes)
    )
    return f"""
    WITH bloom AS (SELECT DISTINCT pos FROM ({bloom_rows})),
    probes(probe_key) AS (VALUES ('Supplier#000000001'),
                                 ('Supplier#000000007'),
                                 ('Supplier#000000042'),
                                 ('Acme Rocket Skates'),
                                 ('definitely-not-a-supplier')),
    pb AS ({probe_rows}),
    hits AS (
      SELECT pb.probe_key, CAST(count(*) AS BIGINT) AS n_hit
      FROM pb JOIN bloom ON bloom.pos = pb.pos
      GROUP BY pb.probe_key
    )
    SELECT p.probe_key,
           coalesce(h.n_hit, 0) = {hashes} AS maybe_present,
           EXISTS (SELECT 1 FROM supplier s WHERE s.s_name = p.probe_key)
             AS actually_present
    FROM probes p LEFT JOIN hits h ON h.probe_key = p.probe_key
    ORDER BY p.probe_key
    """


@_q("sketch_bloom_membership", _bloom_oracle())
def sketch_bloom_membership(spark, sf):
    """Bloom-filter membership probes next to ground truth (no false
    negatives by construction; the two absent names exercise the negative
    path). The filter is its distinct set-bit position set — built with one
    distinct aggregate, broadcast to the probe side; md5-derived positions
    make it engine-independent. See operators/sketches.py."""
    from betfair_database_spark.operators import sketches

    s = _t(spark, sf, "supplier")
    bloom = sketches.bloom_positions(s, "s_name", hasher="md5")
    probes = spark.createDataFrame(
        [
            ("Supplier#000000001",),
            ("Supplier#000000007",),
            ("Supplier#000000042",),
            ("Acme Rocket Skates",),
            ("definitely-not-a-supplier",),
        ],
        ["probe_key"],
    )
    member = sketches.bloom_maybe_contains(
        F.broadcast(bloom), probes, "probe_key", hasher="md5"
    )
    truth = s.select(F.col("s_name").alias("probe_key")).distinct().withColumn(
        "actually_present", F.lit(True)
    )
    return (
        member.join(truth, "probe_key", "left")
        .select(
            "probe_key",
            "maybe_present",
            F.coalesce("actually_present", F.lit(False)).alias(
                "actually_present"
            ),
        )
        .orderBy("probe_key")
    )


@_q(
    "w5_range_interval_sum",
    """
    SELECT event_id,
           round(sum("value") OVER (
             PARTITION BY user_id
             ORDER BY CAST(epoch_us(ts) AS BIGINT)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
           ), 2) AS rolling_7d
    FROM events
    """,
)
def w5_range_interval_sum(spark, sf):
    """RANGE-frame window (the remaining frame kind beyond the suite's ROWS
    frames): per user, the trailing-7-day sum of value at each event. Both
    engines order by epoch MICROSECONDS derived with timezone-free
    arithmetic and bound the frame numerically (604800000000 us); ties in
    ts share a frame, so the sum is well-defined without a tiebreak. One hash exchange on user_id + one in-partition sort."""
    ev = _t(spark, sf, "events")
    # epoch micros via pure NTZ wall-clock arithmetic — unix_micros would
    # need an NTZ->LTZ cast, which shifts by the session offset and (worse)
    # NON-uniformly across DST transitions, silently moving frame bounds
    # relative to the oracle's naive epoch_us.
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us)
        .rangeBetween(-604800000000, 0)
    )
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 2).alias("rolling_7d")
    )


@_q(
    "agg_filtered_conditional",
    """
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT)
             AS n_big,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                        FILTER (WHERE o_orderpriority = '1-URGENT')
                      AS DOUBLE)
                 / nullif(count(*) FILTER (WHERE o_orderpriority = '1-URGENT'),
                          0), 2) AS avg_urgent
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_filtered_conditional(spark, sf):
    """FILTER-clause aggregates (SQL:2003) in one grouped pass: Spark
    expresses them as count_if / conditional sums over the SAME hash
    aggregate — no per-condition scans. The filtered mean sums in
    DECIMAL(38,6) (exact, associative) before dividing, so partial-agg
    order can't flip the rounded cent on either engine."""
    o = _t(spark, sf, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    usum = F.sum(
        F.when(urgent, F.col("o_totalprice").cast("decimal(38,6)"))
    )
    ucnt = F.count(F.when(urgent, F.lit(1)))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
            F.countDistinct("o_custkey").alias("n_cust"),
            F.round(
                usum.cast("double") / F.nullif(ucnt, F.lit(0)), 2
            ).alias("avg_urgent"),
        )
        .orderBy("o_orderstatus")
    )


@_q(
    "agg_ordered_listagg",
    """
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
           CAST(count(*) AS BIGINT) AS n
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def agg_ordered_listagg(spark, sf):
    """Ordered string aggregation (LISTAGG / string_agg): collect_list is
    partition-order-dependent, so the list is array_sort()ed before joining
    — the only way the concatenated string is deterministic at any
    parallelism (and matches the oracle's ORDER BY clause)."""
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    return (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "suppliers"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("n_name")
    )


@_q(
    "multimodal_decode_mp4_avi",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'video/mp4'
                ELSE 'video/x-msvideo' END AS mime,
           CAST(NULL AS BIGINT) AS width,
           CAST(NULL AS BIGINT) AS height,
           CASE WHEN doc_id % 2 = 0 THEN (n_chars % 90 + 1) * 100
                ELSE (n_chars % 50 + 1) * 40 END AS duration_ms,
           CASE WHEN doc_id % 2 = 0 THEN 132 ELSE 88 END AS n_bytes
    FROM documents
    """,
)
def multimodal_decode_mp4_avi(spark, sf):
    """Video-container round trip (closes the image/audio/VIDEO triple):
    synthesize structurally-real MP4 (ftyp + moov/mvhd) and RIFF-AVI (avih)
    payloads, walk the boxes/chunks back to duration, verify against the
    closed form. Header walks only — the same codec-less contract as the
    JPEG-SOF and MP3-frame decoders."""
    from betfair_database_spark.operators import multimodal

    media = multimodal.synthesize_media_video(_t(spark, sf, "documents"))
    return multimodal.decode_media(media)


@_q(
    "sketch_kmv_union",
    """
    WITH a AS (
      SELECT DISTINCT
        CAST(CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
             AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ),
    b AS (
      SELECT DISTINCT
        CAST(CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
             AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    ),
    ka AS (SELECT u FROM a ORDER BY u LIMIT 256),
    kb AS (SELECT u FROM b ORDER BY u LIMIT 256),
    merged AS (SELECT u FROM (SELECT u FROM ka UNION SELECT u FROM kb)
               ORDER BY u LIMIT 256),
    agg AS (SELECT max(u) AS kth, count(*) AS n_kept FROM merged),
    ex AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
           FROM orders)
    SELECT CAST(CASE WHEN agg.n_kept < 256 THEN agg.n_kept
                ELSE round(255.0 / agg.kth) END AS BIGINT) AS kmv_union_estimate,
           ex.exact_distinct
    FROM agg, ex
    """,
)
def sketch_kmv_union(spark, sf):
    """KMV sketch MERGE: the union of two per-partition sketches (k-min of
    the combined k-min sets) estimates the distinct count of the combined
    input — the associativity that makes the sketch a one-pass distributed
    aggregate (each partition keeps k values, merges are k-row unions).
    Demonstrated by sketching the early/late order halves separately and
    merging, next to the exact answer."""
    from betfair_database_spark.operators.sketches import uniform_hash

    o = _t(spark, sf, "orders")
    cut = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")

    def kmin(side):
        return (
            side.select(uniform_hash(F.col("o_custkey"), "md5").alias("u"))
            .distinct()
            .orderBy("u")
            .limit(256)
        )

    ka = kmin(o.where(F.col("o_orderdate") < cut))
    kb = kmin(o.where(F.col("o_orderdate") >= cut))
    merged = ka.union(kb).distinct().orderBy("u").limit(256)
    agg = merged.agg(F.max("u").alias("kth"), F.count("*").alias("n_kept"))
    est = F.when(
        F.col("n_kept") < 256, F.col("n_kept").cast("double")
    ).otherwise(F.round(F.lit(255.0) / F.col("kth")))
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    return agg.select(
        est.cast("long").alias("kmv_union_estimate")
    ).join(F.broadcast(exact))


_TEMPERATURE_ORACLE = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 < 4 THEN 'head'
              WHEN doc_id % 7 < 6 THEN 'body' ELSE 'tail' END AS bucket
  FROM documents
),
c AS (SELECT bucket, count(*) AS n FROM base GROUP BY bucket),
m AS (SELECT min(n) AS nmin FROM c),
t AS (
  SELECT c.bucket,
         floor(sqrt(CAST(m.nmin AS DOUBLE) / CAST(c.n AS DOUBLE)) * 10000 + 0.5) AS thr
  FROM c, m
)
SELECT d.doc_id, d.bucket
FROM base d JOIN t USING (bucket)
WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 < t.thr
"""


@_q("sample_temperature_mix", _TEMPERATURE_ORACLE)
def sample_temperature_mix(spark, sf):
    """Temperature resampling at alpha=0.5 (target share ∝ observed^0.5 —
    the multilingual-training flattening rule) over a skewed 4:2:1
    stratum, via the closed form rate_g = sqrt(n_min/n_g): the smallest
    stratum is kept whole, larger strata shrink toward it (the corpus's
    own source mix is uniform, which would be a no-op). Deterministic md5
    membership; see sampling.temperature_resample."""
    from betfair_database_spark.operators import sampling

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 < 4, "head")
        .when(F.col("doc_id") % 7 < 6, "body")
        .otherwise("tail")
        .alias("bucket"),
    )
    return sampling.temperature_resample(d, "bucket", alpha=0.5)


_SHARDS_ORACLE = """
WITH ranked AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS r
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(CASE WHEN r % 16 < 8 THEN r % 8 ELSE 7 - (r % 8) END AS INT) AS shard
FROM ranked
"""


@_q("sample_balanced_shards", _SHARDS_ORACLE)
def sample_balanced_shards(spark, sf):
    """Weight-balanced shard assignment (8 shards, n_chars as weight):
    snake-deal the weight-desc global rank so shard totals stay within one
    max-row weight. The global rank is computed distributed (range
    exchange + partition-local row_number + tiny offset map), never a
    single-partition window; the oracle is the equivalent plain global
    window. See sampling.balanced_shards."""
    from betfair_database_spark.operators import sampling

    d = _t(spark, sf, "documents").select("doc_id", "n_chars")
    return sampling.balanced_shards(d, n_shards=8, weight_col="n_chars")
