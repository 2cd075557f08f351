"""Suite extension 8: OHLC time-series downsampling, sequential path
mining over event streams, a Gopher-style document quality gate, greedy
k-center diversity selection over embeddings, and exact inter-arrival
quantiles per event type.

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py`` (aliases identical on both
sides, doubles rounded before compare, deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from betfair_database_spark.operators import similarity, textstats, timeseries
from betfair_database_spark.suite import _q, _t

# =========================================================================
# ts_resample_ohlc — candlestick/metric downsampling (open/high/low/close)
# =========================================================================

_OHLC_ORACLE = r"""
WITH b AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         event_type, ts, event_id, value
  FROM events
),
r AS (
  SELECT hour, event_type, value,
         row_number() OVER (PARTITION BY hour, event_type
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY hour, event_type
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM b
)
SELECT hour, event_type,
       round(max(CASE WHEN ra = 1 THEN value END), 2) AS open,
       round(max(value), 2) AS high,
       round(min(value), 2) AS low,
       round(max(CASE WHEN rd = 1 THEN value END), 2) AS close,
       count(*) AS n,
       round(sum(value), 2) AS volume
FROM r GROUP BY hour, event_type
"""


@_q("ts_resample_ohlc", _OHLC_ORACLE)
def ts_resample_ohlc(spark, sf):
    """Hourly OHLC per event type. The oracle pins open/close with
    row_number windows; the engine side is the scale-correct plan — a
    single hash aggregate whose open/close are min/max over a
    struct(ts, event_id, value) (deterministic lexicographic tie-break),
    so no per-key sort and full map-side partial aggregation. See
    timeseries.resample_ohlc."""
    ev = _t(spark, sf, "events")
    bucket = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
        "hour"
    )
    out = timeseries.resample_ohlc(
        ev, bucket, ["event_type"], "ts", "event_id", "value"
    )
    return out.select(
        "hour",
        "event_type",
        F.round("open", 2).alias("open"),
        F.round("high", 2).alias("high"),
        F.round("low", 2).alias("low"),
        F.round("close", 2).alias("close"),
        "n",
        F.round("volume", 2).alias("volume"),
    )


# =========================================================================
# ev_path_trigrams — most common 3-step user journeys
# =========================================================================

_PATH_ORACLE = r"""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 20
"""


@_q("ev_path_trigrams", _PATH_ORACLE)
def ev_path_trigrams(spark, sf):
    """Top-20 event-type trigrams over per-user time-ordered streams —
    sequence mining / funnel discovery. One shuffle on user_id (per-user
    sort bounded by a single user's history, never global), one hash agg
    on the path, then a 20-row top-k. See timeseries.path_ngrams."""
    ev = _t(spark, sf, "events")
    paths = timeseries.path_ngrams(
        ev, "user_id", "ts", "event_id", "event_type", n=3, sep=">"
    )
    return paths.orderBy(F.desc("n"), "path").limit(20)


# =========================================================================
# text_gopher_filter — Gopher-rule quality gate battery
# =========================================================================

_GOPHER_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     w -> w <> '') AS ws,
         length(regexp_replace(trim(lower(text)), '\s+', '', 'g')) AS sum_wlen
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(ws) AS INT) AS n_words,
         round(sum_wlen / CAST(nullif(len(ws), 0) AS DOUBLE), 4) AS mean_wlen,
         round(len(list_distinct(ws))
               / CAST(nullif(len(ws), 0) AS DOUBLE), 4) AS ttr
  FROM d
)
SELECT doc_id, n_words, mean_wlen, ttr,
       coalesce(n_words BETWEEN 50 AND 100000
                AND mean_wlen BETWEEN 3.0 AND 10.0
                AND ttr >= 0.2, FALSE) AS passes
FROM m
"""


@_q("text_gopher_filter", _GOPHER_ORACLE)
def text_gopher_filter(spark, sf):
    """Gopher-style quality gate: word-count bounds, mean-word-length
    bounds, type-token-ratio floor, and the combined pass decision.
    Narrow projection, zero shuffles (the word-length sum is regex
    arithmetic on the raw string, codegen-resident). See
    textstats.gopher_quality.

    NOTE: comparisons are on the ROUNDED mean_wlen/ttr on both sides so
    the boolean can never disagree with the printed features.
    """
    docs = _t(spark, sf, "documents")
    out = textstats.gopher_quality(docs)
    # re-derive passes from the rounded columns (oracle does the same)
    return out.select(
        "doc_id",
        "n_words",
        "mean_wlen",
        "ttr",
        F.coalesce(
            F.col("n_words").between(50, 100000)
            & F.col("mean_wlen").between(3.0, 10.0)
            & (F.col("ttr") >= 0.2),
            F.lit(False),
        ).alias("passes"),
    )


# =========================================================================
# sample_kcenter_diversity — greedy farthest-point exemplar selection
# =========================================================================


def _sqdist_sql(e_alias: str, c_alias: str) -> str:
    return (
        f"round(sum((CAST({e_alias}.embedding[i] AS DOUBLE)"
        f" - CAST({c_alias}.embedding[i] AS DOUBLE))"
        f" * (CAST({e_alias}.embedding[i] AS DOUBLE)"
        f" - CAST({c_alias}.embedding[i] AS DOUBLE))), 4)"
    )


def _kcenter_oracle(k: int = 4, dims: int = 64) -> str:
    """Unrolled greedy k-center: the same rounded-before-least distances
    and (dmin DESC, vec_id) argmax the engine side uses — iterative with
    a pinned trip count, so fully oracle-able (kmeans precedent)."""
    rng = f"range(1, {dims + 1}) t(i)"
    parts = [
        "e AS (SELECT vec_id, embedding FROM embeddings)",
        "c1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1)",
        f"""d1 AS (
  SELECT e.vec_id, {_sqdist_sql('e', 'c1')} AS dmin
  FROM e, c1, {rng} GROUP BY e.vec_id)""",
    ]
    for j in range(2, k + 1):
        parts.append(
            f"s{j} AS (SELECT vec_id, dmin FROM d{j - 1} "
            f"ORDER BY dmin DESC, vec_id LIMIT 1)"
        )
        if j < k:
            parts.append(
                f"c{j} AS (SELECT e.vec_id, e.embedding FROM e "
                f"JOIN s{j} USING (vec_id))"
            )
            parts.append(
                f"""d{j} AS (
  SELECT d.vec_id, least(d.dmin, {_sqdist_sql('e', f'c{j}')}) AS dmin
  FROM d{j - 1} d JOIN e USING (vec_id), c{j}, {rng}
  GROUP BY d.vec_id, d.dmin)"""
            )
    tails = ["SELECT 1 AS sel_rank, vec_id, 0.0 AS dist FROM c1"] + [
        f"SELECT {j}, vec_id, dmin FROM s{j}" for j in range(2, k + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(tails)


@_q("sample_kcenter_diversity", _kcenter_oracle(k=4, dims=64))
def sample_kcenter_diversity(spark, sf):
    """Greedy farthest-point (Gonzalez k-center) selection of 4 maximally
    spread exemplars — the diversity sampler dual to dedup. k-1 narrow
    scans with literal-expanded codegen distance chains; driver state is
    k vectors. Distances rounded to 4 decimals BEFORE the argmax on both
    sides so summation-order noise cannot flip a pick. See
    similarity.kcenter_select."""
    emb = _t(spark, sf, "embeddings")
    sel = similarity.kcenter_select(emb, k=4)
    return spark.createDataFrame(
        sel, schema="sel_rank INT, vec_id BIGINT, dist DOUBLE"
    )


# =========================================================================
# ev_interarrival_quantiles — exact median/p90 gap per event type
# =========================================================================

_INTERARRIVAL_ORACLE = r"""
WITH g AS (
  SELECT event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
)
SELECT event_type,
       CAST(count(gap_s) AS BIGINT) AS n_gaps,
       round(quantile_cont(gap_s, 0.5), 3) AS p50_s,
       round(quantile_cont(gap_s, 0.9), 3) AS p90_s
FROM g WHERE gap_s IS NOT NULL
GROUP BY event_type
"""


@_q("ev_interarrival_quantiles", _INTERARRIVAL_ORACLE)
def ev_interarrival_quantiles(spark, sf):
    """Exact (linear-interpolation) median and p90 inter-arrival seconds
    per event type — the burstiness profile. One user-keyless window on
    event_type (sort bounded per type) then Spark's exact `percentile`
    aggregate, which matches quantile_cont's interpolation. At 100 TB the
    exact percentile is the honest cost; the approx twin is
    agg_percentiles' approx_percentile path."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    secs = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " date_trunc('second', ts))"
    )
    gap = (secs - F.lag(secs).over(w)).alias("gap_s")
    return (
        ev.select("event_type", gap)
        .where(F.col("gap_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(F.expr("percentile(gap_s, 0.5)"), 3).alias("p50_s"),
            F.round(F.expr("percentile(gap_s, 0.9)"), 3).alias("p90_s"),
        )
    )


# =========================================================================
# Exact substring dedup (Lee et al. 2022) — spans + corpus rewrite
# =========================================================================

_ESD_CTES = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     w -> w <> '') AS ws
  FROM documents
),
t AS (SELECT doc_id, ws, len(ws) AS n FROM d),
g0 AS (
  SELECT doc_id,
         list_transform(range(1, greatest(n - 8 + 1, 0) + 1),
                        i -> struct_pack(pos := i,
                                         gram := array_to_string(ws[i:i+7], ' '))) AS gs
  FROM t
),
g AS (SELECT doc_id, unnest(gs) AS u FROM g0),
gg AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g),
dup AS (SELECT gram FROM gg GROUP BY gram HAVING count(*) > 1),
hits AS (SELECT gg.doc_id, gg.pos AS s, gg.pos + 7 AS e
         FROM gg JOIN dup USING (gram)),
m AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
grp AS (SELECT doc_id, s, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e) AS gid
        FROM m),
spans AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM grp GROUP BY doc_id, gid)
"""

_ESD_STATS_ORACLE = _ESD_CTES + r"""
SELECT t.doc_id, CAST(t.n AS INT) AS n_tokens,
       CAST(coalesce(count(spans.s), 0) AS INT) AS n_dup_spans,
       CAST(coalesce(sum(spans.e - spans.s + 1), 0) AS BIGINT) AS dup_tokens,
       round(coalesce(sum(spans.e - spans.s + 1), 0)
             / CAST(nullif(t.n, 0) AS DOUBLE), 4) AS dup_frac
FROM t LEFT JOIN spans USING (doc_id)
GROUP BY t.doc_id, t.n
"""


@_q("dedup_substring_stats", _ESD_STATS_ORACLE)
def dedup_substring_stats(spark, sf):
    """Exact-substring dedup accounting (Lee et al. 2022): per document
    the maximal corpus-duplicated >=8-token spans and the covered token
    fraction. The suffix-array modality re-expressed as a gram-count join
    + per-doc interval-merge window — shuffle volume grows with duplicate
    mass, never O(n^2). See dedup.exact_substring_stats."""
    from betfair_database_spark.operators import dedup

    return dedup.exact_substring_stats(_t(spark, sf, "documents"), l=8)


_ESD_REWRITE_ORACLE = _ESD_CTES + r""",
byid AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp
         FROM spans GROUP BY doc_id),
r AS (
  SELECT t.doc_id, t.ws, t.n,
         coalesce(b.sp, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS sp
  FROM t LEFT JOIN byid b USING (doc_id)
),
k AS (
  SELECT doc_id,
         list_transform(
           list_filter(range(1, n + 1),
                       i -> len(list_filter(sp,
                              x -> i >= x.s AND i <= x.e)) = 0),
           i -> ws[i]) AS kept
  FROM r
)
SELECT doc_id, CAST(len(kept) AS INT) AS n_kept,
       coalesce(array_to_string(kept, ' '), '') AS kept_text
FROM k
"""


@_q("dedup_substring_rewrite", _ESD_REWRITE_ORACLE)
def dedup_substring_rewrite(spark, sf):
    """Corpus rewrite removing every duplicated >=8-token span (all
    copies — the Lee et al. default). Per-row exists() over the tiny
    span list; the only shuffles are the gram count and the span merge.
    See dedup.exact_substring_rewrite."""
    from betfair_database_spark.operators import dedup

    return dedup.exact_substring_rewrite(_t(spark, sf, "documents"), l=8)


# =========================================================================
# knn_mmr_diverse_top5 — Maximal Marginal Relevance re-ranking
# =========================================================================


def _mmr_oracle(k: int = 5, dims: int = 64) -> str:
    """Unrolled greedy MMR: identical rounded cosines, identical
    0.5*rel - 0.5*maxsim combine, identical (score DESC, vec_id) argmax
    as similarity.mmr_rerank — the kcenter/kmeans unroll pattern."""
    rng = f"range(1, {dims + 1}) t(i)"

    def dot(a, b):
        return (
            f"sum(CAST({a}.embedding[i] AS DOUBLE)"
            f" * CAST({b}.embedding[i] AS DOUBLE))"
        )

    parts = [
        "e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0)",
        "q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)",
        f"""nr AS (
  SELECT e.vec_id, sqrt({dot('e', 'e')}) AS n
  FROM e, {rng} GROUP BY e.vec_id)""",
        f"""qn AS (SELECT sqrt({dot('q', 'q')}) AS qn FROM q, {rng})""",
        f"""rel AS (
  SELECT e.vec_id, round({dot('e', 'q')} / (nr.n * qn.qn), 4) AS rel
  FROM e JOIN nr USING (vec_id), q, qn, {rng}
  GROUP BY e.vec_id, nr.n, qn.qn)""",
        "s1 AS (SELECT vec_id, rel AS score FROM rel "
        "ORDER BY rel DESC, vec_id LIMIT 1)",
    ]
    for j in range(2, k + 1):
        p = j - 1  # newest selected
        parts.append(
            f"c{p} AS (SELECT e.vec_id, e.embedding, nr.n "
            f"FROM e JOIN s{p} USING (vec_id) JOIN nr USING (vec_id))"
        )
        sim = f"round({dot('e', f'c{p}')} / (nr.n * c{p}.n), 4)"
        if p == 1:
            parts.append(
                f"""ms{p} AS (
  SELECT e.vec_id, {sim} AS ms
  FROM e JOIN nr USING (vec_id), c{p}, {rng}
  GROUP BY e.vec_id, nr.n, c{p}.n)"""
            )
        else:
            parts.append(
                f"""ms{p} AS (
  SELECT e.vec_id, greatest(prev.ms, {sim}) AS ms
  FROM e JOIN nr USING (vec_id)
       JOIN ms{p - 1} prev ON prev.vec_id = e.vec_id, c{p}, {rng}
  GROUP BY e.vec_id, nr.n, c{p}.n, prev.ms)"""
            )
        sel = " UNION ALL ".join(
            f"SELECT vec_id FROM s{x}" for x in range(1, j)
        )
        parts.append(
            f"""s{j} AS (
  SELECT r.vec_id, round(0.5 * r.rel - 0.5 * m.ms, 5) AS score
  FROM rel r JOIN ms{p} m USING (vec_id)
  WHERE r.vec_id NOT IN ({sel})
  ORDER BY score DESC, r.vec_id LIMIT 1)"""
        )
    tails = [
        f"SELECT {j} AS sel_rank, vec_id, score FROM s{j}"
        for j in range(1, k + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(tails)


@_q("knn_mmr_diverse_top5", _mmr_oracle(k=5, dims=64))
def knn_mmr_diverse_top5(spark, sf):
    """MMR re-ranking (Carbonell & Goldstein 1998): greedy top-5 under
    0.5*relevance - 0.5*max-similarity-to-selected — the standard
    redundancy-penalizing re-ranker for retrieval/RAG. k narrow scans
    over a checkpointed (rel, norm) frame; rounded-before-argmax on both
    engines. See similarity.mmr_rerank."""
    from betfair_database_spark.suite import _query_vec

    emb = _t(spark, sf, "embeddings")
    # the query vector is NOT a candidate (else rank 1 trivially picks it
    # and every rank-2 score collapses to lam*rel - (1-lam)*rel = 0)
    sel = similarity.mmr_rerank(
        emb.where(F.col("vec_id") != 0), _query_vec(spark, sf), k=5, lam=0.5
    )
    return spark.createDataFrame(
        sel, schema="sel_rank INT, vec_id BIGINT, score DOUBLE"
    )


# =========================================================================
# ts_rolling_zscore — trailing-window anomaly detection
# =========================================================================

_ZSCORE_ORACLE = r"""
WITH w AS (
  SELECT event_id, event_type, value,
         avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS mu,
         stddev_samp(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS sd,
         count(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS cnt
  FROM events
)
SELECT event_id, event_type, round(value, 3) AS value,
       round((value - mu) / sd, 3) AS z
FROM w
WHERE cnt = 20 AND sd > 0 AND abs(round((value - mu) / sd, 3)) >= 3.0
"""


@_q("ts_rolling_zscore", _ZSCORE_ORACLE)
def ts_rolling_zscore(spark, sf):
    """Trailing-window anomaly detection: z-score of each value against
    the 20 PRECEDING rows of its event type (the streaming-friendly
    local outlier rule, vs ev_value_outliers' global one). One per-type
    window (sort bounded per type); the |z| >= 3 gate compares the
    ROUNDED z on both engines so frame-sum noise cannot flip a row."""
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    z = F.round((F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w), 3)
    return (
        ev.select(
            "event_id",
            "event_type",
            F.round("value", 3).alias("value"),
            z.alias("z"),
            F.count("value").over(w).alias("_cnt"),
            F.stddev_samp("value").over(w).alias("_sd"),
        )
        .where((F.col("_cnt") == 20) & (F.col("_sd") > 0) & (F.abs("z") >= 3.0))
        .drop("_cnt", "_sd")
    )


# =========================================================================
# graph_label_propagation — majority-LPA communities over co-activity
# =========================================================================

_EDGE_CTES = r"""
slots AS (
  SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS slot
  FROM events WHERE user_id < 1000
),
e AS (
  SELECT a.u AS a, b.u AS b
  FROM slots a JOIN slots b ON a.slot = b.slot AND a.u < b.u
  GROUP BY 1, 2 HAVING count(*) >= 8
),
dirs AS (SELECT a AS src, b AS dst FROM e
         UNION ALL SELECT b AS src, a AS dst FROM e)
"""


def _lpa_oracle(iters: int = 2) -> str:
    parts = [
        "WITH " + _EDGE_CTES.strip(),
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM dirs)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""n{i} AS (
  SELECT d.dst, l.label, count(*) AS c
  FROM dirs d JOIN l{i - 1} l ON l.node = d.src
  GROUP BY d.dst, l.label)"""
        )
        parts.append(
            f"""l{i} AS (
  SELECT dst AS node, label FROM (
    SELECT dst, label,
           row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
    FROM n{i}) WHERE rn = 1)"""
        )
    tail = f"""
SELECT CAST(label AS BIGINT) AS community,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(node) AS BIGINT) AS min_node
FROM l{iters} GROUP BY label
ORDER BY n_members DESC, community LIMIT 20
"""
    return ",\n".join(parts) + tail


@_q("graph_label_propagation", _lpa_oracle(iters=2))
def graph_label_propagation(spark, sf):
    """Two synchronous majority-LPA rounds over the bounded-cohort
    co-activity graph (same edge build as triangle/pagerank), reported as
    the top-20 communities by size. Deterministic tie-breaks make the
    normally-nondeterministic LPA oracle-able. See
    graph.label_propagation."""
    from betfair_database_spark.operators.graph import label_propagation

    ev = _t(spark, sf, "events").where(F.col("user_id") < 1000)
    slots = ev.select(
        F.col("user_id").alias("u"),
        F.date_trunc("hour", F.col("ts")).alias("slot"),
    ).distinct()
    a = slots.select(F.col("u").alias("a"), "slot")
    b = slots.select(F.col("u").alias("b"), "slot")
    # broadcast the b-side slots frame (cohort-bounded) — BHJ on slot
    edges = (
        a.join(F.broadcast(b), "slot")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= 8)
        .select("a", "b")
    )
    labels = label_propagation(edges, iters=2)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count("*").alias("n_members"),
            F.min("node").alias("min_node"),
        )
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


# =========================================================================
# ev_markov_transitions — first-order event-type transition matrix
# =========================================================================

_MARKOV_ORACLE = r"""
WITH p AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
c AS (SELECT from_type, to_type, count(*) AS n FROM p
      WHERE to_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY from_type)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / t.tot, 4) AS p
FROM c JOIN t USING (from_type)
"""


@_q("ev_markov_transitions", _MARKOV_ORACLE)
def ev_markov_transitions(spark, sf):
    """First-order Markov transition matrix of event types over per-user
    streams — P(next | current) with counts. The unnormalized half is
    path_ngrams at n=2; the row-normalization is a broadcast-sized re-agg
    of the (from, to) count table."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    # types x types rows: materialize once so the row-normalization re-agg
    # doesn't replay the corpus window (ev_type_drift_kl's pattern)
    c = (
        p.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    )
    t = c.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 4).alias("p"),
    )


# =========================================================================
# pipeline_gopher_dedup_summary — quality gate -> substring dedup -> totals
# =========================================================================

_GOPHER_DEDUP_ORACLE = (
    r"""
WITH gq AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                              w -> w <> '')) AS BIGINT) AS nw,
         length(regexp_replace(trim(lower(text)), '\s+', '', 'g')) AS swl,
         len(list_distinct(list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             w -> w <> ''))) AS nd
  FROM documents),
passdocs AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN gq USING (doc_id)
  WHERE gq.nw BETWEEN 50 AND 100000
    AND swl / CAST(gq.nw AS DOUBLE) BETWEEN 3.0 AND 10.0
    AND nd / CAST(gq.nw AS DOUBLE) >= 0.2),
"""
    + _ESD_CTES.strip().removeprefix("WITH").replace(
        "FROM documents", "FROM passdocs", 1
    )
    + r""",
stats AS (
  SELECT t.doc_id, t.n,
         coalesce(sum(spans.e - spans.s + 1), 0) AS dup
  FROM t LEFT JOIN spans USING (doc_id)
  GROUP BY t.doc_id, t.n)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_pass,
       CAST(coalesce(sum(n), 0) AS BIGINT) AS tokens_in,
       CAST(coalesce(sum(dup), 0) AS BIGINT) AS dup_tokens_removed,
       CAST(coalesce(sum(n - dup), 0) AS BIGINT) AS tokens_kept
FROM stats
"""
)


@_q("pipeline_gopher_dedup_summary", _GOPHER_DEDUP_ORACLE)
def pipeline_gopher_dedup_summary(spark, sf):
    """Composed curation pipeline in the realistic order: Gopher quality
    gate FIRST (cheap zero-shuffle projection prunes the corpus), exact
    substring dedup SECOND (gram counts computed over survivors only —
    at 100 TB the gate's selectivity directly shrinks the only large
    shuffle), then a one-row corpus accounting (docs in/past gate,
    tokens in, duplicated tokens removed, tokens kept). The n_docs
    column rides in as a broadcast 1-row cross join, not a driver
    collect."""
    from betfair_database_spark.operators import dedup

    docs = _t(spark, sf, "documents")
    gq = textstats.gopher_quality(docs)
    # materialize the survivors once: the substring-dedup stage branches
    # its input three ways (grams, span join, totals), and without a cut
    # each branch would re-scan AND re-gate the full corpus. At 100 TB
    # this is where a pipeline writes its intermediate to storage; the
    # lazy local checkpoint is the single-box analogue.
    passing = docs.join(
        gq.where(F.col("passes")).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    stats = dedup.exact_substring_stats(passing, l=8)
    totals = stats.agg(
        F.count("*").alias("n_pass"),
        F.coalesce(F.sum(F.col("n_tokens").cast("long")), F.lit(0)).alias(
            "tokens_in"
        ),
        F.coalesce(F.sum("dup_tokens"), F.lit(0)).alias("dup_tokens_removed"),
        F.coalesce(
            F.sum(F.col("n_tokens").cast("long") - F.col("dup_tokens")),
            F.lit(0),
        ).alias("tokens_kept"),
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return F.broadcast(n_docs).crossJoin(totals).select(
        "n_docs", "n_pass", "tokens_in", "dup_tokens_removed", "tokens_kept"
    )
