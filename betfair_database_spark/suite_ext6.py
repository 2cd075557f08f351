"""Suite extension 6: web-corpus curation operators — per-domain capping
(the RefinedWeb/FineWeb step that stops one domain from dominating a
crawl) and fastText-style hashed linear classifier inference (the
standard quality-filter shape).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py``.
"""

from __future__ import annotations

from betfair_database_spark.operators import sampling, textstats
from betfair_database_spark.suite import _q, _t

_DOMAIN_CAP_ORACLE = """
WITH rk AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM rk WHERE rk <= 40
"""


@_q("sample_domain_cap", _DOMAIN_CAP_ORACLE)
def sample_domain_cap(spark, sf):
    """Keep at most 40 documents per source, preferring the longest
    (n_chars as the quality proxy; ties on doc_id). One domain-keyed
    shuffle; the window partitions by domain so no task ever sees more
    than one domain's rows. See sampling.domain_cap."""
    return sampling.domain_cap(
        _t(spark, sf, "documents").select("doc_id", "source", "n_chars"),
        cap=40,
        quality_col="n_chars",
    )


# int(first 8 hex chars of md5) in pure ANSI-ish SQL (DuckDB has no
# hex->int cast): positional digit expansion over strpos
_HEX8 = " + ".join(
    f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)

_CLASSIFIER_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
  FROM documents
),
tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
hx AS (SELECT doc_id, substr(md5(tok), 1, 8) AS h FROM tok2),
wt AS (
  SELECT doc_id,
         ((({_HEX8}) % 1024) * 2654435761) % 1000003 AS w
  FROM hx
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(w) AS BIGINT) AS wsum
  FROM wt GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(wsum / n_tokens / 1000003.0 - 0.5, 6) AS score,
       CASE WHEN wsum / n_tokens / 1000003.0 - 0.5 > 0
            THEN 'keep' ELSE 'drop' END AS label
FROM agg
"""


@_q("text_classifier_score", _CLASSIFIER_ORACLE)
def text_classifier_score(spark, sf):
    """Hashed bag-of-words linear classifier inference over every
    document: md5-bucketed features, integer weight table (exact
    aggregation — no floating-point order pinning needed), one doc-keyed
    aggregation. See textstats.hashed_classifier_score."""
    return textstats.hashed_classifier_score(_t(spark, sf, "documents"))


_PQ_ORACLE = """
WITH a AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS c, embedding AS av
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
subspaces AS (SELECT unnest([0,1,2,3,4,5,6,7]) AS s),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
enc AS (
  SELECT e.vec_id, sp.s, a.c,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform([0,1,2,3,4,5,6,7], i ->
             (CAST(e.embedding[sp.s * 8 + i + 1] AS DOUBLE)
              - CAST(a.av[sp.s * 8 + i + 1] AS DOUBLE))
             * (CAST(e.embedding[sp.s * 8 + i + 1] AS DOUBLE)
                - CAST(a.av[sp.s * 8 + i + 1] AS DOUBLE)))),
           (acc, x) -> acc + x) AS d2
  FROM embeddings e, subspaces sp, a
),
codes AS (
  SELECT vec_id, s, c
  FROM (SELECT vec_id, s, c,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d2, c) AS rk
        FROM enc)
  WHERE rk = 1
),
dtab AS (
  SELECT sp.s, a.c,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform([0,1,2,3,4,5,6,7], i ->
             (CAST(q.qv[sp.s * 8 + i + 1] AS DOUBLE)
              - CAST(a.av[sp.s * 8 + i + 1] AS DOUBLE))
             * (CAST(q.qv[sp.s * 8 + i + 1] AS DOUBLE)
                - CAST(a.av[sp.s * 8 + i + 1] AS DOUBLE)))),
           (acc, x) -> acc + x) AS d2
  FROM subspaces sp, a, q
),
scored AS (
  SELECT k.vec_id,
         string_agg(CAST(k.c - 1 AS VARCHAR), '-' ORDER BY k.s) AS pq_code,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(d.d2 ORDER BY k.s)),
                           (acc, x) -> acc + x), 6) AS adc_d2
  FROM codes k JOIN dtab d ON k.s = d.s AND k.c = d.c
  GROUP BY k.vec_id
)
SELECT vec_id, pq_code, adc_d2
FROM scored ORDER BY adc_d2, vec_id LIMIT 10
"""


@_q("knn_pq_adc_top10", _PQ_ORACLE)
def knn_pq_adc_top10(spark, sf):
    """Product-quantization ANN with asymmetric distance computation: 8
    subspaces x 16 codes over the 64-dim embeddings (codebook seeded from
    the 16 lowest-id vectors), query = vec 0, scored by m table lookups
    per candidate. The billion-scale compression tier of the ANN family —
    m bytes per vector, table-lookup-bound scan, no shuffle, exact
    cross-engine reproducibility (fixed-order sums, lowest-code ties).
    See similarity.pq_adc_topk."""
    from betfair_database_spark.operators import similarity as sim
    from betfair_database_spark.suite import _query_vec

    return sim.pq_adc_topk(
        _t(spark, sf, "embeddings"), _query_vec(spark, sf), k=10
    )


_PIPE_CLS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
  FROM documents
),
tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
hx AS (SELECT doc_id, substr(md5(tok), 1, 8) AS h FROM tok2),
wt AS (
  SELECT doc_id,
         ((({_HEX8}) % 1024) * 2654435761) % 1000003 AS w
  FROM hx
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(w) AS BIGINT) AS wsum
  FROM wt GROUP BY doc_id
),
scored AS (
  SELECT a.doc_id, a.n_tokens,
         round(a.wsum / a.n_tokens / 1000003.0 - 0.5, 6) AS score,
         d.source
  FROM agg a JOIN documents d USING (doc_id)
  WHERE a.wsum / a.n_tokens / 1000003.0 - 0.5 > 0
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, source, n_tokens, score,
           row_number() OVER (PARTITION BY source
                              ORDER BY score DESC, doc_id) AS rk
    FROM scored)
  WHERE rk <= 30
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       min(score) AS min_score,
       max(score) AS max_score
FROM capped GROUP BY source
"""


@_q("pipeline_classifier_domain_cap", _PIPE_CLS_ORACLE)
def pipeline_classifier_domain_cap(spark, sf):
    """The round-6 curation operators composed into ONE logical plan:
    classifier-gate ('keep' docs only) -> per-domain cap (top 30 by
    score) -> per-source summary. Catalyst pushes the gate under the
    cap's window shuffle, so the corpus shuffles once on the domain key
    and once for the doc-keyed classifier aggregation — the whole
    pipeline is two exchanges regardless of corpus size. Summary columns
    (counts, integer token sums, min/max score) are aggregation-order-
    independent, so the result hash-matches cross-engine."""
    from pyspark.sql import functions as F

    d = _t(spark, sf, "documents")
    scored = (
        textstats.hashed_classifier_score(d)
        .where(F.col("label") == "keep")
        .join(d.select("doc_id", "source"), "doc_id")
    )
    capped = sampling.domain_cap(
        scored, cap=30, quality_col="score"
    )
    return capped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
  FROM documents
),
tok2 AS (SELECT doc_id, lang, tok FROM tok WHERE tok <> ''),
hx AS (SELECT doc_id, lang, substr(md5(tok), 1, 8) AS h FROM tok2),
bk AS (SELECT doc_id, lang, ({_HEX8}) % 1024 AS b FROM hx),
tables AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c_raw,
         CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS c_tgt
  FROM bk GROUP BY b
),
totals AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM tables),
lr AS (
  SELECT b,
         ln((c_tgt + 1) / (t.t_tgt + 1024.0))
         - ln((c_raw + 1) / (t.t_raw + 1024.0)) AS lr
  FROM tables, totals t
),
per_bucket AS (
  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS cnt
  FROM bk GROUP BY doc_id, b
),
scored AS (
  SELECT p.doc_id,
         CAST(sum(p.cnt) AS BIGINT) AS n_tokens,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(p.cnt * l.lr ORDER BY p.b)),
                           (acc, x) -> acc + x), 4) AS importance
  FROM per_bucket p JOIN lr l USING (b)
  GROUP BY p.doc_id
)
SELECT doc_id, n_tokens, importance
FROM scored ORDER BY importance DESC, doc_id LIMIT 20
"""


@_q("sample_dsir_importance_topk", _DSIR_ORACLE)
def sample_dsir_importance_topk(spark, sf):
    """DSIR data selection: hashed-unigram importance of every document
    w.r.t. the English subset as the target distribution, top-20 kept.
    Bucket tables are n_buckets-row broadcasts; per-doc scores fold
    cnt*log_ratio in bucket order (order-pinned floating sum). See
    sampling.dsir_importance_topk."""
    from pyspark.sql import functions as F

    return sampling.dsir_importance_topk(
        _t(spark, sf, "documents"), F.col("lang") == "en", k=20
    )


def _mh_recall_oracle() -> str:
    from betfair_database_spark.operators import dedup

    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
                               i -> substr(lower(text), CAST(i AS INT), 5))) AS w
  FROM documents
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
t_inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y ON x.w = y.w AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT a, b
  FROM t_inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
),
tx AS (
  SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS x, w
  FROM sh
),
mh AS (
  SELECT doc_id, s, min((a * x + b) % {dedup.MINHASH_P}) AS h
  FROM tx, (VALUES {dedup.minhash_oracle_values(16)}) t(s, a, b)
  GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, CAST(s // 4 AS INT) AS band,
         md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY s)) AS bh
  FROM mh GROUP BY doc_id, s // 4
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
),
c_inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c JOIN sh ta ON ta.doc_id = c.a
              JOIN sh tb ON tb.doc_id = c.b AND tb.w = ta.w
  GROUP BY c.a, c.b
),
found AS (
  SELECT i.a, i.b
  FROM c_inter i JOIN sz wa ON wa.doc_id = i.a JOIN sz wb ON wb.doc_id = i.b
  WHERE CAST(i.i AS DOUBLE) / (wa.n + wb.n - i.i) >= 0.8
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
       (SELECT CAST(count(*) AS BIGINT) FROM found) AS n_found,
       (SELECT CAST(count(*) AS BIGINT)
        FROM found f JOIN truth t ON f.a = t.a AND f.b = t.b) AS n_hit,
       round((SELECT count(*) FROM found f JOIN truth t
              ON f.a = t.a AND f.b = t.b) * 1.0
             / (SELECT count(*) FROM truth), 4) AS recall
"""


@_q("dedup_minhash_recall", _mh_recall_oracle())
def dedup_minhash_recall(spark, sf):
    """MinHash-LSH recall harness — the dedup analogue of the ANN
    knn_recall rows: exact 5-gram Jaccard >= 0.8 pairs (prefix-filter
    ssjoin) as truth vs the 16-hash/2-band LSH pipeline's verified
    output, reported as one row (n_true, n_found, n_hit, recall). The
    round-7 sweep at a fixed 16-hash budget picked bands=4 (rows=4):
    measured recall 0.96 -> 1.0000 at BOTH sf0.01 and sf0.1 vs bands=2,
    and 2.5 s vs 18.7 s at sf0.1 vs bands=8 (r=2 collides on every
    moderately-similar pair — candidate blow-up). This
    is the measurement users need to TUNE bands/hashes: the s-curve's
    false-negative rate becomes a number instead of a formula. All three
    counts are bounded aggregates over pair frames; the corpus-sized
    work is the two dedup operators themselves."""
    from pyspark.sql import functions as F

    from betfair_database_spark.operators import dedup as dd

    d = _t(spark, sf, "documents")
    truth = dd.jaccard_ssjoin(d, threshold=0.8, k=5).select("a", "b")
    found = dd.minhash_near_dups(
        d, num_hashes=16, bands=4, threshold=0.8
    ).select("a", "b")
    hit = found.join(truth, ["a", "b"], "left_semi")
    return (
        truth.agg(F.count("*").alias("n_true"))
        .crossJoin(F.broadcast(found.agg(F.count("*").alias("n_found"))))
        .crossJoin(F.broadcast(hit.agg(F.count("*").alias("n_hit"))))
        .select(
            "n_true",
            "n_found",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_true"), 4).alias("recall"),
        )
    )


_P8B_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderdate,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 + 1 AS tot
  FROM orders
)
SELECT o_orderkey,
       strftime(CAST(date_trunc('month',
                 make_date(CAST(tot // 12 AS INT), CAST(tot % 12 + 1 AS INT), 1)
                 + to_days(CAST(day(o_orderdate) - 1 AS INT))) AS TIMESTAMP),
                '%Y-%m-%d %H:%M:%S') AS next_month_start,
       strftime(o_orderdate
                + to_days(CAST((3 - dayofweek(o_orderdate) + 7) % 7 AS INT)),
                '%Y-%m-%d') AS next_wednesday,
       CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) + 43200
         AS noon_epoch
FROM base
"""


@_q("p8b_datetime_modifiers", _P8B_ORACLE)
def p8b_datetime_modifiers(spark, sf):
    """The SQLite datetime MODIFIER grammar through the select() dialect
    surface, driver-checkable: '+1 months'+'start of month' (exercising
    SQLite's day-overflow roll on month-end order dates — the DuckDB
    oracle reproduces the roll with explicit calendar arithmetic, since
    its own +INTERVAL clamps), 'weekday 3', and '+12 hours' through
    unixepoch(). Column bases take the epoch-ms macro chain; whole-stage
    codegen, no UDFs. Full scan (the round-6 10% slice is restored now
    that the bridge compiles cheaply — round 7): the small-SF parquet
    arrives as ONE split, so the compute-dense projection is widened to
    cluster parallelism first — the bench-scale analogue of the ~100k
    splits a 100 TB table would arrive with."""
    from betfair_database_spark.plans.dialect import (
        register_sqlite_functions,
        translate_where,
    )

    register_sqlite_functions(spark)
    width = spark.sparkContext.defaultParallelism
    _t(spark, sf, "orders").repartition(width).createOrReplaceTempView(
        "orders_v"
    )
    exprs = {
        "next_month_start": "datetime(o_orderdate, '+1 months', 'start of month')",
        "next_wednesday": "date(o_orderdate, 'weekday 3')",
        "noon_epoch": "unixepoch(o_orderdate, '+12 hours')",
    }
    sel = ", ".join(
        f"({translate_where(e, projection=True)}) AS {name}"
        for name, e in exprs.items()
    )
    return spark.sql(f"SELECT o_orderkey, {sel} FROM orders_v")
