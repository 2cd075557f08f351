"""Suite extension 11 (round 10): ANN vector deletion under the oracle
gate, and materialized-rollup routing verified against a direct
aggregate.

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py`` (aliases identical on both
sides, doubles rounded before compare, deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betfair_database_spark.operators import similarity
from betfair_database_spark.suite import _q, _t

# =========================================================================
# knn_ann_index_deleted_top10 — build → delete → probe
# =========================================================================
#
# The pytest layer pins the delete protocol's mechanics (crash windows on
# both sides of the commit, idempotent re-run, byte-identity of untouched
# cells); this row puts the RESULT under DuckDB hash scrutiny: the index
# is built from every vector, ids with vec_id % 7 = 3 are deleted, and
# the probe reads the final manifest-resolved file set with EVERY cell
# probed — so the expected answer is the exact cosine top-10 over the
# surviving vectors, which the oracle computes relationally over the
# filtered set. A deleted id that keeps serving, a survivor lost by the
# cell rewrite, or a manifest-resolution slip all change the hash.

_ANN_DELETE_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
kept AS (SELECT * FROM embeddings WHERE vec_id % 7 <> 3),
scored AS (
  SELECT e.vec_id,
         round(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))), 4) AS cos_sim
  FROM kept e, q, range(1, 65) t(i)
  GROUP BY e.vec_id
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


# =========================================================================
# knn_ann_index_rebuilt_top10 — build → append → RECLUSTER → probe
# =========================================================================
#
# The rebuild retrains IVF centroids + PQ codebook on current contents
# and swaps the whole layout under the atomic manifest commit; probing
# all cells with exact rerank must still give the exact cosine top-10
# over the union — a row lost in the re-encode, a duplicate from the
# swap, or manifest/codebook inconsistency changes the hash. The oracle
# is the same exact-cosine top-10 the append-lifecycle row uses.


from betfair_database_spark.suite_ext10 import _ANN_APPEND_ORACLE


@_q(
    "knn_ann_index_rebuilt_top10",
    # exact cosine over ALL vectors — identical expected answer to the
    # append-lifecycle row (same union), via the same relational oracle
    _ANN_APPEND_ORACLE,
)
def knn_ann_index_rebuilt_top10(spark, sf):
    """Build from one third, append the rest, then RECLUSTER
    (rebuild_ann_index) and probe all cells with exact rerank."""
    import shutil
    import tempfile

    emb = _t(spark, sf, "embeddings")
    base = emb.where(F.col("vec_id") % 3 == 0)
    centroids = similarity.kmeans_seeds(base, 4)
    row = emb.where(F.col("vec_id") == 0).select("embedding").first()
    q = [float(v) for v in row[0]]

    path = tempfile.mkdtemp(prefix="bfdb_ann_rebuild_gate_")
    try:
        similarity.write_ann_index(base, path, centroids, train_iters=0)
        similarity.append_ann_index(emb.where(F.col("vec_id") % 3 != 0), path)
        similarity.rebuild_ann_index(
            spark, path, kmeans_iters=2, train_iters=0
        )
        out = similarity.query_ann_index(
            spark, path, None, None, q, k=10, nprobe=4, rerank="exact"
        ).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


# =========================================================================
# rollup_route_events_agg — covered aggregate served from stored partials
# =========================================================================
#
# The round-10 rollup auto-routing never reads the fact table for a
# covered GROUP BY: it merges at-rest PARTIALS (stored per (partition
# bucket, dims) cell) to the requested grain, with dim filters applied on
# the partials frame. The DB-surface wiring (select() routing, the
# _read_index-raises pin, stale fallback) is pytest-pinned in
# test_maintenance.py::TestRollupRouting; this row puts the MERGE
# ALGEBRA itself under DuckDB hash scrutiny: partials are materialized
# to parquet at a (user_id % 32, event_type) grain, read back, filtered
# on a dim, and merged to the event_type grain through the router's own
# merge_partials — versus DuckDB aggregating the raw events directly.
# Count/sum merge by sum, min/max re-extremize; the value sum is
# fixed-point (micros as BIGINT — the recorded cross-engine rule: double
# sums reassociate, integer sums don't).

_ROUTE_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
         AS sum_value_micros,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
WHERE event_type <> 'view'
GROUP BY event_type
"""


@_q("rollup_route_events_agg", _ROUTE_ORACLE)
def rollup_route_events_agg(spark, sf):
    """A covered aggregate answered ONLY from materialized partials: one
    bucketed partial pass (the rollup build), an at-rest parquet round
    trip (the layout the router reads), then merge_partials — the exact
    routed physical plan — with a dim filter applied pre-merge. The raw
    events are never re-read after the partials land."""
    import shutil
    import tempfile

    from betfair_database_spark.rollup import merge_partials, summarize_spec

    spec = {
        "dims": [{"alias": "event_type", "expr": None}],
        "aggs": [
            {"alias": "n", "op": "count", "col": None},
            {"alias": "sum_value_micros", "op": "sum", "col": "value_micros"},
            {"alias": "first_ts", "op": "min", "col": "ts"},
            {"alias": "last_ts", "op": "max", "col": "ts"},
        ],
    }
    ev = _t(spark, sf, "events").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 1e6).cast("long").alias("value_micros"),
        (F.col("user_id") % 32).cast("int").alias("bucket"),
    )
    internal = summarize_spec(ev, spec, part_col="bucket")
    path = tempfile.mkdtemp(prefix="bfdb_route_gate_")
    try:
        internal.write.mode("overwrite").parquet(path)
        out = merge_partials(
            spark.read.parquet(path),
            spec,
            ["event_type"],
            [
                ("count", None, "n"),
                ("sum", "value_micros", "sum_value_micros"),
                ("min", "ts", "first_ts"),
                ("max", "ts", "last_ts"),
            ],
            where_expr="event_type <> 'view'",
        ).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


@_q("knn_ann_index_deleted_top10", _ANN_DELETE_ORACLE)
def knn_ann_index_deleted_top10(spark, sf):
    """Exact top-10 served through the at-rest ANN index after a vector
    DELETE (vec_id % 7 = 3 removed), probing all cells so the result is
    exact over the survivors. ``train_iters=0`` keeps the raw codebook
    seed — rerank is exact-cosine, so PQ training cost would buy nothing
    here. The result is localCheckpointed before the scratch index
    directory is removed."""
    import shutil
    import tempfile

    emb = _t(spark, sf, "embeddings")
    centroids = similarity.kmeans_seeds(emb, 4)
    row = emb.where(F.col("vec_id") == 0).select("embedding").first()
    q = [float(v) for v in row[0]]
    doomed = [
        r[0]
        for r in emb.where(F.col("vec_id") % 7 == 3)
        .select("vec_id")
        .collect()
    ]

    path = tempfile.mkdtemp(prefix="bfdb_ann_del_gate_")
    try:
        similarity.write_ann_index(emb, path, centroids, train_iters=0)
        n = similarity.delete_from_ann_index(spark, path, doomed)
        assert n == len(doomed)
        out = similarity.query_ann_index(
            spark, path, None, None, q, k=10, nprobe=4, rerank="exact"
        ).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


# =========================================================================
# dedup_url_canonical_stats — URL canonicalization dedup (FineWeb pre-pass)
# =========================================================================
#
# Crawl variants of one page (case-variant hosts, tracking params, param
# order, fragments, trailing slashes) defeat URL equality joins; the
# canonicalizer collapses them BEFORE content-level dedup. URLs are
# constructed deterministically from documents on BOTH engines (case,
# fragment, tracking-param and param-order variants keyed off doc_id),
# then Spark runs the engine canonicalizer (pure column expressions —
# regexp splits + array filter/sort HOFs, no UDF) while DuckDB performs
# the same normalization relationally. Any rule divergence (a kept
# tracking param, an unsorted param list, a clipped root slash) changes
# the group structure and the hash.

_URL_BUILD_SQL = """
  CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END
  || source || '.example.com/Docs/' || CAST(doc_id % 40 AS VARCHAR)
  || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
  || CASE doc_id % 4
       WHEN 0 THEN '?utm_source=feed&b=2&ref=' || CAST(doc_id % 3 AS VARCHAR)
       WHEN 1 THEN '?ref=' || CAST(doc_id % 3 AS VARCHAR) || '&b=2&fbclid=xyz'
       WHEN 2 THEN '#sec' || CAST(doc_id % 7 AS VARCHAR)
       ELSE '' END
"""

_URL_CANON_ORACLE = f"""
WITH urls AS (
  SELECT doc_id, {_URL_BUILD_SQL} AS url FROM documents
),
p1 AS (
  SELECT doc_id, url, split_part(url, '#', 1) AS nofrag FROM urls
),
p2 AS (
  SELECT *, split_part(nofrag, '?', 1) AS base,
         CASE WHEN instr(nofrag, '?') > 0
              THEN substring(nofrag, instr(nofrag, '?') + 1) ELSE '' END
           AS qstr,
         instr(nofrag, '?') > 0 AS has_q
  FROM p1
),
p3 AS (
  SELECT *,
         regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme,
         regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)', 1) AS host,
         regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$', 1)
           AS path
  FROM p2
),
p4 AS (
  SELECT *,
         regexp_replace(lower(host), '^www\\.', '') AS nhost,
         regexp_replace(path, '^(/.+)/$', '\\1') AS npath,
         array_to_string(list_sort(list_filter(string_split(qstr, '&'),
           x -> length(x) > 0
                AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)(=|$)'))),
           '&') AS nq
  FROM p3
),
canon AS (
  SELECT doc_id,
         CASE WHEN scheme <> ''
              THEN lower(scheme) || '://' || nhost || npath
                   || CASE WHEN has_q AND length(nq) > 0
                           THEN '?' || nq ELSE '' END
              ELSE url END AS canonical_url
  FROM p4
)
SELECT canonical_url,
       count(*) AS n_variants,
       min(doc_id) AS keeper_id
FROM canon GROUP BY canonical_url
"""


@_q("dedup_url_canonical_stats", _URL_CANON_ORACLE)
def dedup_url_canonical_stats(spark, sf):
    """Canonical-URL dedup groups: construct the variant URLs, run the
    engine canonicalizer, and report per-canonical group size + keeper
    (min doc_id) — the survivorship decision of a URL-level dedup."""
    from betfair_database_spark.operators.curation import canonicalize_urls

    docs = _t(spark, sf, "documents").selectExpr(
        "doc_id", f"({_URL_BUILD_SQL.replace('VARCHAR', 'STRING')}) AS url"
    )
    return (
        canonicalize_urls(docs, "url")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_id"),
        )
    )


# =========================================================================
# sample_doremi_reweight — exponentiated-gradient mixture step (DoReMi-ish)
# =========================================================================
#
# Domain-reweighting for training mixtures: domains whose proxy loss
# EXCEEDS the population baseline get up-weighted multiplicatively
# (Xie et al. 2023's exponentiated-gradient step). The per-doc proxy
# loss is a deterministic hash; every stage is INTEGER arithmetic
# (floor-divided micro/ppm scales, a quadratic surrogate
# 1 + e + e^2/2 for exp(e) — transcendental exp is NOT cross-engine
# bit-stable, the polynomial in integers is), so both engines produce
# identical rows bit-for-bit.

_DOREMI_ORACLE = """
WITH l AS (
  SELECT source, (doc_id * 2654435761) % 1000 AS h FROM documents
),
per AS (
  SELECT source, sum(h) AS s, count(*) AS n FROM l GROUP BY source
),
tot AS (SELECT sum(h) AS st, count(*) AS nt FROM l),
ex AS (
  SELECT source,
         greatest((1000000 * s) // n - (1000000 * st) // nt, 0)
           AS excess_micros
  FROM per, tot
),
f AS (
  SELECT source, excess_micros,
         1000000000 + excess_micros
           + (excess_micros * excess_micros) // 2000000000 AS factor
  FROM ex
),
z AS (SELECT sum(factor) AS zf FROM f)
SELECT source,
       CAST(excess_micros AS BIGINT) AS excess_micros,
       CAST((1000000 * factor) // zf AS BIGINT) AS weight_ppm
FROM f, z
"""


@_q("sample_doremi_reweight", _DOREMI_ORACLE)
def sample_doremi_reweight(spark, sf):
    """One exponentiated-gradient domain-reweighting step over hashed
    proxy losses — integer micro/ppm scales throughout, quadratic
    surrogate for the exponential (cross-engine exact)."""
    docs = _t(spark, sf, "documents").select(
        "source",
        ((F.col("doc_id") * F.lit(2654435761)) % 1000).alias("h"),
    )
    per = docs.groupBy("source").agg(
        F.sum("h").alias("s"), F.count(F.lit(1)).alias("n")
    )
    tot = docs.agg(
        F.sum("h").alias("st"), F.count(F.lit(1)).alias("nt")
    )
    ex = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.greatest(
            F.expr("(1000000 * s) div n - (1000000 * st) div nt"),
            F.lit(0),
        ).alias("excess_micros"),
    )
    f = ex.select(
        "source",
        "excess_micros",
        F.expr(
            "1000000000 + excess_micros"
            " + (excess_micros * excess_micros) div 2000000000"
        ).alias("factor"),
    )
    z = f.agg(F.sum("factor").alias("zf"))
    return f.crossJoin(F.broadcast(z)).select(
        "source",
        F.col("excess_micros").cast("long"),
        F.expr("(1000000 * factor) div zf").cast("long").alias("weight_ppm"),
    )
