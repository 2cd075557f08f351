"""Suite extension 10 (round 9): the at-rest ANN index's INCREMENTAL
lifecycle under the oracle gate — build, append, compact, query.

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py`` (aliases identical on both
sides, doubles rounded before compare, deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betfair_database_spark.operators import similarity
from betfair_database_spark.suite import _MINHASH_ORACLE, _q, _t

# =========================================================================
# knn_ann_index_appended_top10 — build → append → append → compact → query
# =========================================================================
#
# The pytest layer pins the mechanics (manifest commit atomicity, byte
# identity, crash reap); this row puts the SAME lifecycle under DuckDB
# hash scrutiny: the index is built from one third of the vectors,
# extended by two appends with the persisted centroids/codebook, then
# compacted, and the probe reads the final manifest-resolved file set
# with EVERY cell probed — so the expected answer is the exact cosine
# top-10 over the unioned vector set, which the oracle computes
# relationally. Any row lost or duplicated by append bookkeeping,
# compaction rewrite, or manifest resolution changes the hash.

_ANN_APPEND_ORACLE = """
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


# =========================================================================
# ts_ffill_user_value — forward-fill through synthetic gaps, per user
# =========================================================================
#
# Puts the round-9 `timeseries.ffill` dispatcher (auto path) under DuckDB
# hash scrutiny: every 3rd event's value is masked to NULL, the fill
# carries the last non-null value in (ts, event_id) order per user, and
# the per-user summary uses FIXED-POINT sums (value*1e6 as BIGINT — the
# recorded cross-engine rule: double sums reassociate, integer sums
# don't). Rows before a user's first observation stay null and are
# excluded from the sum on both engines via the filled IS NOT NULL
# filter inside the conditional aggregation.

_FFILL_ORACLE = """
WITH masked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
  FROM events WHERE user_id % 10 = 0
),
filled AS (
  SELECT user_id, event_id, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS fv
  FROM masked
)
SELECT user_id,
       count(*) AS n_events,
       CAST(count(*) FILTER (WHERE v IS NULL AND fv IS NOT NULL) AS BIGINT)
         AS n_filled_gaps,
       CAST(count(*) FILTER (WHERE fv IS NULL) AS BIGINT) AS n_leading_nulls,
       CAST(sum(CASE WHEN fv IS NULL THEN 0
                     ELSE CAST(round(fv * 1e6) AS BIGINT) END) AS BIGINT)
         AS sum_fv_micros
FROM filled GROUP BY user_id
"""


@_q("ts_ffill_user_value", _FFILL_ORACLE)
def ts_ffill_user_value(spark, sf):
    """Per-user forward-fill over a masked value series through the
    dispatching ``timeseries.ffill`` (auto picks the window form at this
    cardinality — parity with the two-phase form is pytest-pinned), then
    a per-user fill summary with fixed-point sums."""
    from betfair_database_spark.operators import timeseries

    ev = (
        _t(spark, sf, "events")
        .where(F.col("user_id") % 10 == 0)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("v"),
        )
    )
    filled = timeseries.ffill(
        ev, key="user_id", ts_col="ts", id_col="event_id", val_col="v",
        out_col="fv",
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("v").isNull() & F.col("fv").isNotNull(), 1))
        .cast("long")
        .alias("n_filled_gaps"),
        F.count(F.when(F.col("fv").isNull(), 1))
        .cast("long")
        .alias("n_leading_nulls"),
        F.sum(
            F.when(F.col("fv").isNull(), F.lit(0)).otherwise(
                F.round(F.col("fv") * 1e6).cast("long")
            )
        )
        .cast("long")
        .alias("sum_fv_micros"),
    )


@_q("knn_ann_index_appended_top10", _ANN_APPEND_ORACLE)
def knn_ann_index_appended_top10(spark, sf):
    """Exact top-10 served through the at-rest ANN index after its full
    incremental lifecycle (write one third, append the other two thirds
    in two batches, compact the fragmented cells), probing all cells so
    the result is exact over the union. ``train_iters=0`` keeps the raw
    codebook seed — rerank is exact-cosine, so PQ training cost would buy
    nothing here. The result is localCheckpointed before the scratch
    index directory is removed."""
    import shutil
    import tempfile

    emb = _t(spark, sf, "embeddings")
    base = emb.where(F.col("vec_id") % 3 == 0)
    centroids = similarity.kmeans_seeds(base, 4)
    row = emb.where(F.col("vec_id") == 0).select("embedding").first()
    q = [float(v) for v in row[0]]

    path = tempfile.mkdtemp(prefix="bfdb_ann_gate_")
    try:
        similarity.write_ann_index(base, path, centroids, train_iters=0)
        similarity.append_ann_index(emb.where(F.col("vec_id") % 3 == 1), path)
        similarity.append_ann_index(emb.where(F.col("vec_id") % 3 == 2), path)
        similarity.compact_ann_cells(spark, path)
        out = similarity.query_ann_index(
            spark, path, None, None, q, k=10, nprobe=4, rerank="exact"
        ).localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


# =========================================================================
# pipeline_neardup_canonicalize — pick one survivor per duplicate cluster
# =========================================================================
#
# The production consolidation step after near-dup detection: MinHash
# candidate pairs -> connected components -> ONE canonical document per
# cluster (longest text wins, doc_id breaks ties — the "keep the fullest
# variant" heuristic). Returns one row per clustered doc with its
# canonical assignment, so a lost edge, a wrong component label, or a
# flipped tie-break all change the hash. Singleton docs never enter the
# pair graph and are implicitly kept — the row covers the clustered
# subset, where all the decisions live.

_CANON_ORACLE = f"""
WITH RECURSIVE pairs AS (SELECT a, b FROM ({_MINHASH_ORACLE}) mp),
sym AS (SELECT a AS s, b AS d FROM pairs UNION SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT s AS node FROM sym),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, sym.d FROM reach JOIN sym ON sym.s = reach.r
),
comp AS (
  SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node
),
ranked AS (
  SELECT c.doc_id, c.component, length(d.text) AS n_chars,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY length(d.text) DESC, c.doc_id) AS rk
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT r.doc_id,
       CAST(first(r2.doc_id) AS BIGINT) AS canonical_id,
       CAST(count(*) OVER (PARTITION BY r.component) AS BIGINT)
         AS cluster_size,
       CAST(r.doc_id != first(r2.doc_id) AS BOOLEAN) AS dropped
FROM ranked r JOIN ranked r2 ON r2.component = r.component AND r2.rk = 1
GROUP BY r.doc_id, r.component, r2.doc_id
"""


@_q("pipeline_neardup_canonicalize", _CANON_ORACLE)
def pipeline_neardup_canonicalize(spark, sf):
    """Near-dup consolidation: MinHash pairs → components → canonical
    per cluster by (text length DESC, doc_id) — a min over one struct
    whose order encodes the rule, so the pick shares the components'
    exchange instead of adding a window sort. Emits (doc_id,
    canonical_id, cluster_size, dropped) for every clustered doc."""
    from betfair_database_spark.operators import dedup, graph

    docs = _t(spark, sf, "documents")
    pairs = dedup.minhash_near_dups(
        docs, num_hashes=16, bands=2, threshold=0.8
    )
    comp = graph.connected_components(pairs, "a", "b").select(
        F.col("node").alias("doc_id"), "component"
    )
    sized = comp.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "component",
        F.length("text").alias("_len"),
    )
    canon = sized.groupBy("component").agg(
        F.min(F.struct((-F.col("_len")).alias("_nl"), F.col("doc_id")))[
            "doc_id"
        ].alias("canonical_id"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    )
    return (
        sized.join(canon, "component")
        .select(
            "doc_id",
            F.col("canonical_id").cast("long"),
            "cluster_size",
            (F.col("doc_id") != F.col("canonical_id")).alias("dropped"),
        )
    )
