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
        ).localCheckpoint()
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
        ).localCheckpoint()
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
        ).localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out
