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
