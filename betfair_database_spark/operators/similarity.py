"""Similarity search over embedding columns (SURVEY §2.11).

  - cosine_topk: brute-force exact top-k against a query vector. The dot
    product runs entirely in JVM expressions (zip_with + aggregate) — no
    Python, no explode; one narrow scan + a k-row reduce.
  - lsh_sign_buckets / bucketed_topk: deterministic sign-LSH (bucket = sign
    pattern of the first B components). At scale the bucket column is a
    partition key: the query probes one bucket instead of the full corpus.
  - embedding_near_dup_pairs: pairwise cosine within a blocking key.

All arithmetic is double-precision with explicit casts so the duckdb oracle
reproduces results bit-compatibly after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def lsh_sign_buckets(
    df: DataFrame,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic sign-LSH bucket: '1'/'0' sign pattern of the first
    ``bits`` components ('1' = non-negative). (A production variant uses
    random hyperplanes; signs of the leading components keep the oracle
    reproducible.)"""
    bucket = F.concat(
        *[
            F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(bits)
        ]
    )
    return df.select(F.col(id_col), bucket.alias("bucket"), F.col(vec_col))


def bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: probe only the query's sign-bucket, then exact cosine top-k inside.

    At 100 TB the bucket predicate prunes partitions (write the table
    partitioned/bucketed by this key) — the scan touches 1/2^bits of the data.
    """
    if len(query_vec) < bits:
        raise ValueError(
            f"bits={bits} exceeds query vector length {len(query_vec)}; "
            "buckets would never match"
        )
    qbucket = "".join("1" if v >= 0 else "0" for v in query_vec[:bits])
    buckets = lsh_sign_buckets(df, bits, id_col, vec_col)
    inside = buckets.where(F.col("bucket") == qbucket)
    return cosine_topk(inside, query_vec, k, id_col, vec_col)


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: each vector goes to its nearest centroid
    (max cosine). Centroids are (cid, vector) literals — in production they
    come from a sampled k-means; here a deterministic seed set keeps the
    operator oracle-checkable. One narrow pass, no shuffle; the cell id is
    the partition key for the 100 TB layout (write bucketed/partitioned by
    cell, probe touches one cell).

    The argmax is array_max over (sim, -cid) structs — O(n) expression
    size, each cosine evaluated once, smallest cid winning ties (a nested
    when/otherwise chain would embed the running best twice per centroid:
    O(2^n) plan nodes, driver-fatal beyond a few dozen cells)."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    cands = F.array(
        *[
            F.struct(
                cosine_similarity(
                    F.col(vec_col), F.array(*[F.lit(float(v)) for v in vec])
                ).alias("sim"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, vec in centroids
        ]
    )
    best = F.array_max(cands)
    return df.select(
        F.col(id_col), (-best["ncid"]).alias("cell"), F.col(vec_col)
    )


def ivf_topk(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: score the query against the centroid table, search the
    ``nprobe`` nearest cells exhaustively, exact cosine top-k inside."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    probe_cells = [
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (-cos(query_vec, c[1]), c[0])
        )[:nprobe]
    ]
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    inside = assigned.where(F.col("cell").isin(probe_cells))
    return cosine_topk(inside, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine near-dups within a blocking key (equi-join on the
    block column bounds the pair explosion; at scale the block is an LSH
    bucket rather than a label)."""
    a = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("va"),
    )
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("vb"),
    )
    pairs = a.join(b, "blk").where(F.col("a") < F.col("b"))
    return pairs.select(
        "a",
        "b",
        F.round(cosine_similarity(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
    ).where(F.col("cos_sim") >= threshold)


def batch_cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force kNN for a whole query SET in one pass: broadcast the
    queries, score every (query, base) pair JVM-side (zip_with/aggregate —
    no Python, no explode), then window top-k per query.

    This is the batch-retrieval shape: at 100 TB the base table streams
    through once regardless of how many queries ride along (scoring cost is
    |base| x |queries| multiply-adds inside whole-stage codegen, and the
    top-k window shuffles only the scored rows, grouped by query id). The
    rank is computed over the ROUNDED similarity so tie-breaking is
    reproducible in the DuckDB oracle.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        df.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(q))
        .select(
            "q_id",
            id_col,
            F.round(
                cosine_similarity(F.col(vec_col), F.col("q_vec")), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
