"""Arrow-vectorized kernel for literal-centroid cell assignment (round 13).

Why this module exists (measured, guide §1/§4.2): the literal-expanded
dot-product expressions (`_dot_lit` et al.) embed k x dims multiply-add
nodes into the plan. At 64 dims x 8 centroids that is a ~1 MB serialized
task binary and a thousand-node tree that every task deserializes and
every driver call re-parses: profiled at sf0.1, ONE `ivf_assign` pass
over 2,000 rows cost ~24 executor-seconds and ~0.5 s of driver build
time — all fixed overhead, none of it math. The kernel moves the same
arithmetic into one `mapInArrow` over a zero-copy numpy view: the plan
shrinks to a single Python node (task binary ~KB), the per-batch work is
vectorized C, and at real scale the cost is the Arrow boundary crossing
of exactly the columns the kernel needs (guide §4.1: select first).

Scope is deliberately NARROW — cell assignment only. Two sibling kernels
(single-query cosine scoring for cosine_topk, pair cosine for the
near-dup verify joins) were built, proven bit-identical, and then
REMOVED after interleaved A/B measured them slower than the JVM
expressions they replaced (knn rows ~1.25x, semdedup pair scoring 2-3x:
shipping 64-dim vector payloads across the Python boundary per scored
row costs more than a small fixed expression tree or an interpreted
zip_with). The assignment kernel is the one case where the JVM
alternative is k plans deep per call AND the payload crosses once per
input row, not once per candidate — see OPTIMIZATION_r13.md for the
numbers.

Bit-exactness contract (the whole point — these kernels MUST NOT change
any result): every sum is the same IEEE-754 left fold the JVM
expressions evaluate (`acc + x_i*y_i`, one rounding per multiply and per
add — numpy elementwise float64 ops round identically), division
happens after the `norm_row * norm_lit` product exactly as in the
expression, Spark's zero-divisor NULL and the `_degenerate_guard`
NULL/NaN -> -1.0 mapping are replicated with explicit masks, and the
argmax tie-break (equal sim -> smallest centroid id) matches the
`array_max` over (sim, -cid) structs. Rows the JVM would poison to NULL
(vector shorter than dims, NULL vector, NULL element among the first
dims) produce sim = -1.0 for every centroid — identical to the guard's
output — so no per-row Python fallback is needed at all.

Rounding stays JVM-side: kernels emit RAW doubles; callers keep their
F.round / orderBy / limit unchanged, so HALF_UP semantics and output
hashes are untouched.
"""

from __future__ import annotations

import math
from functools import reduce
from operator import add
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)


def _py_norm(vec: list[float]) -> float:
    # same left fold as similarity._py_norm (duplicated to avoid an import
    # cycle; tests pin them equal)
    return math.sqrt(reduce(add, (float(v) * float(v) for v in vec)))


def supports(df: DataFrame, vec_col: str, path: str = "") -> bool:
    """Kernel applies to array<double> and array<float> columns — the JVM
    expressions CAST each element to double, and a float32 -> float64
    cast is exact (every float32 is representable), so numpy's astype
    reproduces it bit-for-bit. Any other element type keeps the JVM
    expression path.

    ``path`` names the routing site (currently only "assign") so an A/B
    measurement can flip ONE kernel route off via
    ``SPARK_GRAFT_NO_VECKERNEL_<PATH>`` while leaving any others live;
    ``SPARK_GRAFT_NO_VECKERNEL`` flips the whole module off. Results are
    identical either way — these are bisection aids, not behavior knobs."""
    import os

    if os.environ.get("SPARK_GRAFT_NO_VECKERNEL"):
        return False
    if path and os.environ.get(f"SPARK_GRAFT_NO_VECKERNEL_{path.upper()}"):
        return False
    field = df.schema[vec_col].dataType
    return isinstance(field, ArrayType) and isinstance(
        field.elementType, (DoubleType, FloatType)
    )


def supports_gram(df: DataFrame, vec_col: str) -> bool:
    """The exact-integer Gram kernel applies to integer array columns up
    to 32-bit elements (every int32 is exactly representable in float64,
    which the per-chunk exactness argument in ``gram_exact_int`` needs).
    int64 elements keep the decimal-aggregate path. Same kill-switch
    conventions as ``supports`` (``SPARK_GRAFT_NO_VECKERNEL`` /
    ``SPARK_GRAFT_NO_VECKERNEL_GRAM``) — bisection aids, results are
    identical either way."""
    import os

    from pyspark.sql.types import ByteType, ShortType

    if os.environ.get("SPARK_GRAFT_NO_VECKERNEL"):
        return False
    if os.environ.get("SPARK_GRAFT_NO_VECKERNEL_GRAM"):
        return False
    field = df.schema[vec_col].dataType
    return isinstance(field, ArrayType) and isinstance(
        field.elementType, (ByteType, ShortType, IntegerType)
    )


def gram_exact_int(
    df: DataFrame, vec_col: str, dims: int
) -> tuple[list[list[int]], int]:
    """EXACT integer Gram matrix ``G[i][j] = sum_rows v[i] * v[j]`` over an
    integer array column, in ONE Spark action — the one-pass core of the
    power iteration (``w <- Q^T (Q w)`` iterated is ``w <- G w``, so after
    this single pass every iteration is exact driver arithmetic instead of
    its own full-corpus decimal aggregate).

    Exactness argument: float64 arithmetic on integers is EXACT while every
    value stays <= 2^53. Products are bounded by B^2 (B = max|v| in the
    batch, computed from the data) and a chunk of n rows bounds each Gram
    entry by B^2 * n, so chunking rows at floor(2^53 / B^2) makes every
    BLAS matmul entry an exactly-representable integer (integer adds in
    float64 are exact regardless of summation order, so BLAS blocking
    cannot change the result). Chunk Grams are accumulated in Python ints
    (unbounded), and per-task totals are emitted as decimal(38,0) — the
    same range contract as the decimal aggregate this replaces. Batches
    whose B exceeds 2^26 (never int8-quantized data) fall back to an
    object-dtype matmul: exact at any magnitude, slow, loud in profile.

    CONTRIBUTION SEMANTICS replicate the decimal-aggregate expression loop
    bit for bit (pinned empirically; see test_gram_kernel_*): a row
    contributes iff it is non-NULL, has length == dims and has no NULL
    element (the zip_with fold NULL-poisons longer/NULL-element rows out
    of every sum); a non-NULL row SHORTER than dims raises loudly (ANSI
    element_at past the end raises in the expression form; the kernel
    raises ValueError — both fail the action).

    Returns (G as dims x dims Python ints, number of contributing rows).
    """
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.types import DecimalType, LongType

    def kern(batches: Iterator):
        G = np.zeros((dims, dims), dtype=object)
        n_ok = 0
        for batch in batches:
            vec_arr = batch.column(vec_col)
            if isinstance(vec_arr, pa.ChunkedArray):
                vec_arr = vec_arr.combine_chunks()
            n = len(vec_arr)
            if n == 0:
                continue
            offsets = vec_arr.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            starts, ends = offsets[:-1], offsets[1:]
            lengths = ends - starts
            row_null = np.zeros(n, dtype=bool)
            if vec_arr.null_count:
                import pyarrow.compute as pc

                row_null = np.asarray(
                    pc.is_null(vec_arr).to_numpy(zero_copy_only=False)
                )
            if bool((~row_null & (lengths < dims)).any()):
                raise ValueError(
                    f"gram_exact_int: non-NULL row shorter than dims={dims}"
                    " (the expression form raises INVALID_ARRAY_INDEX here)"
                )
            ok = ~row_null & (lengths == dims)
            values = vec_arr.values
            if values.null_count:
                import pyarrow.compute as pc

                elem_null = np.asarray(
                    pc.is_null(values).to_numpy(zero_copy_only=False)
                )
                cum = np.concatenate(([0], np.cumsum(elem_null)))
                has_null_elem = (cum[ends] - cum[starts]) > 0
                ok &= ~has_null_elem
            if not ok.any():
                continue
            vals = values.to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False
            )
            idx = starts[ok, None] + np.arange(dims)[None, :]
            X = vals[idx]
            n_ok += int(ok.sum())
            B = float(np.abs(X).max())
            if B == 0.0:
                continue
            if B > float(1 << 26):
                # pathological magnitudes: exact object-dtype matmul
                Xo = X.astype(np.int64).astype(object)
                G = G + Xo.T @ Xo
                continue
            chunk = max(1, int(float(1 << 53) / (B * B)))
            for s in range(0, X.shape[0], chunk):
                Xc = X[s : s + chunk]
                Gc = Xc.T @ Xc  # exact: every entry <= B^2 * chunk <= 2^53
                G = G + Gc.astype(np.int64).astype(object)
        yield pa.record_batch(
            [
                pa.array([n_ok], type=pa.int64()),
                pa.array(
                    [[int(v) for v in G.ravel()]],
                    type=pa.list_(pa.decimal128(38, 0)),
                ),
            ],
            names=["n_ok", "gflat"],
        )

    schema = StructType(
        [
            StructField("n_ok", LongType(), False),
            StructField("gflat", ArrayType(DecimalType(38, 0)), False),
        ]
    )
    rows = df.select(vec_col).mapInArrow(kern, schema).collect()
    n_ok = sum(r["n_ok"] for r in rows)
    G = [[0] * dims for _ in range(dims)]
    for r in rows:
        flat = r["gflat"]
        for i in range(dims):
            base = i * dims
            Gi = G[i]
            for j in range(dims):
                Gi[j] += int(flat[base + j])
    return G, n_ok


def _batch_matrix(vec_arr, dims: int):
    """(X, bad) from one Arrow list<double> array: X is the (n, dims)
    float64 matrix view of rows that are clean for the fast path, bad is
    the boolean mask of rows the JVM would NULL-poison (row NULL, fewer
    than ``dims`` elements, or a NULL element among the first dims).
    Rows marked bad carry zeros in X; callers overwrite their result.
    Zero-copy whenever Arrow hands us one contiguous values buffer."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(vec_arr)
    if isinstance(vec_arr, pa.ChunkedArray):
        vec_arr = vec_arr.combine_chunks()
    offsets = vec_arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    starts, ends = offsets[:-1], offsets[1:]
    lengths = ends - starts
    row_null = np.zeros(n, dtype=bool)
    if vec_arr.null_count:
        row_null = np.asarray(pc.is_null(vec_arr).to_numpy(zero_copy_only=False))
    bad = row_null | (lengths < dims)
    values = vec_arr.values  # doubles child, shared data buffer
    vals = values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    if values.null_count:
        # a NULL element among the first dims poisons that row only
        elem_null = np.asarray(
            pc.is_null(values).to_numpy(zero_copy_only=False)
        )
        cum = np.concatenate(([0], np.cumsum(elem_null)))
        in_first = cum[np.minimum(starts + dims, len(elem_null))] - cum[starts]
        bad |= in_first > 0
    ok = ~bad
    if (
        not bad.any()
        and n > 0
        and starts[0] == 0
        and len(vals) == n * dims
        and np.array_equal(lengths, np.full(n, dims))
    ):
        return vals.reshape(n, dims), bad
    X = np.zeros((n, dims), dtype=np.float64)
    if ok.any():
        idx = starts[ok, None] + np.arange(dims)[None, :]
        X[ok] = vals[idx]
    return X, bad


def _fold_dot(XT, w):
    """Exact left-fold dot of every row with weight vector ``w``:
    acc = acc + x_i * w_i, one numpy pass per dimension — each elementwise
    multiply and add rounds exactly once, matching the JVM expression."""
    import numpy as np

    acc = np.zeros(XT.shape[1], dtype=np.float64)
    for i in range(XT.shape[0]):
        acc = acc + XT[i] * w[i]
    return acc


def _fold_normsq(XT):
    import numpy as np

    acc = np.zeros(XT.shape[1], dtype=np.float64)
    for i in range(XT.shape[0]):
        acc = acc + XT[i] * XT[i]
    return acc


def _guarded_cos(dot, div):
    """sim = dot / div with Spark semantics: zero divisor -> NULL and
    NULL/NaN -> -1.0 (_degenerate_guard)."""
    import numpy as np

    with np.errstate(divide="ignore", invalid="ignore"):
        sim = dot / div
    sim = np.where((div == 0.0) | np.isnan(sim), -1.0, sim)
    return sim


def assign_cells(
    df: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-kernel twin of the literal-argmax `ivf_assign` branch:
    (id, cell, vec) with cell = argmax_cid cos(vec, centroid), ties to
    the smallest cid. Bit-identical to the expression form (module
    docstring); plan size O(1) in k x dims."""
    import numpy as np

    cents = sorted(
        ((int(cid), [float(v) for v in vec]) for cid, vec in centroids),
        key=lambda t: t[0],
    )
    dims = len(cents[0][1])
    # compact ndarray closure (8 bytes/component pickled) so large-k
    # centroid sets stay a small task binary, unlike the k x dims literal
    # expression tree this kernel replaces
    C = np.asarray([vec for _, vec in cents], dtype=np.float64)
    cids = np.asarray([cid for cid, _ in cents], dtype=np.int32)
    cnorms = np.asarray([_py_norm(vec) for _, vec in cents])
    min_cid = cents[0][0]

    def kern(batches: Iterator):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            X, bad = _batch_matrix(batch.column(vec_col), dims)
            XT = np.ascontiguousarray(X.T)
            vn = np.sqrt(_fold_normsq(XT))
            best_sim = None
            best_cid = None
            for j in range(len(cids)):
                sim = _guarded_cos(_fold_dot(XT, C[j]), vn * cnorms[j])
                if best_sim is None:
                    best_sim = sim
                    best_cid = np.full(len(sim), cids[j], dtype=np.int32)
                else:
                    take = sim > best_sim  # ascending cid: ties keep earlier
                    best_sim = np.where(take, sim, best_sim)
                    best_cid = np.where(take, cids[j], best_cid)
            # JVM-poisoned rows: every sim is -1.0 -> argmax = smallest cid
            best_cid = np.where(bad, np.int32(min_cid), best_cid)
            yield pa.record_batch(
                [
                    batch.column(id_col),
                    pa.array(best_cid, type=pa.int32()),
                    batch.column(vec_col),
                ],
                names=[id_col, "cell", vec_col],
            )

    schema = StructType(
        [
            df.schema[id_col],
            StructField("cell", IntegerType(), False),
            df.schema[vec_col],
        ]
    )
    return df.select(id_col, vec_col).mapInArrow(kern, schema)
