"""Arrow-vectorized kernels for literal-vector arithmetic (round 13).

Why this module exists (measured, guide §1/§4.2): the literal-expanded
dot-product expressions (`_dot_lit` et al.) embed k x dims multiply-add
nodes into the plan. At 64 dims x 8 centroids that is a ~1 MB serialized
task binary and a thousand-node tree that every task deserializes and
every driver call re-parses: profiled at sf0.1, ONE `ivf_assign` pass
over 2,000 rows cost ~24 executor-seconds and ~0.5 s of driver build
time — all fixed overhead, none of it math. These kernels move the same
arithmetic into one `mapInArrow` over a zero-copy numpy view: the plan
shrinks to a single Python node (task binary ~KB), the per-batch work is
vectorized C, and at real scale the cost is the Arrow boundary crossing
of exactly the columns the kernel needs (guide §4.1: select first).

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


def supports(df: DataFrame, vec_col: str) -> bool:
    """Kernel applies to array<double> and array<float> columns — the JVM
    expressions CAST each element to double, and a float32 -> float64
    cast is exact (every float32 is representable), so numpy's astype
    reproduces it bit-for-bit. Any other element type keeps the JVM
    expression path."""
    field = df.schema[vec_col].dataType
    return isinstance(field, ArrayType) and isinstance(
        field.elementType, (DoubleType, FloatType)
    )


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
    cents = sorted(
        ((int(cid), [float(v) for v in vec]) for cid, vec in centroids),
        key=lambda t: t[0],
    )
    dims = len(cents[0][1])
    cnorms = [_py_norm(vec) for _, vec in cents]
    min_cid = cents[0][0]

    def kern(batches: Iterator):
        import numpy as np
        import pyarrow as pa

        C = [np.asarray(vec, dtype=np.float64) for _, vec in cents]
        for batch in batches:
            X, bad = _batch_matrix(batch.column(vec_col), dims)
            XT = np.ascontiguousarray(X.T)
            vn = np.sqrt(_fold_normsq(XT))
            best_sim = None
            best_cid = None
            for (cid, _), cvec, cn in zip(cents, C, cnorms):
                sim = _guarded_cos(_fold_dot(XT, cvec), vn * cn)
                if best_sim is None:
                    best_sim = sim
                    best_cid = np.full(len(sim), cid, dtype=np.int32)
                else:
                    take = sim > best_sim  # ascending cid: ties keep earlier
                    best_sim = np.where(take, sim, best_sim)
                    best_cid = np.where(take, np.int32(cid), best_cid)
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


def pair_cosine_scores(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    va_col: str = "va",
    vb_col: str = "vb",
    na_col: str = "na",
    nb_col: str = "nb",
    out_col: str = "cos_sim",
) -> DataFrame:
    """Arrow-kernel twin of the zip_with/aggregate pair cosine:
    (a, b, cos) with cos = fold_dot(va, vb) / (na * nb), guarded exactly
    like `_degenerate_guard`. RAW doubles — callers round/filter JVM-side.

    zip_with semantics replicated: a pair whose sides differ in length is
    NULL-padded by zip_with, so its sum is NULL -> guard -1.0; same for a
    NULL side or a NULL element. Pairs whose sides share SOME length L
    fold over exactly L terms — batches are scored per distinct length,
    so mixed-length corpora stay vectorized."""

    def kern(batches: Iterator):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        def lengths_nulls(arr):
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            starts, ends = offs[:-1], offs[1:]
            lens = ends - starts
            rnull = (
                np.asarray(pc.is_null(arr).to_numpy(zero_copy_only=False))
                if arr.null_count
                else np.zeros(len(arr), dtype=bool)
            )
            vals = arr.values.to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False
            )
            if arr.values.null_count:
                enull = np.asarray(
                    pc.is_null(arr.values).to_numpy(zero_copy_only=False)
                )
                cum = np.concatenate(([0], np.cumsum(enull)))
                has_enull = (cum[ends] - cum[starts]) > 0
            else:
                has_enull = np.zeros(len(arr), dtype=bool)
            return starts, lens, vals, rnull | has_enull

        for batch in batches:
            n = batch.num_rows
            sa, la, va, bad_a = lengths_nulls(batch.column(va_col))
            sb, lb, vb, bad_b = lengths_nulls(batch.column(vb_col))
            na = batch.column(na_col).to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False
            )
            nb = batch.column(nb_col).to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False
            )
            bad = bad_a | bad_b | (la != lb)
            dot = np.zeros(n, dtype=np.float64)
            ok = ~bad
            for L in np.unique(la[ok]):
                m = ok & (la == L)
                if L == 0:
                    # zip_with over two empty arrays -> aggregate returns
                    # the 0.0 seed, same as the zero init here
                    continue
                idx_a = sa[m, None] + np.arange(L)[None, :]
                idx_b = sb[m, None] + np.arange(L)[None, :]
                A = va[idx_a]
                B = vb[idx_b]
                acc = np.zeros(A.shape[0], dtype=np.float64)
                for i in range(int(L)):
                    acc = acc + A[:, i] * B[:, i]
                dot[m] = acc
            sim = _guarded_cos(dot, na * nb)
            # NULL norms (never produced by _norm, but honor NULL-in ->
            # guard out) and poisoned pairs -> -1.0
            sim = np.where(bad, -1.0, sim)
            yield pa.record_batch(
                [
                    batch.column(a_col),
                    batch.column(b_col),
                    pa.array(sim, type=pa.float64()),
                ],
                names=[a_col, b_col, out_col],
            )

    schema = StructType(
        [
            pairs.schema[a_col],
            pairs.schema[b_col],
            StructField(out_col, DoubleType(), False),
        ]
    )
    return pairs.select(
        a_col, b_col, va_col, vb_col, na_col, nb_col
    ).mapInArrow(kern, schema)


def cosine_scores(
    df: DataFrame,
    query_vec: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cos_sim",
    keep_vec: bool = False,
) -> DataFrame:
    """Arrow-kernel twin of the literal single-query cosine projection:
    (id[, vec], cos) with cos = dot(vec, q) / (norm(vec) * norm(q)),
    guarded to -1.0 exactly like `_degenerate_guard`. RAW doubles —
    callers round/sort/limit JVM-side, unchanged."""
    q = [float(v) for v in query_vec]
    dims = len(q)
    qn = _py_norm(q)

    def kern(batches: Iterator):
        import numpy as np
        import pyarrow as pa

        w = np.asarray(q, dtype=np.float64)
        for batch in batches:
            X, bad = _batch_matrix(batch.column(vec_col), dims)
            XT = np.ascontiguousarray(X.T)
            vn = np.sqrt(_fold_normsq(XT))
            sim = _guarded_cos(_fold_dot(XT, w), vn * qn)
            sim = np.where(bad, -1.0, sim)
            cols = [batch.column(id_col)]
            names = [id_col]
            if keep_vec:
                cols.append(batch.column(vec_col))
                names.append(vec_col)
            cols.append(pa.array(sim, type=pa.float64()))
            names.append(out_col)
            yield pa.record_batch(cols, names=names)

    fields = [df.schema[id_col]]
    sel = [id_col, vec_col]
    if keep_vec:
        fields.append(df.schema[vec_col])
    fields.append(StructField(out_col, DoubleType(), False))
    return df.select(*sel).mapInArrow(kern, StructType(fields))
