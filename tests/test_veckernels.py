"""Bit-exactness of the Arrow vector kernels (round 13) against the JVM
literal-expression paths they replace: same guarded cosine, same argmax
tie-break, same NULL-poisoning, on adversarial shapes (ragged rows, NULL
vectors, NULL elements, NaN, zero vectors, float32 and float64 arrays)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from betfair_database_spark.operators import similarity, veckernels


def _collect_ansi_off(spark, mk):
    """Build AND collect under ansi=false: the semantics _degenerate_guard
    documents (zero divisor -> NULL -> -1.0). Under the session default
    ansi=true the OLD expression path raised DIVIDE_BY_ZERO on zero-norm
    vectors (eval mode is captured at analysis time, i.e. DataFrame
    construction); the kernel instead honors the documented -1.0
    contract, so the reference is built with the documented division
    semantics."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        return mk().collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def _jvm_assign(df, cents, id_col="vec_id", vec_col="embedding"):
    """The pre-round-13 literal-argmax expression form, verbatim."""
    from betfair_database_spark.operators.similarity import (
        _degenerate_guard,
        _dot_lit,
        _normsq_lit,
        _py_norm,
    )

    dims = len(cents[0][1])
    vn = F.sqrt(_normsq_lit(vec_col, dims))
    cands = F.array(
        *[
            F.struct(
                _degenerate_guard(
                    _dot_lit(vec_col, vec) / (vn * F.lit(_py_norm(vec)))
                ).alias("sim"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, vec in cents
        ]
    )
    best = F.array_max(cands)
    return df.select(
        F.col(id_col), (-best["ncid"]).alias("cell"), F.col(vec_col)
    )


def _adversarial_rows(rng, dims, n):
    rows = []
    for i in range(n):
        kind = i % 8
        if kind == 0:
            vec = None  # NULL vector
        elif kind == 1:
            vec = [rng.uniform(-1, 1) for _ in range(dims - 3)]  # short
        elif kind == 2:
            vec = [0.0] * dims  # zero norm -> guard -1.0
        elif kind == 3:
            vec = [rng.uniform(-1, 1) for _ in range(dims)]
            vec[rng.randrange(dims)] = None  # NULL element in range
        elif kind == 4:
            vec = [rng.uniform(-1, 1) for _ in range(dims)]
            vec[rng.randrange(dims)] = float("nan")  # NaN -> guard -1.0
        elif kind == 5:
            vec = [rng.uniform(-1, 1) for _ in range(dims + 5)]  # long
        elif kind == 6:
            vec = [rng.uniform(-1, 1) for _ in range(dims)]
            vec.append(None)  # NULL element BEYOND dims: must not poison
        else:
            vec = [rng.uniform(-1, 1) for _ in range(dims)]
        rows.append((i, vec))
    return rows


@pytest.mark.parametrize("elem", ["double", "float"])
def test_assign_cells_matches_expression_path(spark, elem):
    rng = random.Random(13)
    dims = 16
    rows = _adversarial_rows(rng, dims, 64)
    df = spark.createDataFrame(
        rows, f"vec_id long, embedding array<{elem}>"
    ).repartition(7)
    cents = [
        (cid, [rng.uniform(-1, 1) for _ in range(dims)]) for cid in (3, 1, 7)
    ]
    # a duplicate-direction centroid forces sim ties -> min-cid tie-break
    cents.append((9, list(cents[0][1])))
    ref = {
        r["vec_id"]: r["cell"] for r in _collect_ansi_off(spark, lambda: _jvm_assign(df, cents))
    }
    got = {
        r["vec_id"]: r["cell"]
        for r in veckernels.assign_cells(df, cents).collect()
    }
    assert got == ref
    # passthrough schema is unchanged (float stays float)
    out = veckernels.assign_cells(df, cents)
    assert out.schema["embedding"].dataType == df.schema["embedding"].dataType


def test_kernel_routes_in_suite_paths(spark):
    """ivf_assign actually takes the kernel route for float/double arrays
    (guards against the round-13 regression where supports() rejected
    array<float> and the kernel silently never ran) — while cosine_topk
    deliberately does NOT (the kernel measured slower there; the JVM
    literal path is the kept fast path, see similarity.cosine_topk)."""
    rng = random.Random(5)
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(32)],
        "vec_id long, embedding array<float>",
    )
    cents = [(1, [1.0] * 8), (2, [-1.0] * 8)]
    plan = similarity.ivf_assign(df, cents)._jdf.queryExecution().analyzed().toString()
    assert "mapInArrow" in plan or "MapInArrow" in plan
    topk = similarity.cosine_topk(df, [1.0] * 8, k=3)
    plan2 = topk._jdf.queryExecution().analyzed().toString()
    assert "mapInArrow" not in plan2 and "MapInArrow" not in plan2
    # and the results agree with the expression forms
    ref = {r["vec_id"]: r["cell"] for r in _collect_ansi_off(spark, lambda: _jvm_assign(df, cents))}
    got = {r["vec_id"]: r["cell"] for r in similarity.ivf_assign(df, cents).collect()}
    assert got == ref


def test_gram_kernel_matches_decimal_aggregate(spark, monkeypatch):
    """_power_iterate's Gram-kernel path (round 14) returns the EXACT
    integers of the decimal(38,0) aggregate loop it replaces, including
    the contribution semantics (long rows, NULL rows and NULL elements
    excluded; short rows raise) and the pathological big-value object
    path."""
    rng = random.Random(77)

    def iterate(rows, dims, iters, kernel):
        from betfair_database_spark.operators.similarity import _power_iterate

        if kernel:
            monkeypatch.delenv("SPARK_GRAFT_NO_VECKERNEL_GRAM", raising=False)
        else:
            monkeypatch.setenv("SPARK_GRAFT_NO_VECKERNEL_GRAM", "1")
        df = spark.createDataFrame([(r,) for r in rows], "q8 array<int>")
        return _power_iterate(df, iters=iters, dims=dims)

    cases = [
        # clean int8-range data, 3 iterations (the suite shape)
        [[rng.randint(-127, 127) for _ in range(8)] for _ in range(100)],
        # negatives, zeros, extremes
        [[-127, 0, 127, -1, 1, 0, -128, 5] for _ in range(3)],
        # long rows / NULL rows / NULL elements are excluded, not scored
        [[1, 2, 3, 4, 5, 6, 7, 8], [9] * 12, None,
         [1, None, 3, 4, 5, 6, 7, 8], [2, 3, 4, 5, 6, 7, 8, 9]],
    ]
    for rows in cases:
        assert iterate(rows, 8, 3, True) == iterate(rows, 8, 3, False)

    # values past the 2^26 float64-chunk bound take the object path
    # (1 iteration: at 3 both paths hit the magnitude guard)
    big = [[1 << 27, -(1 << 27), 3, 4, 5, 6, 7, 8],
           [5, 6, 7, 8, 9, 10, 11, 12]]
    assert iterate(big, 8, 1, True) == iterate(big, 8, 1, False)

    # a non-NULL row SHORTER than dims fails the action on both paths
    # (ANSI element_at raises in the aggregate form; the kernel raises)
    import pytest as _pytest

    with _pytest.raises(Exception):
        iterate([[1, 2, 3]], 8, 1, True)
    with _pytest.raises(Exception):
        iterate([[1, 2, 3]], 8, 1, False)

    # zero contributing rows is loud on both paths
    with _pytest.raises(Exception):
        iterate([None], 8, 1, True)
    with _pytest.raises(Exception):
        iterate([None], 8, 1, False)


def test_gram_kernel_routes_in_embed_rows(spark):
    """The dominant-component rows actually take the one-pass Gram route
    (array<int> q8), and kernel vs aggregate produce identical frames on
    a small corpus end to end."""
    import os

    from betfair_database_spark.operators import similarity as sim

    rng = random.Random(11)
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    a = sorted(
        map(tuple, sim.dominant_component_projection(df, iters=3, dims=16).collect())
    )
    os.environ["SPARK_GRAFT_NO_VECKERNEL_GRAM"] = "1"
    try:
        b = sorted(
            map(tuple, sim.dominant_component_projection(df, iters=3, dims=16).collect())
        )
    finally:
        os.environ.pop("SPARK_GRAFT_NO_VECKERNEL_GRAM", None)
    assert a == b
    c = sorted(
        map(tuple, sim.remove_dominant_component(df, iters=3, dims=16).collect())
    )
    os.environ["SPARK_GRAFT_NO_VECKERNEL_GRAM"] = "1"
    try:
        d = sorted(
            map(tuple, sim.remove_dominant_component(df, iters=3, dims=16).collect())
        )
    finally:
        os.environ.pop("SPARK_GRAFT_NO_VECKERNEL_GRAM", None)
    assert c == d
