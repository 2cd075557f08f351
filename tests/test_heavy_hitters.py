"""Misra-Gries heavy hitters: the candidate-superset guarantee under
adversarial orderings/partitionings, exactness of the verified output, and
int8 quantization round-trip semantics."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from betfair_database_spark.operators import quantize
from betfair_database_spark.operators.sketches import (
    heavy_hitters_exact,
    misra_gries_partition_summaries,
)


def _skewed_items(seed: int, n: int):
    """A Zipf-ish stream: a few hot items + a long uniform tail."""
    rng = random.Random(seed)
    items = []
    for _ in range(n):
        r = rng.random()
        if r < 0.15:
            items.append("hot_a")
        elif r < 0.25:
            items.append("hot_b")
        elif r < 0.30:
            items.append("hot_c")
        else:
            items.append(f"tail_{rng.randrange(5000)}")
    return items


@pytest.mark.parametrize("seed,parts", [(1, 1), (2, 7), (3, 32)])
def test_candidates_are_superset_of_true_heavy(spark, seed, parts):
    items = _skewed_items(seed, 20_000)
    df = spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(parts)
    phi_den = 40  # heavy = cnt > n/40 = 500
    true_heavy = {
        x
        for x in set(items)
        if items.count(x) * phi_den > len(items)
    }
    assert true_heavy  # fixture sanity: the hot items qualify
    cands = {
        r.item
        for r in misra_gries_partition_summaries(df, "item", counters=64).collect()
    }
    assert true_heavy <= cands
    # and the summary is actually bounded
    assert len(cands) <= 64 * parts


def test_exact_output_matches_bruteforce(spark):
    items = _skewed_items(7, 20_000)
    df = spark.createDataFrame([(x,) for x in items], "item string").repartition(13)
    got = {
        (r.item, r.cnt)
        for r in heavy_hitters_exact(df, "item", phi_denominator=40, counters=64).collect()
    }
    from collections import Counter

    c = Counter(items)
    want = {(k, v) for k, v in c.items() if v * 40 > len(items)}
    assert got == want


def test_insufficient_counters_raises(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "item", phi_denominator=100, counters=64)


def test_quantize_int8_bounds_and_roundtrip(spark):
    vecs = [
        (0, [1.0, -2.0, 0.5, 4.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero vector: all-zero q, scale 0
        (2, [-3.5, 3.5, 1.75, -1.75]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = {r.vec_id: r for r in quantize.quantize_int8(df, "embedding").collect()}
    for vid, vec in vecs:
        q, scale = rows[vid].q8, rows[vid].q_scale
        assert all(-127 <= v <= 127 for v in q)
        m = max(abs(x) for x in vec)
        if m == 0:
            assert q == [0, 0, 0, 0] and scale == 0.0
            continue
        # max-magnitude element maps to +-127; dequantization error < scale/2
        assert 127 in [abs(v) for v in q]
        for orig, qi in zip(vec, q):
            assert abs(qi * scale - orig) <= scale / 2 + 1e-9


def test_quantized_topk_agrees_with_python(spark):
    import math

    rng = random.Random(42)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qvec = vecs[5][1]
    got = [(r.vec_id, r.cos_sim_q) for r in quantize.quantized_topk(df, qvec, k=5).collect()]

    qq = quantize.quantize_vector_int8(qvec)
    scored = []
    for vid, v in vecs:
        qa = quantize.quantize_vector_int8(v)
        dot = sum(a * b for a, b in zip(qa, qq))
        na = math.sqrt(sum(a * a for a in qa))
        nq = math.sqrt(sum(b * b for b in qq))
        cos = -1.0 if na == 0 or nq == 0 else dot / (na * nq)
        scored.append((vid, round(cos, 4)))
    want = sorted(scored, key=lambda t: (-t[1], t[0]))[:5]
    assert got == want
    assert got[0][0] == 5 and got[0][1] == 1.0  # self-match survives quantization
