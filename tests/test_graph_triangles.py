"""Degree-ordered triangle counting vs brute force, including the skew case
the algorithm exists for (a hub node) and degenerate inputs (self-loops,
duplicate/reversed edges)."""

from __future__ import annotations

import itertools
import random

from betfair_database_spark.operators.graph import canonical_edges, triangle_count


def _brute(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    ), len(es)


def _run(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    row = triangle_count(df).first()
    return row.n_triangles, row.n_edges


def test_known_small_graph(spark):
    # two triangles sharing edge (1,2), plus a pendant
    edges = [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4), (4, 5)]
    tri, m = _run(spark, edges)
    assert (tri, m) == (2, 6)


def test_duplicates_reversals_self_loops(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (3, 3)]
    tri, m = _run(spark, edges)
    assert (tri, m) == (1, 3)


def test_hub_graph_matches_bruteforce(spark):
    """Star hub (degree 40) + random sparse edges: the degree-ordered form
    must agree with brute force exactly where naive wedge fanout explodes."""
    rng = random.Random(11)
    edges = [(0, i) for i in range(1, 41)]  # hub
    edges += [
        (rng.randrange(1, 41), rng.randrange(1, 41)) for _ in range(120)
    ]
    want_tri, want_m = _brute(edges)
    tri, m = _run(spark, edges)
    assert (tri, m) == (want_tri, want_m)


def test_triangle_free(spark):
    edges = [(i, i + 1) for i in range(20)]  # path graph
    tri, m = _run(spark, edges)
    assert (tri, m) == (0, 20)


def test_canonical_edges(spark):
    df = spark.createDataFrame([(2, 1), (1, 2), (3, 3)], "a long, b long")
    rows = sorted((r.u, r.v) for r in canonical_edges(df).collect())
    assert rows == [(1, 2)]
