"""Degree-ordered triangle counting vs brute force, including the skew case
the algorithm exists for (a hub node) and degenerate inputs (self-loops,
duplicate/reversed edges)."""

from __future__ import annotations

import itertools
import random

import pytest

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


def test_jaccard_similarity_matches_python_reference(spark):
    """Randomized parity vs a set-based python reference, plus the hub-cap
    contract: capped centers only remove hub-mediated commonality."""
    import random

    from betfair_database_spark.operators.graph import jaccard_similarity

    rng = random.Random(8152026)
    edges = set()
    for _ in range(120):
        u, v = rng.randint(0, 25), rng.randint(0, 25)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    df = spark.createDataFrame(sorted(edges), "a long, b long")

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            common = adj[u] & adj[v]
            if common:
                want[(u, v)] = (
                    len(common),
                    len(common) / len(adj[u] | adj[v]),
                )
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], round(r["jaccard"], 12))
        for r in jaccard_similarity(df, canonical=True, unbounded=True).collect()
    }
    assert got == {k: (c, round(j, 12)) for k, (c, j) in want.items()}

    # hub policy is REQUIRED: no cap and no explicit unbounded=True raises
    # before any job runs
    with pytest.raises(ValueError, match="max_center_degree"):
        jaccard_similarity(df, canonical=True)

    # hub cap: with max_center_degree=3, wedges centered on higher-degree
    # nodes vanish; recompute the reference with capped centers only
    capped_centers = {n for n in adj if len(adj[n]) <= 3}
    want_cap = {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            common = {w for w in adj[u] & adj[v] if w in capped_centers}
            if common:
                want_cap[(u, v)] = len(common)
    got_cap = {
        (r["u"], r["v"]): r["common_neighbors"]
        for r in jaccard_similarity(
            df, canonical=True, max_center_degree=3
        ).collect()
    }
    assert got_cap == want_cap
