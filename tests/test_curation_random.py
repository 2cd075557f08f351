"""Property tests: curation/graph operators vs pure-Python references."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_words = st.lists(
    st.sampled_from(["a", "b", "c", "dog", "x1"]), min_size=0, max_size=12
)


def _py_ngrams(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_words, min_size=1, max_size=6), st.integers(2, 4))
def test_word_ngrams_matches_python(spark, docs, n):
    from betfair_database_spark.operators.curation import word_ngrams

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.g
        for r in df.select("doc_id", word_ngrams(F.col("text"), n).alias("g")).collect()
    }
    for i, ws in enumerate(docs):
        # split("\s+") of "" yields [""], one empty token — mirror that
        tokens = " ".join(ws).split(" ")
        assert got[i] == _py_ngrams(tokens, n), (ws, n)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_words, min_size=1, max_size=5))
def test_repetition_score_matches_counter(spark, docs):
    from betfair_database_spark.operators.curation import repetition_score

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.top_bigram_ratio) for r in repetition_score(df).collect()}
    for i, ws in enumerate(docs):
        tokens = " ".join(ws).lower().split(" ")
        grams = _py_ngrams(tokens, 2)
        if not grams:
            assert got[i] == (0, None)
        else:
            best = max(Counter(grams).values())
            assert got[i] == (len(grams), round(best / len(grams), 4))


def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labelling
    return {x: min(y for y in parent if find(y) == find(x)) for x in parent}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=15,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from betfair_database_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _py_components(edges)
