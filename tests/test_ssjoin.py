"""Prefix-filtered exact set-similarity join: agreement with the
brute-force Jaccard join on randomized corpora (the no-false-negatives
lemma, empirically), across thresholds."""

from __future__ import annotations

import random

import pytest

from betfair_database_spark.operators.dedup import jaccard_ssjoin


def _shingles(text: str, k: int = 5) -> set:
    t = text.lower()
    return {t[i : i + k] for i in range(max(len(t) - k + 1, 0))}


def _brute(docs, t):
    out = []
    for i, a in docs:
        for j, b in docs:
            if i >= j:
                continue
            sa, sb = _shingles(a), _shingles(b)
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= t:
                out.append((i, j, round(jac, 4)))
    return sorted(out)


@pytest.mark.parametrize("threshold", [0.3, 0.6, 0.9])
def test_matches_bruteforce(spark, threshold):
    rng = random.Random(threshold)
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark shuffles hash partitions across the executor fleet tonight",
        "completely unrelated text about cooking pasta with fresh basil",
    ]
    docs = []
    for i in range(24):
        src = base[i % 3]
        # mutate a few characters to create a near-dup spectrum
        chars = list(src)
        for _ in range(rng.randrange(0, 12)):
            chars[rng.randrange(len(chars))] = rng.choice("abcdefgh ")
        docs.append((i, "".join(chars)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.a, r.b, r.jac)
        for r in jaccard_ssjoin(df, threshold, collapse_exact=False).collect()
    )
    assert got == _brute(docs, threshold)


def test_identical_docs_and_empty(spark):
    docs = [(0, "aaaaa bbbbb ccccc"), (1, "aaaaa bbbbb ccccc"), (2, ""), (3, "zz")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # default collapse: byte-identical copies are exact_dedup's job and are
    # collapsed to one representative BEFORE the join — no pair reported
    got = [(r.a, r.b, r.jac) for r in jaccard_ssjoin(df, 0.9).collect()]
    assert got == []
    # opting out reports the identical pair at jac=1.0; empty/short docs
    # produce no shingles hence no pairs either way
    got = [
        (r.a, r.b, r.jac)
        for r in jaccard_ssjoin(df, 0.9, collapse_exact=False).collect()
    ]
    assert got == [(0, 1, 1.0)]


def _brute_containment(docs, t):
    out = []
    for i, a in docs:
        for j, b in docs:
            if i == j:
                continue
            sa, sb = _shingles(a), _shingles(b)
            if not sa or not sb:
                continue
            c = len(sa & sb) / len(sa)
            if c >= t:
                out.append((i, j, round(c, 4)))
    return sorted(out)


@pytest.mark.parametrize("threshold", [0.5, 0.8, 0.95])
def test_containment_matches_bruteforce(spark, threshold):
    from betfair_database_spark.operators.dedup import containment_ssjoin

    rng = random.Random(int(threshold * 100))
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark shuffles hash partitions across the executor fleet tonight",
    ]
    docs = []
    for i in range(20):
        src = base[i % 2]
        if i % 5 == 0:
            # true containment: a substring of the base inside noise
            docs.append((i, src[: 20 + rng.randrange(20)]))
            continue
        chars = list(src)
        for _ in range(rng.randrange(0, 10)):
            chars[rng.randrange(len(chars))] = rng.choice("abcdefgh ")
        docs.append((i, "".join(chars)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.a, r.b, r.containment)
        for r in containment_ssjoin(df, threshold, collapse_exact=False).collect()
    )
    assert got == _brute_containment(docs, threshold)


def test_shj_freq_flag_parity(spark, monkeypatch):
    """SPARK_GRAFT_SSJOIN_SHJ_FREQ swaps the rank stage's window count
    for a SHUFFLE_HASH join-back (round-13 A/B flag, kept as a negative
    result). Both forms must produce identical pairs — the df values are
    the same counts either way."""
    from betfair_database_spark.operators.dedup import containment_ssjoin

    rng = random.Random(7)
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark shuffles hash partitions across the executor fleet tonight",
    ]
    docs = []
    for i in range(18):
        chars = list(base[i % 2])
        for _ in range(rng.randrange(0, 10)):
            chars[rng.randrange(len(chars))] = rng.choice("abcdefgh ")
        docs.append((i, "".join(chars)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def both(fn, val_col):
        monkeypatch.delenv("SPARK_GRAFT_SSJOIN_SHJ_FREQ", raising=False)
        window_form = sorted(
            (r.a, r.b, r[val_col]) for r in fn(df, 0.6).collect()
        )
        monkeypatch.setenv("SPARK_GRAFT_SSJOIN_SHJ_FREQ", "1")
        shj_form = sorted(
            (r.a, r.b, r[val_col]) for r in fn(df, 0.6).collect()
        )
        assert window_form == shj_form
        assert window_form  # non-vacuous: the corpus has qualifying pairs

    both(jaccard_ssjoin, "jac")
    both(containment_ssjoin, "containment")
