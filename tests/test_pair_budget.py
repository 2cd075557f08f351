"""Pre-flight candidate-pair budget (round 13, verdict #2).

The round-12 sf10 sweep FILLED THE DISK on the two uncollapsed near-dup
rows: blocked pair joins are quadratic in block size by semantics, and
"blocking keys must keep expected block size flat" lived only in
docstring prose. ``assert_pair_budget`` prices the join from the
block-size aggregate (counts only — no pair materialized) and raises
``PairBudgetError`` above ``spark.bfdb.maxCandidatePairs``, the same
runtime-check philosophy as ``assert_bounded_frame``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from betfair_database_spark.exceptions import PairBudgetError
from betfair_database_spark.plans.guards import (
    PAIR_BUDGET_CONF,
    assert_pair_budget,
    estimate_candidate_pairs,
)


@pytest.fixture
def budget(spark):
    """Set a conf budget for one test, always restoring the default."""

    def _set(v: int):
        spark.conf.set(PAIR_BUDGET_CONF, str(v))

    yield _set
    spark.conf.unset(PAIR_BUDGET_CONF)


def _replica_docs(spark, n_unique=10, replicas=30):
    """n_unique distinct long texts, each repeated ``replicas`` times
    under distinct ids — the replica-heavy shape that exploded at sf10."""
    base = [
        f"document number {i} with enough characters for five-shingles "
        f"and a distinctive tail segment {i * 7919}"
        for i in range(n_unique)
    ]
    rows = [
        (i * replicas + r, base[i])
        for i in range(n_unique)
        for r in range(replicas)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestEstimate:
    def test_self_join_estimate_is_exact(self, spark):
        df = spark.createDataFrame(
            [(i, i % 3) for i in range(20)], "id long, k int"
        )
        est = estimate_candidate_pairs(df, ["k"])
        actual = (
            df.alias("a")
            .join(df.alias("b"), "k")
            .where(F.col("a.id") < F.col("b.id"))
            .count()
        )
        # blocks of 7, 7, 6 -> 21 + 21 + 15 = 57
        assert est == actual == 57

    def test_bipartite_estimate_is_exact(self, spark):
        left = spark.createDataFrame(
            [(i, i % 3) for i in range(9)], "id long, k int"
        )
        right = spark.createDataFrame(
            [(i, i % 4) for i in range(8)], "id long, k int"
        )
        est = estimate_candidate_pairs(left, ["k"], right_df=right)
        actual = left.join(right.withColumnRenamed("id", "rid"), "k").count()
        assert est == actual

    def test_empty_frame_is_zero(self, spark):
        df = spark.createDataFrame([], "id long, k int")
        assert estimate_candidate_pairs(df, ["k"]) == 0


class TestGuard:
    def test_raises_above_budget_with_remediation(self, spark, budget):
        budget(50)
        df = spark.createDataFrame(
            [(i, 1) for i in range(20)], "id long, k int"
        )  # one block of 20 -> 190 pairs
        with pytest.raises(PairBudgetError, match="190") as ei:
            assert_pair_budget(
                df, ["k"], context="test block", remediation="collapse first"
            )
        assert "collapse first" in str(ei.value)
        assert "maxCandidatePairs" in str(ei.value)

    def test_zero_disables(self, spark, budget):
        budget(0)
        df = spark.createDataFrame(
            [(i, 1) for i in range(20)], "id long, k int"
        )
        assert assert_pair_budget(df, ["k"]) == -1

    def test_within_budget_returns_estimate(self, spark, budget):
        budget(1000)
        df = spark.createDataFrame(
            [(i, 1) for i in range(20)], "id long, k int"
        )
        assert assert_pair_budget(df, ["k"]) == 190


class TestMinhashWiring:
    """The guard trips on the replica corpus that filled the disk at
    sf10, and the documented remediation (collapse_exact=True) brings
    the SAME corpus back under the SAME budget — prose became a check."""

    def test_uncollapsed_replicas_refused_collapsed_passes(
        self, spark, budget
    ):
        from betfair_database_spark.operators.dedup import minhash_near_dups

        docs = _replica_docs(spark, n_unique=10, replicas=30)
        # 10 buckets/band of 30 replicas each: ~4 bands * 10 * C(30,2)
        # = 17,400 candidates; unique texts alone stay near zero
        budget(1000)
        with pytest.raises(PairBudgetError, match="collapse"):
            minhash_near_dups(docs).count()
        out = minhash_near_dups(docs, collapse_exact=True)
        # the 10 template texts are mutual near-dups: exactly C(10,2)
        # representative pairs, not 30x30 replica cross-products
        assert out.count() == 45

    def test_incremental_probe_guarded(self, spark, budget):
        from betfair_database_spark.operators.dedup import (
            minhash_incremental_pairs,
        )

        corpus = _replica_docs(spark, n_unique=10, replicas=30)
        new = _replica_docs(spark, n_unique=10, replicas=30).select(
            (F.col("doc_id") + 10_000).alias("doc_id"), "text"
        )
        budget(1000)
        with pytest.raises(PairBudgetError, match="probe"):
            minhash_incremental_pairs(new, corpus).count()
        budget(10_000_000)
        assert minhash_incremental_pairs(new, corpus).count() >= 0
