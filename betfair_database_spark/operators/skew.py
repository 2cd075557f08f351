"""Skew and co-location tools for large shuffles (SURVEY §6 scale notes).

Two standard remedies the engine exposes as operators:

  - ``salted_join``: a shuffle join whose hot keys would overload single
    reducers is rewritten as an equi-join on (key, salt): the big side gets
    a deterministic salt in [0, n), the small side is replicated n ways, so
    each hot key fans out across n reducers. The join RESULT is identical
    to the unsalted join — salting only changes the distribution — which is
    exactly what the oracle checks. Use when AQE's skew-join split cannot
    help (e.g. a broadcast-ineligible small side, or stream-static joins).

  - ``write_bucketed`` / co-located reads: persisting both join sides
    bucketed by the join key lets Spark plan the join with NO exchange on
    either side (bucket-to-bucket, verified in tests by asserting the plan
    is exchange-free). This is THE tool for a fact table joined repeatedly
    on the same key at 100 TB: the shuffle is paid once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, salted ``n_salts`` ways.

    The big side's salt is derived from a hash of its whole row (any value
    in [0, n) is correct — the salt only routes rows to reducers); the small
    side is exploded once per salt value. Output columns = big's ∪ small's
    minus the duplicate key, like a plain ``join(..., on)``.
    """
    salt_of = F.pmod(
        F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).alias("_salt")
    b = big.select("*", salt_of)
    s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    )
    joined = b.join(s, [on, "_salt"], how)
    return joined.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Joins and aggregations between tables bucketed identically on the join
    key are planned WITHOUT an exchange — the one-time shuffle happens here,
    at write time."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> tuple[DataFrame, bool]:
    """Join two saved bucketed tables and report whether the physical plan
    contains any shuffle exchange (diagnostic used by tests/ops)."""
    df = spark.table(left_table).join(spark.table(right_table), on)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return df, "Exchange hashpartitioning" not in plan
