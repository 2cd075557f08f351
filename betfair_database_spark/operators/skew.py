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


# join types whose result is invariant under small-side replication: every
# replicated small row either matches (same output as unsalted) or vanishes.
# Right/full outer are NOT salvageable this way — the n-1 non-matching
# replicas of a preserved small row would surface as spurious null rows.
_SALTABLE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi",
                 "leftsemi", "left_anti", "leftanti"}

_SALT = "__bfdb_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, salted ``n_salts`` ways.

    The big side's salt is derived from a hash of its row (any value in
    [0, n) is correct — the salt only routes rows to reducers); the small
    side is exploded once per salt value. Output columns = big's ∪ small's
    minus the duplicate key, like a plain ``join(..., on)``. Only
    big-side-preserving join types are accepted: replication breaks
    right/full outer semantics.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how.lower() not in _SALTABLE_HOW:
        raise ValueError(
            f"salted_join supports {sorted(_SALTABLE_HOW)} joins, not {how!r}"
        )
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"inputs must not already carry a {_SALT} column")
    # hash() rejects MapType columns; any hashable subset routes fine
    hashable = [
        f.name for f in big.schema.fields if not str(f.dataType).startswith("Map")
    ]
    salt_src = (
        F.hash(*[F.col(c) for c in hashable])
        if hashable
        else F.monotonically_increasing_id()
    )
    b = big.select("*", F.pmod(salt_src, F.lit(n_salts)).alias(_SALT))
    s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    )
    # Force a sort-merge join. The operator's premise is a small side too
    # big to broadcast; Catalyst's size ESTIMATE of the exploded side can
    # still land under autoBroadcastJoinThreshold (explode carries the
    # pre-explosion stats), and a mis-chosen broadcast then builds
    # n_salts × |small| rows on the driver — found the hard way at the
    # 100× scale run, where exactly that OOM'd the broadcast build. A
    # merge join sorts on (key, salt) and spills to disk at any scale;
    # when the small side genuinely fits, don't salt — broadcast directly.
    joined = b.join(s.hint("merge"), [on, _SALT], how)
    return joined.drop(_SALT)


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
    contains any shuffle exchange (diagnostic used by tests/ops).

    Broadcast is disabled while planning the probe: a broadcast join has no
    shuffle either, which would make the check vacuously true on small
    tables — the point is to prove the SHUFFLE join needs no exchange.
    Any ``Exchange`` other than a broadcast counts as a shuffle.
    """
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = spark.table(left_table).join(spark.table(right_table), on)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    return df, not shuffles
