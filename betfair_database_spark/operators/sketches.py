"""Deterministic cardinality / similarity sketches (KMV family).

``approx_count_distinct`` (HyperLogLog++) is fast but engine-specific: no
external system reproduces its estimate, so it can't be oracle-checked and
two engines disagree on the same data. The K-Minimum-Values sketch gets the
same O(k) memory bound with a DETERMINISTIC estimate: hash every key to a
uniform [0,1) value (md5-derived, the same engine-independent uniform the
sampling operators use), keep the k smallest DISTINCT hash values, and
estimate distinct = (k-1) / kth_smallest. Any SQL engine derives the
identical estimate bit-for-bit.

Scale shape: the k-smallest reduction is Spark's TakeOrderedAndProject —
per-partition partial top-k then a k-row merge, which IS the KMV merge
operation (the sketch is associative). No full shuffle, no global sort; at
100 TB the driver sees k doubles per sketch.

Accuracy: relative error ~ 1/sqrt(k-2); k=256 gives ~6%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def uniform_hash(key: Column, hasher: str = "xxhash64") -> Column:
    """Deterministic uniform [0,1).

    hasher="xxhash64" (default): JVM-native 64-bit hash, no string
    round-trip — measured ~20x faster than md5 over a 15M-row scan. Fully
    deterministic across runs/partitionings WITHIN Spark, which is all a
    sketch needs in production.
    hasher="md5": first 8 md5 hex chars / 2^32 — slower, but bit-
    reproducible by ANY engine (the correctness oracle runs this form).
    """
    if hasher == "xxhash64":
        return (
            F.xxhash64(key).bitwiseAND(F.lit(4294967295))
            .cast("double")
            / F.lit(4294967296.0)
        )
    if hasher == "md5":
        return (
            F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
            .cast("double")
            / F.lit(4294967296.0)
        )
    raise ValueError(f"unknown hasher: {hasher!r}")


def kmv_distinct(
    df: DataFrame, key_col: str, k: int = 256, hasher: str = "xxhash64"
) -> DataFrame:
    """1-row frame: (kmv_estimate, n_kept). Exact when fewer than k
    distinct hashes exist (the sketch degenerates to the distinct set)."""
    mins = (
        df.select(uniform_hash(F.col(key_col), hasher).alias("u"))
        .distinct()
        .orderBy("u")
        .limit(k)
    )
    agg = mins.agg(
        F.max("u").alias("kth"), F.count("*").alias("n_kept")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) / F.col("kth")))
    return agg.select(
        est.cast("long").alias("kmv_estimate"),
        F.col("n_kept").cast("long").alias("n_kept"),
    )


def kmv_jaccard(
    a: DataFrame, b: DataFrame, key_col: str, k: int = 256,
    hasher: str = "xxhash64",
) -> DataFrame:
    """1-row frame: (jaccard_est, n_union_kept) — Jaccard similarity of two
    key SETS from their merged KMV sketch: among the k smallest distinct
    hash values of the union, the fraction present in both sides is an
    unbiased Jaccard estimate (the union's k-min set is a uniform sample
    of the union). Deterministic for the same reason as kmv_distinct."""
    ha = a.select(uniform_hash(F.col(key_col), hasher).alias("u")).distinct()
    hb = b.select(uniform_hash(F.col(key_col), hasher).alias("u")).distinct()
    union_min = ha.union(hb).distinct().orderBy("u").limit(k)
    both = ha.join(hb, "u", "left_semi")
    tagged = union_min.join(
        both.withColumn("in_both", F.lit(1)), "u", "left"
    )
    return tagged.agg(
        F.round(
            F.sum(F.coalesce(F.col("in_both"), F.lit(0)))
            / F.count("*").cast("double"),
            4,
        ).alias("jaccard_est"),
        F.count("*").cast("long").alias("n_union_kept"),
    )


def _cm_bucket(
    key: Column, j: int, width: int, hasher: str = "xxhash64"
) -> Column:
    """Row-j bucket for Count-Min/Bloom (see uniform_hash for the hasher
    trade: xxhash64 in production, md5 when an external oracle must
    reproduce the sketch)."""
    if hasher == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(j), key), F.lit(width)).cast("long")
    if hasher == "md5":
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % width
        )
    raise ValueError(f"unknown hasher: {hasher!r}")


def countmin_table(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Count-Min sketch as a (j, bucket, c) frame: ``depth`` hash rows of
    ``width`` counters; every key occurrence increments one counter per
    row. Counters are SUMS, so the sketch is order- and partition-
    independent (unlike Misra-Gries, whose state depends on arrival order)
    and merges by addition — the groupBy here is map-side-combined, and at
    100 TB per-partition sketches merge in one tiny shuffle of
    depth*width rows. Point estimate = min over rows (see countmin_lookup);
    overestimates only, by < N*e/width with prob 1 - 1/2^depth."""
    key = F.col(key_col)
    rows = df.select(
        F.posexplode(
            F.array(*[_cm_bucket(key, j, width, hasher) for j in range(depth)])
        ).alias("j", "bucket")
    )
    return rows.groupBy("j", "bucket").agg(F.count("*").alias("c"))


def countmin_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Estimated count per probe key: min over the key's ``depth`` sketch
    counters (a missing counter means 0 occurrences). Probe frame stays
    tiny -> broadcast side of the join."""
    key = F.col(key_col)
    pb = probes.select(
        key.alias("probe_key"),
        F.posexplode(
            F.array(*[_cm_bucket(key, j, width, hasher) for j in range(depth)])
        ).alias("j", "bucket"),
    )
    joined = pb.join(sketch, ["j", "bucket"], "left")
    return (
        joined.groupBy("probe_key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_estimate"))
    )


def bloom_positions(
    df: DataFrame, key_col: str, hashes: int = 5, bits: int = 4096,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Bloom filter as its SET-BIT POSITION set (1 column, distinct): the
    relational form of the bit array — build with a distinct aggregate,
    merge with UNION, ship to executors as a broadcast. md5-derived
    positions make the filter engine-independent; at 100 TB the position
    frame is at most ``bits`` rows regardless of input size."""
    key = F.col(key_col)
    return df.select(
        F.explode(
            F.array(*[_cm_bucket(key, j, bits, hasher) for j in range(hashes)])
        ).alias("pos")
    ).distinct()


def bloom_maybe_contains(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    hashes: int = 5,
    bits: int = 4096,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(key, maybe_present) per probe: present iff ALL ``hashes`` positions
    are set — i.e. the probe's position count that hits the bloom equals
    ``hashes``. No false negatives; false positives ~ (1 - e^(-kn/m))^k."""
    key = F.col(key_col)
    pb = probes.select(
        key.alias("probe_key"),
        F.explode(
            F.array(*[_cm_bucket(key, j, bits, hasher) for j in range(hashes)])
        ).alias("pos"),
    )
    hit = pb.join(bloom, "pos", "left_semi")
    counts = hit.groupBy("probe_key").agg(F.count("*").alias("n_hit"))
    return probes.select(key.alias("probe_key")).distinct().join(
        counts, "probe_key", "left"
    ).select(
        "probe_key",
        (F.coalesce("n_hit", F.lit(0)) == hashes).alias("maybe_present"),
    )
