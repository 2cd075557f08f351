"""Deduplication operators for large-scale text corpora (SURVEY §2.11).

All variants are DataFrame-native and shuffle-bounded:

  - exact_dedup:      hash-groupBy on a normalized key — one shuffle.
  - minhash_lsh:      shingle → K minhashes → B banded bucket keys →
                      bucket self-join → Jaccard verify. The band join keeps
                      candidate generation O(collisions), never O(n²); at
                      100 TB the bucket join is the only shuffle that grows,
                      and it grows with the number of true near-dups.
  - simhash:          16-bit sign-sum fingerprint; half-band pigeonhole join
                      for candidates (hamming ≤ threshold).
  - ngram_jaccard:    token-set join for pairwise Jaccard on candidate pairs.

Hashes are md5-derived so results are engine-independent (the duckdb oracle
computes the identical signatures — no engine-private hash functions).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalized_text(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical dedup key."""
    return F.regexp_replace(F.lower(col), r"\s+", " ")


def spread(df: DataFrame, key_col: str) -> DataFrame:
    """Ensure the frame is spread across all cores before a CPU-heavy
    per-row stage. A small corpus in one parquet file arrives as ONE input
    split and would run single-threaded; the explicit partition count keeps
    AQE from coalescing the tiny exchange back to one partition. No-op cost
    at real scale (many input splits already exist, shuffle is data-sized)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key_col))


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct normalized text (min id wins → deterministic).

    Shape: ONE shuffle on the text-hash key with a row_number group-limit
    (WindowGroupLimit prunes losers before the final sort). The previous
    agg + left-semi form shuffled only ids but re-evaluated the whole
    upstream pipeline on BOTH join sides — 6x slower when the input is a
    filtered/derived frame (measured on the 500k-doc curation pipeline),
    which is precisely how dedup is used in practice. The trade: this form
    moves full rows through the one exchange; prefer it unless rows are
    enormous relative to recompute cost."""
    from pyspark.sql import Window

    key = F.md5(normalized_text(F.col(text_col)))
    w = Window.partitionBy("_k").orderBy(df.columns[0])
    return (
        df.withColumn("_k", key)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_k", "_rn")
    )


def tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct word tokens per document (split on single spaces, matching
    the oracle's string_split semantics)."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("w"),
    )


# Tier-1 verify slack for the exact SSJoins: the hashed-lane pre-filter is
# relaxed by this many shingles per pair, so a false negative requires more
# than _HASH_SLACK independent within-doc 64-bit hash merges in one candidate
# pair (~ (n_doc^2 / 2^64)^(S+1) — beyond a 128-bit collision budget), while
# the final answer is always re-verified on exact strings.
_HASH_SLACK = 2


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Distinct character k-gram shingles per document.

    Word-order sensitive — the right unit for near-dup detection on corpora
    with small vocabularies, where word-SET similarity saturates (every doc
    looks like every other doc and LSH candidate generation goes quadratic).
    """
    # Lowercase in a separate projection: inside the transform() lambda,
    # lower(text) would re-evaluate once PER SHINGLE (~n_shingles x doc
    # length char copies — measured 3x the whole extraction cost at sf0.1).
    lowered = df.select(F.col(id_col), F.lower(F.col(text_col)).alias("_lt"))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(_lt) - {k - 1}, 0)),"
        f" i -> substring(_lt, i, {k}))"
    )
    return lowered.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("w")
    )


def _hashed_shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, k: int,
    keep_text: bool = False,
) -> DataFrame:
    """One row per doc: ``(id, hs)`` where ``hs`` is the distinct hashed
    k-gram shingle array (vectorized polynomial hash, round 7) — the shared SSJoin primitive. Checkpointed: the
    explode for ranking, the tier-0/1 verify lanes, per-doc counts
    (``size(hs)``) and the global ``n_min`` all derive from it with no
    further shuffle. Dedup happens on the 8-byte hashes, not the strings;
    a within-doc collision shrinks a doc's set by one, which every
    downstream bound absorbs via ``_HASH_SLACK`` (tier-2 recomputes exact
    string sets for survivors, so outputs are exact).

    ``keep_text=True`` carries the LOWERED text through as ``_lt`` (round
    14): the tier-2 exact re-verify then reads survivor docs straight off
    this already-materialized frame instead of re-running the upstream
    collapse aggregation — one source-frame execution per ssjoin, not
    two. Costs checkpoint bytes (~the corpus text), which localCheckpoint
    spills to disk; only enabled by callers that need tier-2 texts.
    """
    lowered = df.select(F.col(id_col), F.lower(F.col(text_col)).alias("_lt"))

    # Round 7: the higher-order transform(sequence -> xxhash64(substring))
    # evaluated INTERPRETED per shingle position (~5 s of the 7.7 s
    # jaccard join at sf0.1). This Arrow kernel hashes every position
    # vectorized: codepoints via utf-32 (exact CHAR semantics — the
    # lowercasing stays Spark-side so tier-2's string verify sees the
    # identical text), sliding windows, one polynomial fold mod 2^64.
    # The hash only needs to be deterministic and collision-sparse — the
    # _HASH_SLACK relaxation + exact-string verify absorb collisions the
    # same way they did for xxhash64; values never cross engines (the
    # DuckDB oracles shingle on strings).
    def _build(batches):
        import numpy as np
        import pandas as pd

        # odd 64-bit multiplier (FNV prime); powers computed in Python
        # ints mod 2^64 (numpy scalar wraparound is intended but warns)
        b = 1099511628211
        powers = np.array(
            [pow(b, k - 1 - j, 1 << 64) for j in range(k)],
            dtype=np.uint64,
        )
        for pdf in batches:
            outs = []
            for txt in pdf["_lt"]:
                lt = txt or ""
                cps = np.frombuffer(
                    lt.encode("utf-32-le"), dtype=np.uint32
                )
                if len(cps) < k:
                    outs.append([])
                    continue
                win = np.lib.stride_tricks.sliding_window_view(
                    cps, k
                ).astype(np.uint64)
                hs = np.unique((win * powers).sum(axis=1, dtype=np.uint64))
                outs.append(hs.astype(np.int64).tolist())
            cols = {id_col: pdf[id_col], "hs": outs}
            if keep_text:
                cols["_lt"] = pdf["_lt"]
            yield pd.DataFrame(cols)

    schema = f"{id_col} long, hs array<bigint>"
    if keep_text:
        schema += ", _lt string"
    return lowered.mapInPandas(
        _build, schema
    ).localCheckpoint()  # lc-ok: pure compute; executor loss fails the query, rerun recomputes


# Fixed universal-hash constants for the minhash lanes (seeded once,
# 2026-08-13; a < 2^30 so a*x stays under 2^63 for 32-bit x). Shared with the
# DuckDB oracle via minhash_oracle_values() — changing these changes results.
MINHASH_P = 4294967311  # smallest prime > 2^32
MINHASH_AB = [
    (1064082031, 398802782),
    (298493742, 972347432),
    (58225162, 291219900),
    (215489561, 234034474),
    (703471044, 924035316),
    (586349398, 402639405),
    (1071644562, 668925748),
    (126328945, 428031840),
    (848272349, 230896653),
    (397332018, 858479239),
    (263703426, 106582524),
    (951695955, 87966394),
    (333402359, 490296874),
    (711675979, 955195195),
    (165938588, 890048279),
    (332297311, 970348799),
]


def minhash_oracle_values(num_hashes: int = 16) -> str:
    """The (s, a, b) lane constants as a SQL VALUES clause, so an external
    oracle engine can derive the identical signatures."""
    return ", ".join(
        f"({s}, {a}, {b})" for s, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    )


def minhash_signatures(
    tok: DataFrame, id_col: str, num_hashes: int = 16
) -> DataFrame:
    """K min-hashes per document from ONE md5 per token.

    Each token is hashed once (first 8 hex chars of md5 → 32-bit int x); the
    K lanes are the classic universal-hash family h_j = (a_j*x + b_j) mod p
    over that shared x — pure JVM arithmetic instead of K string hashes, so
    the per-token CPU is ~K× lower than hashing per lane. Computed as K
    parallel min-aggregates over one pass of the token frame — no seed
    explode, so the shuffle carries K columns × n_docs rows instead of
    K × n_tokens rows (map-side partial min does the reduction).
    Output: (id, h0..h{K-1}) as bigints.
    """
    # Project x once so the md5 is provably evaluated once per token, not
    # relying on codegen subexpression elimination across K aggregates.
    x = F.expr("CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT)").alias("x")
    tx = tok.select(F.col(id_col), x)
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{s}")
        for s, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    ]
    return tx.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(
    sig: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 2
) -> DataFrame:
    """Banded bucket keys: md5 of the in-band signature concatenation,
    unpivoted to (id, band, bh).

    Band/row tuning: with r = num_hashes/bands rows per band, the LSH
    s-curve crosses ~(1/bands)^(1/r); 16/2 → ≈0.92, so only true near-dups
    collide. Looser settings (12/3 → ≈0.76) make candidate generation
    quadratic on homogeneous corpora — measured 54k pairs from 500 docs."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        in_band = [
            F.col(f"h{s}").cast("string")
            for s in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *in_band)).alias("bh"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("_b")
    ).select(id_col, F.col("_b.band").alias("band"), F.col("_b.bh").alias("bh"))


def minhash_candidate_pairs(buckets: DataFrame, id_col: str) -> DataFrame:
    """Distinct (a, b) document pairs sharing any band bucket, a < b."""
    left = buckets.select(
        F.col(id_col).alias("a"), F.col("band"), F.col("bh")
    )
    right = buckets.select(
        F.col(id_col).alias("b"), F.col("band"), F.col("bh")
    )
    return (
        left.join(right, ["band", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame, tok: DataFrame, id_col: str
) -> DataFrame:
    """Exact word-set Jaccard for candidate pairs (verification stage).

    Round 14: per-doc token ARRAYS (one collect_set aggregate over the
    already-persisted token frame) joined to the pair frame, intersected
    per pair — replaces the token-explode join, whose intermediate was
    candidate-pairs × tokens-per-doc rows through two exchanges plus two
    more count-enrichment joins. Sizes come free as size(ws). Candidate
    volume is collision-bounded (banding), so the array bytes through
    the two pair joins are bounded by true-near-dup volume. Measured
    1.67 → 1.16 s on the sf0.1 verify stage, identical output (the
    token frame is distinct-per-doc, so collect_set == the token set)."""
    arrs = tok.groupBy(id_col).agg(F.collect_set("w").alias("ws"))
    aa = arrs.select(F.col(id_col).alias("a"), F.col("ws").alias("wsa"))
    bb = arrs.select(F.col(id_col).alias("b"), F.col("ws").alias("wsb"))
    i = F.size(F.array_intersect(F.col("wsa"), F.col("wsb")))
    return (
        pairs.join(aa, "a")
        .join(bb, "b")
        .select(
            "a",
            "b",
            (i / (F.size("wsa") + F.size("wsb") - i)).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    shingle_k: int = 5,
    collapse_exact: bool = False,
) -> DataFrame:
    """Full MinHash-LSH near-duplicate pipeline over character-shingle sets:
    candidates via band join, then exact Jaccard verify ≥ threshold.

    Default bands=4 at 16 hashes (round-7 sweep): r=4 rows/band measured
    recall 1.0 at threshold 0.8 on both sf0.01 and sf0.1 (vs 0.96-0.99
    for bands=2) at equal-or-lower cost; bands=8 (r=2) also hits 1.0 but
    its candidate set explodes (18.7 s vs 2.5 s at sf0.1) because two
    shared minhashes collide on every moderately-similar pair.

    shingle_k=0 switches to word tokens (saturates on small vocabularies —
    see ``shingles``).

    ``collapse_exact=True`` is the production ordering at scale: identical
    normalized texts collapse to their min-id representative BEFORE
    shingling, and pairs are reported between representatives only. LSH
    candidate generation is quadratic in duplicate-cluster size (a cluster
    of m identical docs alone yields m(m-1)/2 candidates, each paying an
    exact-Jaccard verify); the exact pass collapses those clusters for the
    price of one hash shuffle, so the near-dup stage is bounded by UNIQUE
    documents. The exact duplicates themselves come from the cheap
    ``exact_dedup``/hash pass — reporting them here would re-discover
    the same information at LSH prices. Measured at the 100x scale run:
    without the collapse, 500k docs in 100-replica clusters generate
    ~25M candidate pairs and the verify join explodes; with it, the
    candidate set is that of the 5k unique texts."""
    df = spread(df, id_col)
    if collapse_exact:
        key = F.md5(normalized_text(F.col(text_col)))
        df = (
            df.select(key.alias("_k"), F.col(id_col), F.col(text_col))
            .groupBy("_k")
            .agg(
                F.min(id_col).alias(id_col),
                F.min_by(text_col, id_col).alias(text_col),
            )
            .drop("_k")
        )
    tok = (
        shingles(df, id_col, text_col, shingle_k)
        if shingle_k
        else tokens(df, id_col, text_col)
    )
    # The token frame feeds three consumers (signatures, set sizes, pair
    # intersections); shingling is an interpreted higher-order function, so
    # recomputing it per consumer triples the dominant cost. Safe to cache:
    # derived from the caller's immutable frame, not from a re-listable path.
    tok = tok.persist()
    sig = minhash_signatures(tok, id_col, num_hashes)
    # Pre-flight pair budget (round 13): Σ n·(n-1)/2 over band buckets
    # is the EXACT candidate count of the self-join below. Persisting
    # the bucket frame makes the counting job double as the cache
    # materializer, so the candidate join reads cached buckets instead
    # of recomputing the signatures. On a replica-heavy corpus the guard
    # refuses BEFORE the disk-filling shuffle (observed at the sf10
    # sweep, SCALE.md) instead of after.
    from betfair_database_spark.plans.guards import assert_pair_budget

    buckets = lsh_band_buckets(sig, id_col, num_hashes, bands).persist()
    assert_pair_budget(
        buckets,
        ["band", "bh"],
        context="minhash_near_dups band buckets",
        remediation=(
            "collapse byte-identical texts first "
            "(collapse_exact=True, or exact_dedup upstream) so LSH "
            "prices unique documents, not replicas"
        ),
    )
    pairs = minhash_candidate_pairs(buckets, id_col)
    return (
        jaccard_on_pairs(pairs, tok, id_col)
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_incremental_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> DataFrame:
    """APPEND-TIME near-dup detection: pairs between a NEW batch and
    new ∪ corpus, with corpus-internal pairs excluded — when a crawl slice
    lands, existing-vs-existing pairs were already found when those docs
    landed, so only new-vs-all matters. Same banded MinHash-LSH as
    minhash_near_dups, but the bucket join probes the NEW docs' buckets
    against everyone's: candidate generation is O(new x collisions), never
    O(corpus^2) — the incremental shape a continuously-ingesting 100 TB
    corpus needs. Output (a, b, jaccard >= threshold) with ``a`` always a
    new doc; a new-new pair is reported once (a < b). Caller contract: ids
    are unique across both frames.
    """
    both = new_df.select(id_col, text_col).unionByName(
        corpus_df.select(id_col, text_col)
    )
    both = spread(both, id_col)
    tok = (
        shingles(both, id_col, text_col, shingle_k)
        if shingle_k
        else tokens(both, id_col, text_col)
    )
    tok = tok.persist()
    sig = minhash_signatures(tok, id_col, num_hashes)
    buckets = lsh_band_buckets(sig, id_col, num_hashes, bands).persist()
    new_ids = new_df.select(F.col(id_col)).distinct()
    nb = buckets.join(new_ids, id_col, "left_semi").select(
        F.col(id_col).alias("a"), "band", "bh"
    )
    # Pre-flight pair budget (round 13), bipartite form: the probe join
    # below is bounded by Σ n_new·n_all over shared buckets — priced on
    # the persisted bucket frame before any pair materializes.
    from betfair_database_spark.plans.guards import assert_pair_budget

    assert_pair_budget(
        nb.select("band", "bh"),
        ["band", "bh"],
        right_df=buckets,
        context="minhash_incremental_pairs probe buckets",
        remediation=(
            "collapse byte-identical texts upstream (exact_dedup) so "
            "the probe prices unique documents, not replicas"
        ),
    )
    is_new = new_ids.select(F.col(id_col).alias("b")).withColumn(
        "_bn", F.lit(True)
    )
    right = buckets.select(F.col(id_col).alias("b"), "band", "bh")
    pairs = (
        nb.join(right, ["band", "bh"])
        .join(is_new, "b", "left")
        .where(
            F.when(F.coalesce(F.col("_bn"), F.lit(False)), F.col("a") < F.col("b"))
            .otherwise(F.col("a") != F.col("b"))
        )
        .select("a", "b")
        .distinct()
    )
    return (
        jaccard_on_pairs(pairs, tok, id_col)
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash16(tok: DataFrame, id_col: str) -> DataFrame:
    """16-bit SimHash: bit j is the sign of Σ_tokens (±1), where the ±1 is the
    high bit of hex digit j of md5(token). Rendered as a 16-char '01' string
    (engine-independent)."""
    with_hash = tok.select(id_col, F.md5("w").alias("h"))
    bit_sums = with_hash.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.substring("h", j + 1, 1).isin(*"89abcdef"), F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"b{j}")
            for j in range(16)
        ]
    )
    fingerprint = F.concat(
        *[F.when(F.col(f"b{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(16)]
    )
    return bit_sums.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share either 8-bit half
    (pigeonhole: hamming ≤ max_hamming with 2 bands guarantees recall for
    hamming ≤ 1 per half; a scale deployment uses 4 bands of 4 bits), then
    exact hamming filter.

    Fingerprints are computed over character shingles, not word tokens: on a
    small-vocabulary corpus every document's word SET is nearly identical, so
    word-token SimHash collapses to a handful of fingerprints and cannot
    separate near-dups from unrelated docs (shingles carry word order).
    ``shingle_k=0`` falls back to word tokens.
    """
    sp = spread(df, id_col)
    tok = (
        shingles(sp, id_col, text_col, shingle_k)
        if shingle_k
        else tokens(sp, id_col, text_col)
    )
    fp = simhash16(tok, id_col)
    # Candidate generation as a UNION of per-half EQUI-joins, not an OR-join:
    # an OR of substring equalities is unsargable and falls back to a nested-
    # loop join (O(n²) comparisons); two hash joins on half-fingerprint keys
    # shuffle only on real collisions. Same pigeonhole recall.
    a = fp.select(F.col(id_col).alias("a"), F.col("simhash").alias("fa"))
    b = fp.select(F.col(id_col).alias("b"), F.col("simhash").alias("fb"))
    cands = []
    for lo in (1, 9):
        ah = a.withColumn("half", F.substring("fa", lo, 8))
        bh = b.withColumn("half", F.substring("fb", lo, 8))
        cands.append(
            ah.join(bh, "half").where(F.col("a") < F.col("b")).select("a", "b", "fa", "fb")
        )
    cand = cands[0].unionByName(cands[1]).dropDuplicates(["a", "b"])
    hamming = sum(
        (F.substring("fa", j + 1, 1) != F.substring("fb", j + 1, 1)).cast("int")
        for j in range(16)
    )
    return cand.select(
        "a", "b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def _ranked_shingle_stream(sh: DataFrame, id_col: str) -> DataFrame:
    """Global-rarity rank per doc over the exploded hashed-shingle stream
    (the shared SSJoin ranking stage). df as a WINDOW count, not
    groupBy+join-back: one exchange on hw with no join at all — measured
    2.4x faster than the join form, whose AQE broadcast conversion still
    pays the probe-side shuffle maps. (Pinning broadcast(freq) would be
    faster still at this SF but is a 100 TB bug: freq is vocabulary-
    sized.) A third form — SHUFFLE_HASH-hinted join-back, which keeps the
    hw exchange but drops the window's sort of the exploded token stream —
    was interleaved-A/B'd in round 13: a wash on jaccard (med 6.55 vs
    6.69 s) and clearly slower on containment (5.67 vs 6.27 s): the probe
    side's explode runs twice (freq derives from sh), costing what the
    sort saved. Window form is the default; the env flag keeps the A/B
    re-runnable and now has exactly one implementation (round 14 ADVICE).
    """
    if os.environ.get("SPARK_GRAFT_SSJOIN_SHJ_FREQ"):
        freq = sh.groupBy("hw").agg(F.count("*").alias("df"))
        ranked = sh.join(freq.hint("shuffle_hash"), "hw")
    else:
        ranked = sh.withColumn(
            "df", F.count("*").over(Window.partitionBy("hw"))
        )
    return ranked.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("hw"))
        ),
    )


def _tier2_string_pairs(
    base: DataFrame, survivors: DataFrame, id_col: str, k: int
) -> DataFrame:
    """(a, b, wsa, wsb): exact distinct STRING k-gram shingle arrays for
    survivor PAIRS, computed inline off the checkpointed base's lowered
    text (round 14). Replaces the old semi-join → shingle-explode →
    collect_list → two-join tail: survivors are within a small factor of
    the TRUE pair count, so two direct joins plus a per-pair
    array_distinct(transform(...)) beat three extra shuffles and their
    stage latency. A doc appearing in p pairs recomputes its array p
    times — bounded by output size, the right trade at any scale. The
    gram computation sits ABOVE the joins (expressions are not pushed
    through joins, only attribute pruning is), so string arrays
    materialize for survivor PAIR rows only — the full corpus never
    builds string arrays, exactly as before. The gram expression is
    shingles()'s exactly (same transform/substring semantics), so tier-2
    results are bit-identical. The text column is a plain attribute at
    gram time (multi-use reference blocks CollapseProject from inlining
    per-element work — the shingles() lesson)."""

    def grams(c: str):
        return F.array_distinct(
            F.expr(
                f"transform(sequence(1, greatest(length({c}) - {k - 1}, 0)),"
                f" i -> substring({c}, i, {k}))"
            )
        )

    da = base.select(F.col(id_col).alias("a"), F.col("_lt").alias("_la"))
    db = base.select(F.col(id_col).alias("b"), F.col("_lt").alias("_lb"))
    return (
        survivors.join(da, "a")
        .join(db, "b")
        .select(
            "a", "b", grams("_la").alias("wsa"), grams("_lb").alias("wsb")
        )
    )


def jaccard_ssjoin(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    collapse_exact: bool = True,
) -> DataFrame:
    """EXACT set-similarity self-join with prefix filtering (the PPJoin
    family): every document pair whose shingle-set Jaccard >= threshold,
    with no false negatives and no all-pairs comparison.

    Where MinHash-LSH gives probabilistic recall, this gives a proof: order
    each document's shingles by GLOBAL rarity (ascending frequency — rare
    first), and keep only the first ``n - ceil(t*n) + 1`` as its PREFIX. Two
    sets with Jaccard >= t must share at least one prefix token (if they
    shared none, the overlap is bounded below ceil(t*n) and the Jaccard
    below t — the standard prefix-filter lemma), so an equi-join on prefix
    tokens finds every qualifying pair. Rare-first ordering is what makes
    the candidate set small: a token shared by f documents contributes
    O(f^2) candidates, so prefixes built from the rarest tokens minimize
    the join fanout.

    Shuffles: shingle distinct, frequency agg (broadcast back), per-doc
    rank window, prefix equi-join, and a pairs-scoped intersection count —
    all hash exchanges on bounded keys; nothing all-pairs. Returns
    (a, b, jac) with jac rounded to 4.
    """
    if collapse_exact:
        # Same scale ordering as minhash_near_dups(collapse_exact=True),
        # same reason: identical texts share EVERY shingle, so a cluster of
        # r byte-identical replicas contributes r^2 candidate pairs that
        # the verify join then explodes by doc length — the 100x replica
        # corpus made the un-collapsed join unrunnable. Collapse on strict
        # byte equality (md5 of the raw text) to a min-id representative;
        # identical-copy pairs are exact_dedup's job, not this operator's.
        key = F.md5(F.col(text_col))
        df = (
            df.select(key.alias("_k"), F.col(id_col), F.col(text_col))
            .groupBy("_k")
            .agg(
                F.min(id_col).alias(id_col),
                F.min_by(text_col, id_col).alias(text_col),
            )
            .drop("_k")
        )

    # Every stage between shingling and the final exact verify runs on the
    # 8-byte hash of each shingle ("hw"), not the 9+-char string: the
    # freq join, the rank window sort, and the prefix equi-join all shuffle
    # fixed-width longs. Distinct strings colliding to one hw merge tokens —
    # which can only be handled safely by relaxing every candidate bound by
    # _HASH_SLACK (a collision shifts ranks/counts by at most one per event,
    # so a false negative needs > _HASH_SLACK independent ~2^-64 events in
    # one pair; with hashed-distinct n the same per-event budget covers the
    # count shift too). The output is exact — tier-2 verifies on strings.
    #
    # ONE narrow pass builds each doc's distinct hashed-shingle ARRAY; the
    # per-doc count (size), the tier-1 verify lanes (the array IS the set),
    # and the global n_min all come free from it — round 5 spent two full
    # 24M-row shuffles (groupBy sizes + collect_set rebuild) recomputing
    # what this checkpoint already holds.
    base = _hashed_shingle_arrays(df, id_col, text_col, k, keep_text=True)
    sh = base.select(
        F.col(id_col), F.size("hs").alias("n"), F.explode("hs").alias("hw")
    )
    # Rare-first ranking: shared helper (see _ranked_shingle_stream for
    # the window-vs-join A/B history).
    ranked = _ranked_shingle_stream(sh, id_col)
    # prefix length n - ceil(t*n) + 1 (the plain Jaccard prefix), slack-relaxed
    t = float(threshold)
    plen = F.col("n") - F.ceil(F.col("n") * F.lit(t)) + 1 + F.lit(_HASH_SLACK)
    prefix = ranked.where(F.col("rnk") <= plen).select(id_col, "hw", "rnk", "n")
    # POSITIONAL + LENGTH filters (PPJoin): the plain prefix is defeated by
    # small-alphabet corpora (measured here: 2041 distinct shingles across
    # 5000 docs -> 86% of all pairs were candidates). A pair at Jaccard t
    # needs overlap alpha = ceil(t/(1+t) * (n_a+n_b)); a shared token at
    # ranks (r_a, r_b) can contribute at most 1 + min(n_a-r_a, n_b-r_b)
    # overlap, so rows below alpha cannot initiate a candidacy. One-sided
    # necessary form first (vs the global min size, broadcast) so the join
    # fanout shrinks BEFORE the shuffle, exact two-sided form after.
    tt = t / (1.0 + t)
    nmin = base.agg(F.min(F.size("hs")).alias("n_min"))
    pre = (
        prefix.join(F.broadcast(nmin))
        .where(
            F.col("rnk")
            <= F.col("n")
            - F.ceil(F.lit(tt) * (F.col("n") + F.col("n_min")))
            + 1
            + F.lit(_HASH_SLACK)
        )
        .drop("n_min")
    )
    pa = pre.select(
        F.col(id_col).alias("a"), "hw",
        F.col("rnk").cast("int").alias("ra"), F.col("n").cast("int").alias("nra"),
    )
    pb = pre.select(
        F.col(id_col).alias("b"), "hw",
        F.col("rnk").cast("int").alias("rb"), F.col("n").cast("int").alias("nrb"),
    )
    alpha = F.ceil(F.lit(tt) * (F.col("nra") + F.col("nrb")))
    # Per-PAIR aggregated positional bound (tighter than any single-token
    # PPJoin check): matched prefix tokens appear in the same relative order
    # on both sides (one consistent global order), so every shared token NOT
    # matched by the prefix join lies strictly after the LAST match on BOTH
    # sides — overlap <= cnt + min(n_a - max(ra), n_b - max(rb)). The
    # classical first-match bound (1 + min(n_a - min(ra), n_b - min(rb)))
    # is also necessary; both are applied. Aggregation is map-side combined,
    # so the shuffle carries one row per pair either way — this replaces the
    # old dropDuplicates with the same exchange and a far smaller output.
    cand = (
        pa.join(pb, "hw")
        .where(
            (F.col("a") < F.col("b"))
            # length filter: |a| >= t|b| and |b| >= t|a|
            & (F.col("nra") >= F.lit(t) * F.col("nrb"))
            & (F.col("nrb") >= F.lit(t) * F.col("nra"))
        )
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("cnt"),
            F.max("ra").alias("ra_max"),
            F.max("rb").alias("rb_max"),
            F.min("ra").alias("ra_min"),
            F.min("rb").alias("rb_min"),
            F.first("nra").alias("nra"),
            F.first("nrb").alias("nrb"),
        )
        .where(
            (
                F.col("cnt")
                + F.least(
                    F.col("nra") - F.col("ra_max"), F.col("nrb") - F.col("rb_max")
                )
                + F.lit(_HASH_SLACK)
                >= alpha
            )
            & (
                1
                + F.least(
                    F.col("nra") - F.col("ra_min"), F.col("nrb") - F.col("rb_min")
                )
                + F.lit(_HASH_SLACK)
                >= alpha
            )
        )
        .select("a", "b")
    )
    # TWO-TIER verification (the 100 TB cost center: candidates x doc-length
    # array bytes). Tier 1 intersects 8-byte hashed lanes — primitive long
    # arrays are ~3x smaller on the wire than 9-char string elements (8 B
    # fixed vs offset+padded payload) and long equality beats UTF8String
    # hashing inside array_intersect. A cross-doc hash collision only
    # INFLATES the estimated overlap (safe side); a within-doc collision
    # can shrink a doc's hashed set by 1, so the tier-1 filter is relaxed
    # by _HASH_SLACK merged-shingle events per pair — a false negative now
    # needs > _HASH_SLACK independent ~n_doc^2/2^64 events in one pair,
    # far beyond even a 128-bit collision budget. Tier 2 re-verifies the
    # handful of survivors on the exact STRING shingle sets, so the output
    # is exact end-to-end: no false negatives, no false positives.
    # (Measured sf0.1: verify 29.8 s -> tier-1 long intersect + tiny exact
    # join; the token-join alternative was 1.6x slower end to end.)
    # The verify lanes come straight off the checkpointed base arrays — no
    # collect_set re-aggregation. Tier 0 first: intersect HALF-size subsets
    # {h : h mod 2 = 0} of both sides. Sound because sampling both sides by
    # the same hash predicate makes the sampled miss-set exactly the sample
    # of the miss-set (|A_s \ B_s| = |(A\B)_s| <= |A\B|), and a true pair
    # at Jaccard >= t has |A\B| <= (n_a - t*n_b)/(1+t) (from
    # i >= t(n_a+n_b)/(1+t)), so it must satisfy
    # |A_s ∩ B_s| >= |A_s| - (n_a - t*n_b)/(1+t) - slack, and symmetrically
    # for B. Mod-4 (the containment screen) would be VACUOUS here: at
    # t=0.6, |A\B| can reach n/4 — exactly the sample size; mod-2 leaves a
    # n/4 margin. ~99.8% of candidates are false on this corpus and fail
    # the screen on half the bytes; survivors pay full arrays.
    hs2 = F.expr("filter(hs, h -> pmod(h, 2) = 0)")
    s2a = base.select(
        F.col(id_col).alias("a"), hs2.alias("hs2a"), F.size("hs").alias("na")
    )
    s2b = base.select(
        F.col(id_col).alias("b"), hs2.alias("hs2b"), F.size("hs").alias("nb")
    )
    i0 = F.size(F.array_intersect(F.col("hs2a"), F.col("hs2b")))
    t0_surv = (
        cand.join(s2a, "a")
        .join(s2b, "b")
        .where(
            (
                i0 + (F.col("na") - F.lit(t) * F.col("nb")) / F.lit(1.0 + t)
                + F.lit(_HASH_SLACK)
                >= F.size(F.col("hs2a"))
            )
            & (
                i0 + (F.col("nb") - F.lit(t) * F.col("na")) / F.lit(1.0 + t)
                + F.lit(_HASH_SLACK)
                >= F.size(F.col("hs2b"))
            )
        )
        .select("a", "b")
    )
    ha = base.select(
        F.col(id_col).alias("a"), F.col("hs").alias("hsa"),
        F.size("hs").alias("na"),
    )
    hb = base.select(
        F.col(id_col).alias("b"), F.col("hs").alias("hsb"),
        F.size("hs").alias("nb"),
    )
    ih = F.size(F.array_intersect(F.col("hsa"), F.col("hsb"))) + F.lit(_HASH_SLACK)
    # No lineage cut here (round 14): the rewritten tier-2 consumes
    # survivors exactly ONCE (a linear join chain), so the old eager
    # checkpoint bought recompute-avoidance nothing and cost a separate
    # materialization job; AQE sizes the tier-2 joins off the runtime
    # stage statistics instead.
    survivors = (
        t0_surv.join(ha, "a")
        .join(hb, "b")
        .where(ih >= F.lit(t) * (F.col("na") + F.col("nb") - ih))
        .select("a", "b")
    )
    # Tier 2: exact string shingle sets recomputed INLINE for survivor
    # pairs only — see _tier2_string_pairs (the full corpus never
    # materializes string arrays; survivors are within a small factor of
    # the true pair count).
    t2 = _tier2_string_pairs(base, survivors, id_col, k)
    i = F.size(F.array_intersect(F.col("wsa"), F.col("wsb")))
    jac = i / (F.size("wsa") + F.size("wsb") - i)
    return (
        t2.select("a", "b", F.round(jac, 4).alias("jac"))
        .where(F.col("jac") >= threshold)
    )


def containment_ssjoin(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    collapse_exact: bool = True,
) -> DataFrame:
    """EXACT containment self-join: every ordered pair (a, b), a != b,
    with |Sa intersect Sb| / |Sa| >= threshold — "at least t of a's
    shingles also appear in b". The quote / partial-copy / mirror detector:
    unlike Jaccard it is ASYMMETRIC, so a short document quoted inside a
    long one scores high even though their Jaccard is tiny.

    Prefix lemma, containment form: if the overlap reaches ceil(t*n_a),
    then among a's (n_a - ceil(t*n_a) + 1) globally-RAREST shingles at
    least one lies in Sb (pigeonhole on a's own rare-first ordering). So
    candidates come from joining a's prefix against b's full ranked
    shingle list — the SYMMETRIC length filter of the Jaccard join does
    not apply (b may be arbitrarily large; that is the point of
    containment), but the one-sided bound n_b >= ceil(t*n_a) and the
    PPJoin positional bound still do, and they halve the end-to-end cost
    (see the candidate-join comment). Verification is the same whole-set
    array_intersect as jaccard_ssjoin.

    No false negatives; the final containment is computed on exact string
    shingles (hashed lanes are a pruning tier only — carrying the hash as
    the sole representation was rejected for 64-bit birthday collisions,
    see PLANS; as a slack-relaxed pre-filter it cannot change results).
    """
    if collapse_exact:
        key = F.md5(F.col(text_col))
        df = (
            df.select(key.alias("_k"), F.col(id_col), F.col(text_col))
            .groupBy("_k")
            .agg(
                F.min(id_col).alias(id_col),
                F.min_by(text_col, id_col).alias(text_col),
            )
            .drop("_k")
        )
    # Hashed-lane stages + string-exact verify, as in jaccard_ssjoin: all
    # bounds below carry the _HASH_SLACK relaxation so 64-bit shingle-hash
    # collisions (which merge tokens and can shift ranks/counts by one per
    # event) cannot cause a false negative short of > _HASH_SLACK
    # independent ~2^-64 events landing in one candidate pair. Per-doc
    # arrays come from the shared checkpointed base (see
    # _hashed_shingle_arrays) — n, the verify lanes and the tier-0 sample
    # all derive from it with no aggregation shuffle.
    base = _hashed_shingle_arrays(df, id_col, text_col, k, keep_text=True)
    sh = base.select(
        F.col(id_col), F.size("hs").alias("n"), F.explode("hs").alias("hw")
    )
    t = float(threshold)
    # Rare-first ranking: shared helper (see _ranked_shingle_stream for
    # the window-vs-join A/B history, including the round-13 SHUFFLE_HASH
    # join-back negative result).
    ranked = _ranked_shingle_stream(sh, id_col)
    prefix = ranked.where(
        F.col("rnk")
        <= F.col("n") - F.ceil(F.col("n") * F.lit(t)) + 1 + F.lit(_HASH_SLACK)
    )
    pa = prefix.select(
        F.col(id_col).alias("a"), "hw",
        F.col("rnk").cast("int").alias("ra"), F.col("n").cast("int").alias("na"),
    )
    # b side is ranked too: the PPJoin positional bound holds for ANY
    # overlap target — tokens intersect in the same global rare-first
    # order, so a pair meeting ceil(t*n_a) overlap via token w at ranks
    # (r_a, r_b) needs 1 + min(n_a-r_a, n_b-r_b) >= ceil(t*n_a). The
    # length form (n_b >= ceil(t*n_a)) is its corollary. Measured on the
    # sf0.1 corpus: 20.1 s -> 10.9 s end to end.
    #
    # Pre-join b-side prune (round 6): that same positional bound, taken
    # one-sided with the broadcast global minimum size (n_a >= n_min), is a
    # per-ROW filter — a b-row at rank r_b can initiate a candidacy only if
    # 1 + (n_b - r_b) >= ceil(t*n_min) - slack. It shrinks the probe side
    # of the hw join BEFORE its shuffle (the b side is the whole ranked
    # token stream, the single biggest frame in this operator). How much it
    # prunes depends on the corpus size floor; it can never prune a true
    # candidate.
    nmin = base.agg(F.min(F.size("hs")).alias("n_min"))
    pb = (
        ranked.join(F.broadcast(nmin))
        .where(
            1 + F.col("n") - F.col("rnk")
            >= F.ceil(F.lit(t) * F.col("n_min")) - F.lit(_HASH_SLACK)
        )
        .select(
            F.col(id_col).alias("b"), "hw",
            F.col("rnk").cast("int").alias("rb"),
            F.col("n").cast("int").alias("nb"),
        )
    )
    alpha = F.ceil(F.lit(t) * F.col("na")) - F.lit(_HASH_SLACK)
    # Per-pair aggregated bound, containment form. cnt counts prefix(a)
    # tokens found anywhere in b; every UNMATCHED shared token lies beyond
    # prefix(a) (else the join would have matched it) and, by order
    # consistency, beyond the last match on b's side too:
    # overlap <= cnt + min(ceil(t*n_a) - 1, n_b - max(rb)). The first-match
    # bound (1 + min(n_a - min(ra), n_b - min(rb))) is applied alongside.
    cand = (
        pa.join(pb, "hw")
        .where((F.col("a") != F.col("b")) & (F.col("nb") >= alpha))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("cnt"),
            F.max("rb").alias("rb_max"),
            F.min("ra").alias("ra_min"),
            F.min("rb").alias("rb_min"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        .where(
            (
                F.col("cnt")
                + F.least(
                    F.ceil(F.lit(t) * F.col("na")) - 1,
                    F.col("nb") - F.col("rb_max"),
                )
                + F.lit(_HASH_SLACK)
                >= F.ceil(F.lit(t) * F.col("na"))
            )
            & (
                1
                + F.least(
                    F.col("na") - F.col("ra_min"), F.col("nb") - F.col("rb_min")
                )
                + F.lit(_HASH_SLACK)
                >= F.ceil(F.lit(t) * F.col("na"))
            )
        )
        .select("a", "b")
    )
    # Tiered verify, containment form — same hashed-lane design and
    # _HASH_SLACK safety argument as jaccard_ssjoin's verify, plus a
    # SAMPLED tier 0: at t=0.9 the positional bounds are structurally weak
    # (cnt >= 1 passes almost any shared rare token), so candidate volume
    # stays high and full-array intersections dominate. Tier 0 intersects
    # the ~quarter-size subsets {h : h mod 4 = 0} of each side. Sound
    # because sampling BOTH sides by the same hash predicate makes the
    # sampled miss-set exactly the sample of the miss-set:
    # |A_s \ B_s| = |(A\B)_s| <= |A\B|, and a true pair has
    # |A\B| <= n_a - ceil(t*n_a); so every true pair satisfies
    # |A_s ∩ B_s| >= |A_s| - (n_a - ceil(t*n_a)) - slack. False pairs
    # lose ~0.7*n_a shingles and fail it on 1/4 the bytes.
    hss = F.expr("filter(hs, h -> pmod(h, 4) = 0)")
    budget = F.col("na") - F.ceil(F.lit(t) * F.col("na")) + F.lit(_HASH_SLACK)
    sa = base.select(
        F.col(id_col).alias("a"), hss.alias("hssa"), F.size("hs").alias("na")
    )
    sb = base.select(F.col(id_col).alias("b"), hss.alias("hssb"))
    i0 = F.size(F.array_intersect(F.col("hssa"), F.col("hssb")))
    t0_surv = (
        cand.join(sa, "a")
        .join(sb, "b")
        .where(i0 + budget >= F.size(F.col("hssa")))
        .select("a", "b")
    )
    ha = base.select(
        F.col(id_col).alias("a"), F.col("hs").alias("hsa"),
        F.size("hs").alias("na"),
    )
    hb = base.select(F.col(id_col).alias("b"), F.col("hs").alias("hsb"))
    ih = F.size(F.array_intersect(F.col("hsa"), F.col("hsb"))) + F.lit(_HASH_SLACK)
    # No lineage cut (round 14): single-consumer survivors, see
    # jaccard_ssjoin's identical note.
    survivors = (
        t0_surv.join(ha, "a")
        .join(hb, "b")
        .where(ih >= F.lit(t) * F.col("na"))
        .select("a", "b")
    )
    # Tier 2 inline on survivor pairs only (see _tier2_string_pairs).
    t2 = _tier2_string_pairs(base, survivors, id_col, k)
    cont = (
        F.size(F.array_intersect(F.col("wsa"), F.col("wsb")))
        / F.size("wsa")
    )
    return (
        t2.select("a", "b", F.round(cont, 4).alias("containment"))
        .where(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better"): find every duplicated token run of
# length >= L across the corpus and the maximal spans they merge into.
# ---------------------------------------------------------------------------


def _token_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws: array<string>, n: int) with lowercased whitespace tokens."""
    ws = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda w: w != F.lit(""),
    )
    return df.select(F.col(id_col), ws.alias("ws")).withColumn(
        "n", F.size("ws")
    )


def exact_substring_spans(
    df: DataFrame,
    l: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Maximal duplicated-substring spans: every L-token gram that occurs
    more than once corpus-wide (ANY position, same doc included) marks its
    token interval [pos, pos+L-1]; overlapping/adjacent intervals merge
    into maximal spans — the suffix-array dedup of Lee et al. 2022
    re-expressed as a gram-count join + interval merge, which is the
    shuffle-bounded distributed form (a true distributed suffix array
    sorts the whole corpus; the gram join shuffles one row per gram and
    grows with the duplicate mass, not O(n²)).

    Gram identity here is the exact token string — at 100 TB you would
    shuffle xxhash64(gram) instead and exact-verify survivors, exactly the
    _HASH_SLACK + string-verify pattern jaccard_ssjoin uses; the string
    form keeps the oracle engine-independent.

    Returns (tokens_frame, spans_frame): tokens_frame is (id, ws, n);
    spans_frame is (id, s, e) 1-based inclusive maximal spans.
    """
    tok = _token_arrays(df, id_col, text_col)
    grams = tok.where(F.col("n") >= l).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - l + 1),
                lambda i: F.array_join(F.slice("ws", i, l), " "),
            )
        ).alias("pos0", "gram"),
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .select("gram")
    )
    hits = grams.join(dup, "gram").select(
        id_col,
        (F.col("pos0") + 1).alias("s"),
        (F.col("pos0") + l).alias("e"),
    )
    w = Window.partitionBy(id_col).orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = (
        hits.withColumn(
            "brk",
            F.when(
                prev_max_e.isNull() | (F.col("s") > prev_max_e + 1), 1
            ).otherwise(0),
        )
        .withColumn("gid", F.sum("brk").over(w))
        .groupBy(id_col, "gid")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .drop("gid")
    )
    return tok, grouped


def exact_substring_stats(
    df: DataFrame, l: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-substring accounting: token count, number
    of maximal duplicated spans, tokens covered, covered fraction."""
    tok, spans = exact_substring_spans(df, l, id_col, text_col)
    agg = spans.groupBy(id_col).agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
    )
    return (
        tok.join(agg, id_col, "left")
        .select(
            id_col,
            F.col("n").cast("int").alias("n_tokens"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("int").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.nullif(F.col("n"), F.lit(0)).cast("double"),
                4,
            ).alias("dup_frac"),
        )
    )


def exact_substring_rewrite(
    df: DataFrame, l: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus rewrite that REMOVES every duplicated span (all copies, the
    Lee et al. default): tokens whose position falls inside any maximal
    span are dropped, the rest are rejoined. Per-row span lists are tiny
    (bounded by n/L), so the exists() lambda over them is per-row work —
    the only shuffles are the gram count and the span merge window.
    Returns (id, n_kept, kept_text)."""
    tok, spans = exact_substring_spans(df, l, id_col, text_col)
    span_arr = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("spans")
    )
    joined = tok.join(span_arr, id_col, "left").withColumn(
        "spans", F.coalesce("spans", F.array())
    )
    kept = F.filter(
        F.transform(
            "ws", lambda w, i: F.struct(w.alias("w"), (i + 1).alias("pos"))
        ),
        lambda x: ~F.exists(
            "spans", lambda sp: (x["pos"] >= sp["s"]) & (x["pos"] <= sp["e"])
        ),
    )
    return joined.select(
        id_col,
        F.size(kept).alias("n_kept"),
        F.array_join(F.transform(kept, lambda x: x["w"]), " ").alias(
            "kept_text"
        ),
    )


def minhash_lsh_params(
    threshold: float, num_hashes: int
) -> tuple[int, int]:
    """Pick (bands, rows_per_band) for an LSH banding scheme at a target
    Jaccard ``threshold`` — the standard S-curve optimization (Mining of
    Massive Datasets §3.4.3, the same computation datasketch's
    ``_optimal_param`` performs): among the divisor pairs
    ``b * r == num_hashes``, minimize the sum of the false-positive area
    (∫₀^t 1-(1-s^r)^b ds) and false-negative area (∫ₜ^1 (1-s^r)^b ds),
    integrated numerically. The existing operators take explicit
    ``bands=`` — this is the picker that turns a corpus-level threshold
    decision into that argument (16 hashes @ 0.8 → 2 bands of 8;
    @ 0.5 → 4 bands of 4). Deterministic, driver-side, O(divisors x
    quadrature points)."""
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    if num_hashes < 2:
        raise ValueError("num_hashes must be >= 2")
    best: "tuple[float, int, int] | None" = None
    steps = 500
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        fp = fn = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p_cand = 1.0 - (1.0 - s**r) ** b
            if s < threshold:
                fp += p_cand
            else:
                fn += 1.0 - p_cand
        err = (fp + fn) / steps
        if best is None or err < best[0]:
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]
