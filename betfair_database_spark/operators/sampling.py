"""Deterministic corpus sampling & mixing (training-data pipeline ops).

``df.sample()`` is seed-and-partitioning dependent — rerunning after a
repartition or on a different cluster yields a different corpus, which is
unacceptable for reproducible training mixes. These operators derive every
keep/drop decision from a hash of a stable key, so the same inputs always
produce the same sample, on any engine (the DuckDB oracles compute identical
buckets), at any parallelism.

At 100 TB all three are embarrassingly parallel single-pass filters (the
token-budget take adds one shuffle for its per-group window) — no driver
participation, no sampling state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_uniform_long(key: Column) -> Column:
    """The engine-independent 32-bit uniform: first 8 md5 hex chars as a
    long. ONE definition — the DuckDB oracles reproduce this exact
    expression, so every consumer (budget take, packing, weighted
    priority) must stay in lockstep."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("long")


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 4 hex chars of
    md5(string(key)) as an int, mod buckets. Uniform enough for sampling
    rates; reproducible across engines, runs and partitionings."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")
        % buckets
    )


def stratified_sample(
    df: DataFrame, strata_col: str, rates: dict[str, int], key_col: str,
    default_rate: int = 0, buckets: int = 100,
) -> DataFrame:
    """Keep rows whose hash bucket falls below their stratum's rate —
    per-stratum Bernoulli sampling with deterministic membership.

    ``rates`` maps stratum value → number of buckets kept (out of
    ``buckets``), e.g. {'en': 50} keeps ~50% of English rows.
    """
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    return df.where(hash_bucket(F.col(key_col), buckets) < rate)


def token_budget_take(
    df: DataFrame, group_col: str, key_col: str, tokens_col: str, budget: int
) -> DataFrame:
    """Within each group, keep rows in deterministic hash order until the
    cumulative token count would exceed ``budget`` (greedy prefix take —
    the standard way to cut a per-source corpus down to a token budget).

    Hash order, not input order: stable under file re-layout, and unbiased
    w.r.t. any ordering of the source data. One shuffle (the per-group
    window); the window partitions by group, so no global sort.
    """
    h = md5_uniform_long(F.col(key_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum", F.sum(tokens_col).over(w))
        .where(F.col("_cum") <= budget)
        .drop("_cum")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split each document into fixed-size character windows with overlap —
    the standard pre-tokenization chunking for embedding/retrieval corpora.

    Chunk c starts at 1 + c*(chunk_size - overlap); starts run while they
    are <= max(len - overlap, 1), so every character lands in at least one
    chunk, consecutive chunks share ``overlap`` characters, and an empty
    document yields one empty chunk (never zero rows — a chunker that
    silently drops documents corrupts joins downstream).

    Output: (id, chunk_ix, chunk). Embarrassingly parallel: one projection
    + posexplode, no shuffle, no Python. At 100 TB this is the map stage in
    front of the tokenizer/embedder.
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    stride = chunk_size - overlap
    starts = F.expr(
        f"sequence(1, greatest(length({text_col}) - {overlap}, 1), {stride})"
    )
    return df.select(
        F.col(id_col), F.col(text_col), F.posexplode(starts).alias("chunk_ix", "_s")
    ).select(
        id_col,
        F.col("chunk_ix").cast("int").alias("chunk_ix"),
        F.expr(f"substring({text_col}, _s, {chunk_size})").alias("chunk"),
    )


def pack_sequences(
    df: DataFrame, group_col: str, key_col: str, tokens_col: str, budget: int
) -> DataFrame:
    """Assign each document to a fixed-token-budget training bin (sequence
    packing): within each group, documents are laid out in deterministic
    hash order and a document belongs to the bin where its cumulative
    window STARTS — bins fill to ~budget tokens, a boundary-spanning
    document overflows its bin rather than splitting (the streaming-pack
    convention; split with chunk_documents first if documents can exceed
    the budget).

    Deterministic at any parallelism (same hash order as
    token_budget_take). One shuffle — the per-group window; bins never
    cross groups, so there is no global sort to bottleneck at scale.
    Output: input columns + ``bin`` (0-based within group).
    """
    h = md5_uniform_long(F.col(key_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return df.withColumn("bin", (start / budget).cast("long"))


def weighted_priority_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows: heavier rows are more
    likely in, but membership is a pure function of the key — rerunnable on
    any engine/partitioning (unlike rand()-keyed A-Res).

    Priority = hash_uniform(key) / weight, keep the k SMALLEST. The uniform
    comes from the first 8 md5 hex chars (a 32-bit int); the division of an
    exact integer by an exact integer weight is correctly rounded IEEE-754,
    so the priority — and therefore the sample — is bit-identical across
    Spark and any SQL oracle. (A transcendental key like -ln(u)/w would be
    the textbook A-ES priority but libm differences across engines can flip
    orderings near the cutoff; the rational key keeps the same
    heavier-more-likely monotonicity with exact cross-engine agreement.)

    One scan + a k-row TakeOrderedAndProject — no shuffle of the data, no
    driver participation; at 100 TB this is a map + top-k reduce.
    Output: input columns + ``priority`` (rounded to 6).
    """
    pr = (
        md5_uniform_long(F.col(key_col)).cast("double")
        / F.col(weight_col).cast("double")
    )
    # Rows with NULL or non-positive weight are NEVER sampled. Without the
    # guard they'd win every slot: u/0 is NULL in Spark SQL (not IEEE inf)
    # and ascending sort puts NULLS FIRST, inverting the contract — and
    # disagreeing with any IEEE-arithmetic oracle, which gets +inf and
    # sorts them last.
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("priority", F.round(pr, 6))
        .orderBy(F.col("priority").asc(), F.col(key_col).asc())
        .limit(k)
    )


def match_target_mix(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    targets: dict[str, float],
    buckets: int = 10_000,
) -> DataFrame:
    """Downsample to a TARGET distribution over ``strata_col`` (shares
    summing to 1) without upsampling — the data-mixing step that turns an
    as-crawled corpus into a training mix.

    The output size is the largest N the corpus supports at the target mix:
    ``N = min_g(n_g / share_g)``. The binding stratum (smallest ratio)
    keeps every row; every other stratum is hash-thinned to
    ``share_g * N`` rows. Membership is a pure function of the key (md5
    bucket vs a per-stratum threshold), so the sample is reproducible on
    any engine or partitioning. Strata absent from ``targets`` are dropped.

    Unlike :func:`stratified_sample`, the per-stratum rates are COMPUTED
    from observed counts: one tiny count aggregate (strata-sized), its min
    reduced to a 1-row frame, both broadcast back onto the corpus — the
    corpus itself is scanned once and never shuffled. The threshold is
    quantized with ``floor(x * buckets + 0.5)`` so both engines derive the
    identical integer from the identical IEEE doubles. The bucket comes
    from the 32-bit md5 uniform (not the 16-bit ``hash_bucket``, whose
    ``65536 % 10000`` modulo bias would be ~14% at this resolution).
    """
    share = F.lit(None).cast("double")
    for value, s in sorted(targets.items()):
        share = F.when(F.col(strata_col) == value, F.lit(float(s))).otherwise(
            share
        )
    counts = (
        df.where(F.col(strata_col).isin(list(targets)))
        .groupBy(strata_col)
        .agg(F.count("*").alias("_n"))
    )
    n_out = counts.select(
        (F.col("_n").cast("double") / share).alias("_c")
    ).agg(F.min("_c").alias("_cap"))
    thr = F.floor(
        share * F.col("_cap") / F.col("_n").cast("double") * buckets + 0.5
    )
    return (
        df.join(F.broadcast(counts), strata_col)
        .join(F.broadcast(n_out))
        .where(md5_uniform_long(F.col(key_col)) % buckets < thr)
        .drop("_n", "_cap")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    salt: str = "split",
) -> DataFrame:
    """Group-aware train/eval split: the assignment unit is the NEAR-DUP
    CLUSTER, not the document — a cluster straddling the boundary leaks
    training text into evaluation, the classic contamination bug a naive
    per-row split ships. ``pairs`` is any near-dup edge frame (MinHash,
    SSJoin, embedding LSH...); docs are grouped by connected component
    (min-id label propagation, graph.connected_components) and singletons
    are their own group, then the whole GROUP lands in one side via the
    engine-independent md5 bucket of (salt|group_id).

    Output: (id, group_id, split∈{train,eval}). Deterministic, partitioning-
    independent, reproducible across engines (the same md5-bucket convention
    as the other samplers). Scale shape: the component labels are the only
    iterative piece (one shuffle per round over the EDGE set, which is
    near-dup-sized, not corpus-sized); the corpus itself takes one
    broadcast-ready left join against the labels.

    Id typing: numeric ids yield a long ``group_id`` (min numeric id of the
    cluster); any other id type yields a string ``group_id``. The branch is
    on the DECLARED schema, never a data-dependent cast — ``cast("long")``
    on a string id like ``"doc_42"`` is NULL, and ``concat_ws`` dropping
    that NULL would hash EVERY singleton into one bucket, putting the whole
    unclustered corpus on one side of the split.
    """
    from pyspark.sql.types import NumericType

    from betfair_database_spark.operators.graph import connected_components

    comp = connected_components(pairs, "a", "b").select(
        F.col("node").alias(id_col), F.col("component")
    )
    numeric = isinstance(df.schema[id_col].dataType, NumericType)
    id_t = "long" if numeric else "string"
    group = F.coalesce(
        F.col("component").cast(id_t), F.col(id_col).cast(id_t)
    )
    bucket = hash_bucket(
        F.concat_ws("|", F.lit(salt), group.cast("string")), 100
    )
    return (
        df.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            group.alias("group_id"),
            F.when(bucket < F.lit(train_pct), F.lit("train"))
            .otherwise(F.lit("eval"))
            .alias("split"),
        )
    )


def temperature_resample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    buckets: int = 10000,
) -> DataFrame:
    """Temperature-based mixture resampling — the standard LLM data-mixing
    knob: target stratum shares ∝ (observed share)^alpha, alpha in (0, 1]
    (1 = no-op, smaller = flatter mix; the p_i ∝ p_raw^alpha rule of
    multilingual/multi-source training). Solving for the largest output
    with no stratum oversampled collapses to a closed form: keep stratum g
    at rate (n_min / n_g)^(1-alpha) — the smallest stratum survives whole,
    larger strata shrink toward it.

    One strata-sized count aggregate + a 1-row min, both broadcast onto a
    single corpus pass; membership is a pure md5 function of the key
    (deterministic, partitioning-independent). alpha=0.5 uses sqrt, which
    IEEE correctly rounds — bit-identical across engines; other alphas go
    through pow, where last-ulp libm differences are possible (the
    floor(x*buckets + 0.5) quantization makes a flip a ~1e-13 event).
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    ratio = F.col("_nmin").cast("double") / F.col("_n").cast("double")
    if abs(alpha - 0.5) < 1e-12:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - float(alpha)))
    thr = F.floor(rate * buckets + 0.5)
    return (
        df.join(F.broadcast(counts), strata_col)
        .join(F.broadcast(nmin))
        .where(md5_uniform_long(F.col(key_col)) % buckets < thr)
        .drop("_n", "_nmin")
    )


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Weight-balanced shard assignment for training-data output: rank rows
    by (weight desc, key), then snake (boustrophedon) the ranks across
    ``n_shards`` — rank block 0 deals shards 0..n-1, block 1 deals n-1..0,
    so every shard's total weight stays within one max-row weight of the
    others (the classic LPT-style guarantee for sorted snake dealing).
    Output: (key, weight, shard).

    The global rank is computed DISTRIBUTED — no single-partition window:
    range-repartition on (weight desc, key) gives globally ordered,
    non-overlapping partitions; row_number runs per partition
    (spark_partition_id window — partition-local, no extra exchange) and a
    partition-count offset map (one tiny collect, |partitions| rows,
    broadcast back) turns local ranks into global ones. At 100 TB the only
    data-sized movement is the one range exchange.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.select(key_col, weight_col).repartitionByRange(
        p, F.col(weight_col).desc(), F.col(key_col)
    )
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    local_w = Window.partitionBy("_pid").orderBy(
        F.col(weight_col).desc(), F.col(key_col)
    )
    # Materialize ONCE: spark_partition_id is a physical property — AQE may
    # coalesce the range exchange differently between the counts job below
    # and the final job, silently shifting pids. The checkpoint pins one
    # partitioning for both consumers.
    local = with_pid.withColumn(
        "_lrn", F.row_number().over(local_w)
    ).localCheckpoint()  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    counts = {
        r["_pid"]: r["cnt"]
        for r in local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    rank0 = off[F.col("_pid")] + F.col("_lrn") - 1  # 0-based global rank
    block, pos = rank0 % (2 * n_shards), rank0 % n_shards
    shard = F.when(block < n_shards, pos).otherwise(n_shards - 1 - pos)
    return local.select(
        key_col, weight_col, shard.cast("int").alias("shard")
    )


def domain_cap(
    docs: DataFrame,
    cap: int,
    domain_col: str = "source",
    quality_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap — the RefinedWeb/FineWeb curation step that
    stops any single domain from dominating a web-scale corpus: keep at
    most ``cap`` documents per ``domain_col``, preferring the highest
    ``quality_col`` (ties, and the no-quality case, break on ``id_col``
    for determinism).

    One shuffle, keyed on the domain. The per-domain window never funnels
    the corpus through one task because domains partition it; a
    pathologically hot domain is exactly the thing the cap REMOVES, and
    row_number short-circuits cheaply since only ranks <= cap survive.
    """
    order = (
        [F.col(quality_col).desc(), F.col(id_col)]
        if quality_col
        else [F.col(id_col)]
    )
    w = Window.partitionBy(domain_col).orderBy(*order)
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )


def dsir_importance_topk(
    docs: DataFrame,
    target_pred: Column,
    k: int = 20,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection (hashed n-gram importance resampling, Xie
    et al.): score every document by how much more likely its tokens are
    under a TARGET distribution (rows matching ``target_pred``) than under
    the raw corpus, then keep the top-``k``. The standard recipe for
    "find me more data that looks like my high-quality subset" at crawl
    scale.

    Features are hashed unigram buckets (md5-hex8 mod ``n_buckets`` — the
    same engine-neutral hash as the classifier operator); both
    distributions are Laplace-smoothed over the bucket space; a doc's
    importance is sum over its tokens of ln(p_target(b)/p_raw(b)).

    Plan shape: one token pass builds (doc, bucket, count); bucket tables
    are tiny (n_buckets rows) aggregates broadcast back; the per-doc
    score folds cnt*log_ratio in BUCKET ORDER over a sorted list, so the
    floating sum is order-pinned and reproducible cross-engine. Nothing
    scales with corpus size except the token pass and one doc-keyed
    aggregation.
    """
    tok = docs.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("tok"),
    ).where(F.col("tok") != "")
    bucketed = tok.select(
        id_col,
        "_is_target",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("b"),
    )
    # global bucket tables (n_buckets rows each — broadcast-sized forever)
    tables = bucketed.groupBy("b").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("c_tgt"),
    )
    totals = tables.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    lr = (
        tables.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log((F.col("c_tgt") + 1) / (F.col("t_tgt") + n_buckets))
                - F.log((F.col("c_raw") + 1) / (F.col("t_raw") + n_buckets))
            ).alias("lr"),
        )
    )
    per_bucket = (
        bucketed.groupBy(id_col, "b")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(lr), "b")
    )
    # order-pinned fold: contributions summed in ascending bucket order
    return (
        per_bucket.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("b"), (F.col("cnt") * F.col("lr")).alias("c")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("_s"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("_s"), 4).alias("importance"),
        )
        .orderBy(F.col("importance").desc(), id_col)
        .limit(k)
    )


def pack_greedy_nextfit(
    df: DataFrame,
    group_col: str,
    key_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Next-fit-DECREASING sequence packing: within each group, documents
    are taken in (tokens desc, id) order and appended to the current bin
    while they fit, else a new bin opens — the greedy packer that
    minimizes padding waste far better than pack_sequences' streaming
    cumulative-window split (which never reorders), at the price of a
    per-group sequential pass.

    The sequential state (current bin, current fill) is inherently
    imperative, so each group packs inside one Arrow-batched
    applyInPandas task — groups are the parallel unit (shards/sources at
    scale), exactly the layout a training-data packer wants. A document
    larger than the budget occupies a bin alone. Deterministic at any
    parallelism (total order within the group); the DuckDB oracle
    replays the identical walk as a recursive CTE.

    Output: (group, key, tokens, bin) with bin 0-based per group."""
    import pandas as pd

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            [tokens_col, key_col], ascending=[False, True]
        ).reset_index(drop=True)
        bins = []
        fill = None
        b = 0
        for t in pdf[tokens_col]:
            t = int(t)
            if fill is None:
                b, fill = 0, t
            elif fill + t <= budget:
                fill += t
            else:
                b, fill = b + 1, t
            bins.append(b)
        return pdf.assign(bin=bins)[
            [group_col, key_col, tokens_col, "bin"]
        ]

    schema = (
        f"{group_col} string, {key_col} long, {tokens_col} long, bin long"
    )
    return df.select(group_col, key_col, tokens_col).groupBy(
        group_col
    ).applyInPandas(pack, schema)


def waterfill_budget(
    supplies: DataFrame,
    budget_col: str = "budget",
    group_col: str = "source",
    supply_col: str = "supply",
) -> DataFrame:
    """Water-filling budget allocation: give every group min(supply, λ)
    tokens where the integer level λ is the largest making the total fit
    the budget — the standard "spend B training tokens across sources
    without letting the big sources starve the small ones" planner
    (small sources are taken whole, large ones are capped at a common
    level).

    ``supplies`` must carry one row per group with an integer supply and
    a (constant) integer budget column. ALL arithmetic is integer —
    prefix sums, floor divisions, clamps — so the result is
    bit-identical on any engine; the remainder B - Σ alloc < m tokens is
    deliberately left unallocated (documented; a rank-order tiebreak for
    the remainder is presentation, not planning). The group table is
    aggregation-derived and group-count-sized, so the global sort window
    is a bounded frame (plans/guards.assert_bounded_frame enforces it).

    Output: (group, supply, allocation).
    """
    from betfair_database_spark.plans.guards import assert_bounded_frame

    sized = assert_bounded_frame(supplies, "waterfill supply table")
    w = Window.orderBy(F.col(supply_col).asc(), F.col(group_col).asc())
    # bounded-frame global window: one row per GROUP by contract
    # (plan-guarded above)
    ranked = sized.select(
        group_col,
        supply_col,
        budget_col,
        F.row_number().over(w).alias("_j"),
        (
            F.sum(supply_col).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_prefix"),
        F.count("*").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_m"),
        F.lag(supply_col, 1, 0).over(w).alias("_prev"),
    ).withColumn("_prefix", F.coalesce("_prefix", F.lit(0)))
    # candidate level for "groups before j taken whole, the rest capped":
    # lam_j = (B - prefix_{j-1}) div (m - j + 1), feasible when it sits in
    # [s_{j-1}, s_j); the 'everything fits' case is lam >= s_m at j = m+1,
    # folded in via the total check
    cand = ranked.select(
        F.expr(
            f"(({budget_col}) - _prefix) div (_m - _j + 1)"
        ).alias("_lam"),
        "_prev",
        supply_col,
    ).where(
        (F.col("_lam") >= F.col("_prev")) & (F.col("_lam") < F.col(supply_col))
    )
    level = cand.agg(F.max("_lam").alias("_level"))
    total = sized.agg(F.sum(supply_col).alias("_total"))
    return (
        sized.join(F.broadcast(level))
        .join(F.broadcast(total))
        .select(
            group_col,
            F.col(supply_col).alias("supply"),
            F.when(
                F.col("_total") <= F.col(budget_col), F.col(supply_col)
            )
            .otherwise(
                F.least(F.col(supply_col), F.coalesce("_level", F.lit(0)))
            )
            .cast("long")
            .alias("allocation"),
        )
    )
