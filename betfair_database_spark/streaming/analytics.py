"""Streaming event analytics: the stateful twin of the batch funnel query.

``funnel_stages`` tracks each user's progress through an ordered event
funnel (e.g. view -> click -> purchase) over a Structured Streaming event
source, emitting an update row whenever a user advances a stage. State is
one tiny row per user in the streaming state store — at scale this is the
standard keyed-state layout (hash-partitioned by user, no global state).

Semantics vs the batch query (suite_ext3.ev_funnel_conversion): stage s+1
is reached by the FIRST event of type stages[s+1] with ts STRICTLY after
the ts that fulfilled stage s. Within a micro-batch events are processed in
ts order, so intra-batch disorder is repaired exactly; an event arriving in
a LATER batch than one it precedes cannot rewrite fulfilled history (the
stage machine is monotone) — the same contract a watermark gives windowed
aggregates. On a bounded, fully-delivered source the final per-user stages
equal the batch query's.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


DEFAULT_STAGES = ("view", "click", "purchase")


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...] = DEFAULT_STAGES,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel progress over a streaming event frame.

    Output (update mode): ``(user_id, stage, stage_ts)`` — the highest
    1-based stage reached so far and the event time that fulfilled it; a
    row is emitted only for users whose stage advanced in the micro-batch.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    stage_of = {name: i + 1 for i, name in enumerate(stages)}

    ev = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("timestamp_ntz").alias("ts"),
    ).where(F.col(type_col).isin(list(stages)))

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("stage", LongType()),
            StructField("stage_ts", TimestampNTZType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("stage", LongType()),
            # epoch micros of the fulfilling event (state rows must be flat)
            StructField("stage_ts_us", LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        (user_id,) = key
        if state.exists:
            stage, ts_us = state.get
        else:
            stage, ts_us = 0, -1
        rows = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                rows.append((r.ts, r.event_type))
        advanced = False
        for ts, etype in sorted(rows, key=lambda r: r[0]):
            if stage >= len(stages):
                break
            cur_us = int(pd.Timestamp(ts).value // 1000)
            if stage_of.get(etype) == stage + 1 and cur_us > ts_us:
                stage += 1
                ts_us = cur_us
                advanced = True
        state.update((stage, ts_us))
        if advanced:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "stage": stage,
                        "stage_ts": pd.Timestamp(ts_us * 1000),
                    }
                ]
            )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cohort_activity(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of the batch cohort-retention query: per-user keyed
    state tracks the first-seen date (the cohort) and the set of week
    offsets already credited; each micro-batch emits one row per NEWLY
    seen (user, week) so a downstream aggregate can maintain live
    (cohort_day, wk) -> distinct-user counts without reprocessing history.

    Monotonicity contract (same as funnel_stages): the cohort is fixed by
    the earliest event seen SO FAR — an event arriving in a later batch
    with an earlier timestamp cannot re-base the cohort (its week is
    credited as offset 0). On a bounded in-order source the emitted set
    equals the batch query's (user, cohort, wk) triples.

    Output (update mode): (user_id, cohort_day, wk).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ev = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp_ntz").alias("ts"),
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("cohort_day", StringType()),
            StructField("wk", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("cohort_day", StringType()),  # ISO date
            StructField("weeks_csv", StringType()),  # credited offsets
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        from datetime import date

        (user_id,) = key
        if state.exists:
            cohort_day, weeks_csv = state.get
            cohort = date.fromisoformat(cohort_day)
            seen = {int(x) for x in weeks_csv.split(",") if x}
        else:
            cohort, seen = None, set()
        days = sorted(
            pd.Timestamp(r.ts).date() for pdf in pdfs for r in pdf.itertuples(index=False)
        )
        fresh = []
        for d in days:
            if cohort is None:
                cohort = d
            wk = max((d - cohort).days, 0) // 7
            if wk not in seen:
                seen.add(wk)
                fresh.append(wk)
        if cohort is not None:
            state.update(
                (cohort.isoformat(), ",".join(str(w) for w in sorted(seen)))
            )
        if fresh:
            yield pd.DataFrame(
                [
                    {"user_id": user_id, "cohort_day": cohort.isoformat(), "wk": w}
                    for w in fresh
                ]
            )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def type_mix_vs_baseline(
    events: DataFrame,
    baseline: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming half of the drift monitor (batch twin:
    suite_ext5.ev_type_drift_kl): running per-day counts of each event
    type, enriched with the STATIC baseline share of that type — the
    day×type result is tiny, so the KL/PSI arithmetic runs on the sink
    side while the corpus-sized counting and the baseline join run in the
    stream.

    Shape: stream-static broadcast join BEFORE the aggregation (a
    stream-static join is stateless; joining after the agg would put a
    join downstream of an update-mode aggregate, which Structured
    Streaming rejects), then one watermarked day-window count. State is
    one row per (day, type); the 1-day watermark evicts closed days.

    ``baseline`` must have (type_col, share) — e.g. last month's mix.
    Output (update mode): (day, event_type, n, baseline_share).
    """
    from pyspark.sql import functions as F

    enriched = events.withWatermark(ts_col, "1 day").join(
        F.broadcast(baseline), type_col
    )
    return (
        enriched.groupBy(
            F.window(F.col(ts_col), "1 day").alias("_w"),
            F.col(type_col),
            F.col("share"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("_w.start").cast("date").cast("string").alias("day"),
            type_col,
            "n",
            F.col("share").alias("baseline_share"),
        )
    )


def streaming_heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    counters: int = 8,
    n_buckets: int = 16,
) -> DataFrame:
    """CONTINUOUS heavy-hitter candidates over an unbounded item stream:
    a Misra-Gries summary per hash bucket, held in the streaming state
    store (``applyInPandasWithState``), re-emitted on every trigger.

    Distribution: a global MG sketch would funnel every row through one
    task, so items are hash-bucketed (pmod(xxhash64, n_buckets)) and each
    bucket folds its own bounded sketch — state is at most ``counters``
    (item, weight) pairs per bucket, the keyed-state layout streaming
    shuffles are built for. The per-bucket MG guarantee carries over:
    any item with in-bucket frequency > n_bucket/(counters+1) survives in
    that bucket's summary, so the UNION of summaries is a candidate
    superset of every global phi-heavy hitter for
    phi >= 1/(counters+1) (an item's rows all land in ONE bucket, and
    n_bucket <= N). Downstream, the batch pass-2
    (sketches.heavy_hitters_exact's shape) verifies with exact counts —
    summary weights themselves are order-dependent lower bounds, never
    final answers.

    Output per trigger (update mode): (bucket, item, weight).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    keyed = items.select(
        F.col(item_col).cast("string").alias("item"),
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    ).where(F.col("item").isNotNull())

    out_schema = StructType(
        [
            StructField("bucket", IntegerType()),
            StructField("item", StringType()),
            StructField("weight", LongType()),
        ]
    )
    # State is ONE flat JSON string: arbitrary item bytes round-trip safely
    # (a separator-joined encoding corrupts the sketch when an item contains
    # the separator byte — ADVICE round 5).
    state_schema = StructType([StructField("sketch", StringType())])

    def update(key, pdfs, state: "GroupState"):
        import json as _json

        (bucket,) = key
        if state.exists:
            (sketch_s,) = state.get
            sketch = {k: int(v) for k, v in _json.loads(sketch_s).items()}
        else:
            sketch = {}
        for pdf in pdfs:
            # fold per-DISTINCT-item (value_counts), then the classic MG
            # decrement whenever the sketch outgrows its counter budget
            for item, cnt in pdf["item"].value_counts().items():
                sketch[item] = sketch.get(item, 0) + int(cnt)
                if len(sketch) > counters:
                    dec = min(sketch.values())
                    sketch = {
                        k: v - dec for k, v in sketch.items() if v - dec > 0
                    }
        state.update((_json.dumps(sketch),))
        yield pd.DataFrame(
            {
                "bucket": [int(bucket)] * len(sketch),
                "item": list(sketch),
                "weight": [int(v) for v in sketch.values()],
            }
        )

    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming twin of the batch gap-sessionization query
    (suite.ev_sessionize): built-in ``session_window`` keyed by user —
    Spark merges events whose [ts, ts+gap) windows overlap, holds one
    state row per OPEN session (not per event), and the watermark both
    bounds state and finalizes sessions for append output.

    Boundary semantics: a batch gap of EXACTLY ``gap`` seconds continues
    the batch query's session (its rule is ``gap_s > 1800``) but starts a
    new streaming session (window overlap is half-open) — the one
    documented divergence; every other gap agrees, which the replay
    parity test pins.

    At scale: state is hash-partitioned by user like every keyed
    operator; session count per user is bounded by activity inside the
    watermark horizon, so state never grows with history.
    """
    from pyspark.sql import functions as F

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup_events(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once ingest dedup: drop re-deliveries of the same event id
    arriving within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state holds one row per id seen,
    EVICTED once the watermark passes, unlike plain dropDuplicates whose
    state grows forever on a stream).

    This is the standard at-least-once -> exactly-once bridge for file
    and queue sources: upstream retries/replays within the horizon are
    absorbed; a duplicate older than the watermark is by definition
    outside the source's redelivery window. State size ~ ids per horizon,
    hash-partitioned — scales with throughput, not with history.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols or ["event_id"]
    )


def streaming_minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    shingle_k: int = 5,
    max_reps_per_bucket: int = 64,
) -> DataFrame:
    """CONTINUOUS near-duplicate detection on an unbounded document
    stream — the ingest-time companion of the batch MinHash-LSH pipeline
    (operators/dedup.py), sharing its EXACT hash family: md5-derived
    32-bit shingle hashes, the (a*x+b) mod p lanes of MINHASH_AB, and
    the banded md5 bucket keys, so a document gets the same signature
    whether it arrives in a batch rebuild or on the stream.

    Stage 1 is STATELESS per-row projection (no streaming aggregate —
    signatures fold inside higher-order functions over the shingle
    array), which keeps the query a single stateful operator. Stage 2
    keys by (band, bucket) and holds up to ``max_reps_per_bucket``
    representative signatures per bucket in the state store (bounded:
    reps × num_hashes bigints per bucket). An arrival whose signature
    agrees with a representative on >= threshold of lanes is emitted as
    a duplicate of that rep (est_sim = agreeing-lane fraction, the
    unbiased MinHash Jaccard estimate at 1/num_hashes granularity —
    batch verification stays exact-Jaccard; this is the stream-side
    screen); otherwise it becomes a representative itself. Each document
    reports once per band — identical texts collide in EVERY band with
    est_sim 1.0; the consumer treats "dup in any band" as the drop rule,
    exactly like the batch band-join.

    Output per arrival (append semantics): (band, doc_id, dup_of,
    est_sim) with dup_of NULL for new representatives.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from betfair_database_spark.operators.dedup import MINHASH_AB, MINHASH_P

    rows_per_band = num_hashes // bands
    lowered = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lower(F.col(text_col)).alias("_lt"),
    )
    harr = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length(_lt) - {shingle_k - 1},"
            " 0)), i -> CAST(conv(substr(md5(substring(_lt, i,"
            f" {shingle_k})), 1, 8), 16, 10) AS BIGINT))"
        )
    )
    sigs = lowered.select("doc_id", harr.alias("hs")).where(
        F.size("hs") > 0
    )
    def _lane(a, b):
        # closure factory: a default-arg lambda would read as a 3-arg
        # higher-order-function lambda to PySpark's arity inspection
        return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)

    lanes = [
        F.array_min(F.transform(F.col("hs"), _lane(a, b))).alias(f"h{s}")
        for s, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    ]
    sigs = sigs.select("doc_id", *lanes)
    banded = sigs.select(
        "doc_id",
        F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(
                                        f"h{band * rows_per_band + r}"
                                    ).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bh")

    out_schema = StructType(
        [
            StructField("band", IntegerType()),
            StructField("doc_id", LongType()),
            StructField("dup_of", LongType()),
            StructField("est_sim", DoubleType()),
        ]
    )
    from pyspark.sql.types import StringType

    state_schema = StructType([StructField("reps", StringType())])
    need = int(-(-threshold * num_hashes // 1))  # ceil(threshold * K)

    def update(key, pdfs, state: "GroupState"):
        import json as _json

        import pandas as pd

        band, _bh = key
        reps = _json.loads(state.get[0]) if state.exists else []
        out = {"band": [], "doc_id": [], "dup_of": [], "est_sim": []}
        for pdf in pdfs:
            # deterministic within-batch order
            pdf = pdf.sort_values("doc_id")
            for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
                sig = [int(v) for v in sig]
                dup_of, est = None, None
                for rep_id, rep_sig in reps:
                    agree = sum(
                        1 for a, b in zip(sig, rep_sig) if a == b
                    )
                    if agree >= need:
                        dup_of, est = rep_id, agree / len(sig)
                        break
                if dup_of is None and len(reps) < max_reps_per_bucket:
                    reps.append([int(doc_id), sig])
                out["band"].append(int(band))
                out["doc_id"].append(int(doc_id))
                out["dup_of"].append(dup_of)
                out["est_sim"].append(est)
        state.update((_json.dumps(reps),))
        yield pd.DataFrame(out)

    return banded.groupBy("band", "bh").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_kmv_distinct(
    items: DataFrame,
    key_col: str = "item",
    k: int = 64,
    n_buckets: int = 16,
) -> DataFrame:
    """CONTINUOUS distinct-count estimation over an unbounded key stream
    — the streaming twin of sketches.kmv_distinct, with the SAME
    md5-derived k-minimum-values sketch so per-bucket results are
    bit-reproducible against the batch operator on identical data.

    Keys hash-partition across ``n_buckets`` state buckets (the
    heavy-hitters layout); each bucket keeps the k SMALLEST uniform hash
    values of ITS keys in keyed state (bounded: k doubles per bucket)
    and re-emits its estimate every trigger. Because the buckets
    partition the key space, the GLOBAL distinct count is the SUM of
    bucket estimates — no sketch-merge step, and per-bucket error bounds
    carry through. Output per trigger (update mode):
    (bucket, kmv_estimate, n_kept).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    keyed = items.select(
        F.col(key_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
        # the SAME uniform hash the batch sketch's md5 form uses
        (
            F.conv(
                F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
                16,
                10,
            ).cast("double")
            / F.lit(4294967296.0)
        ).alias("u"),
    ).where(F.col("key").isNotNull())

    out_schema = StructType(
        [
            StructField("bucket", IntegerType()),
            StructField("kmv_estimate", LongType()),
            StructField("n_kept", LongType()),
        ]
    )
    state_schema = StructType([StructField("mins", StringType())])

    def update(key, pdfs, state: "GroupState"):
        import json as _json

        import pandas as pd

        (bucket,) = key
        mins = _json.loads(state.get[0]) if state.exists else []
        seen = set(mins)
        for pdf in pdfs:
            for u in pdf["u"]:
                u = float(u)
                if u not in seen:
                    seen.add(u)
                    mins.append(u)
        mins = sorted(set(mins))[:k]
        state.update((_json.dumps(mins),))
        if len(mins) < k:
            est = len(mins)
        else:
            import math

            # HALF_UP like Spark's round() — the batch operator's exact
            # estimate formula, so per-bucket parity is bit-exact
            est = int(math.floor((k - 1) / mins[-1] + 0.5))
        yield pd.DataFrame(
            {
                "bucket": [int(bucket)],
                "kmv_estimate": [est],
                "n_kept": [len(mins)],
            }
        )

    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ohlc(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of the batch OHLC rollup
    (operators/timeseries.resample_ohlc, suite row ts_resample_ohlc):
    watermarked tumbling windows with open/close as min/max over
    struct(ts, tiebreak, value) — the same deterministic-tie-break trick,
    so the streaming aggregate is a plain keyed agg with ONE state row
    per open (window, key) and no per-key sorted buffers. The watermark
    finalizes windows for append output and evicts their state; at scale
    state is bounded by keys x windows inside the horizon, independent
    of history."""
    from pyspark.sql import functions as F

    first = F.min(F.struct(ts_col, tiebreak_col, value_col))[value_col]
    last = F.max(F.struct(ts_col, tiebreak_col, value_col))[value_col]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("_w"), F.col(key_col))
        .agg(
            first.alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            last.alias("close"),
            F.count("*").alias("n"),
            F.sum(value_col).alias("volume"),
        )
        .select(
            F.col("_w.start").alias("bucket_start"),
            key_col,
            "open",
            "high",
            "low",
            "close",
            "n",
            "volume",
        )
    )


def streaming_interval_coverage(
    events: DataFrame,
    duration: str = "cast(round(value * 60) as bigint)",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming twin of the batch interval union
    (operators/rangejoin.py::merge_intervals): each event opens a
    [ts, ts + duration-seconds) interval and overlapping intervals merge
    into islands. The built-in ``session_window`` with a DYNAMIC
    per-event gap implements exactly that merge — an event's window is
    its interval, Spark coalesces overlapping windows per key, holds one
    state row per OPEN island (never per event), and the watermark
    finalizes islands for append output.

    Boundary semantics: session windows are half-open, so an interval
    STARTING exactly at another's end opens a new island, where the
    batch rule (start > prev_end opens) merges the touch — the same
    single documented divergence streaming_sessionize has; everything
    else is equal, which the replay parity test pins row-for-row on the
    fixture data (no exact-touch pairs exist at microsecond timestamps).

    At scale: state is hash-partitioned by key; islands per key inside
    the watermark horizon bound the state, independent of history."""
    from pyspark.sql import functions as F

    gap = F.expr(f"make_interval(0, 0, 0, 0, 0, 0, {duration})")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_intervals"))
        .select(
            key_col,
            F.col("session_window.start").alias("island_start"),
            F.col("session_window.end").alias("island_end"),
            "n_intervals",
        )
    )


def streaming_scd2_enrich(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Stream-static SCD2 enrichment: each streamed event picks the
    dimension row valid AT ITS OWN EVENT TIME — equi-join on the key plus
    the half-open validity predicate ``valid_from <= ts < valid_to``.
    The canonical "enrich facts against a slowly-changing dimension"
    shape: stateless (no watermark needed — the static side is not a
    stream), so it composes under any downstream stateful operator.

    At scale: the static side joins per micro-batch with the usual
    batch planning (broadcast when small); note Spark caches file
    LISTINGS for static sides — a dimension UPDATED in place needs the
    rewritten-path/refreshed-view pattern, while an SCD2 dim is
    append-only by construction, which is exactly why SCD2 is the
    streaming-friendly dimension shape.
    """
    from pyspark.sql import functions as F

    cond = (
        (events[key] == dim[key])
        & (events[ts_col] >= dim[valid_from])
        & (events[ts_col] < dim[valid_to])
    )
    return events.join(dim, cond, "inner").drop(dim[key])
