"""Streaming mcm (market-change message) processing.

Sources: a directory of NDJSON stream files (plaintext/gz/bz2 — the same
shapes the batch engine indexes; zip requires the batch path). Each line is
``{"op":"mcm","clk":…,"pt":<epoch-ms>,"mc":[{"id", "marketDefinition"?,
"rc":[{ltp,id}]?}]}`` (FIXTURES.md §3).

Operators:
  - ``read_mcm_stream``: readStream.text → from_json with the explicit
    schema → exploded (marketId, pt, event_ts, defn, rc).
  - ``latest_definitions``: stateful last-definition per market — the
    streaming twin of the batch extractor (max_by on (pt, version), update
    mode). At scale this is a keyed state store of one row per market.
  - ``ltp_windowed``: tumbling-window OHLC-style aggregate of last-traded
    prices per (market, runner) with a watermark for late data.

All stages are built-in Structured Streaming operators — no
applyInPandasWithState needed because "latest per key" and windowed aggs are
expressible with max_by/window, which keeps state in the JVM state store.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from betfair_database_spark.schema import MCM_SCHEMA


def read_mcm_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of parsed mcm messages, one row per market change.

    ``max_files_per_trigger`` bounds each micro-batch (availableNow honors
    it too) — multi-batch drains are what let watermarks advance BETWEEN
    batches, which the event-time-timeout tests rely on."""
    reader = (
        spark.readStream.format("text")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(source_dir)
    parsed = lines.select(F.from_json("value", MCM_SCHEMA).alias("msg")).where(
        F.col("msg")["op"] == "mcm"
    )
    mc = parsed.select(
        F.col("msg")["pt"].alias("pt"),
        F.col("msg")["clk"].alias("clk"),
        F.timestamp_millis(F.col("msg")["pt"]).alias("event_ts"),
        F.explode(F.col("msg")["mc"]).alias("chg"),
    )
    return mc.select(
        F.col("chg")["id"].alias("marketId"),
        "pt",
        "clk",
        "event_ts",
        F.col("chg")["marketDefinition"].alias("defn"),
        F.col("chg")["rc"].alias("rc"),
    )


def latest_definitions(changes: DataFrame) -> DataFrame:
    """Latest definition per market (streaming state: one row per market).

    Use with ``outputMode("update")`` (or "complete" for small keyspaces).
    Mirrors the batch extractor's ordering: (pt, definition version).
    """
    with_defn = changes.where(F.col("defn").isNotNull())
    return with_defn.groupBy("marketId").agg(
        F.max_by(
            F.col("defn"), F.struct(F.col("pt"), F.col("defn")["version"])
        ).alias("defn"),
        F.max("pt").alias("last_defn_pt"),
    )


def ltp_windowed(
    changes: DataFrame, window: str = "1 minute", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window last-traded-price aggregates per (market, runner).

    Watermark bounds state for late data; append output mode emits finalized
    windows only. Columns: window_start, marketId, runnerId, n_ticks,
    last_ltp, min_ltp, max_ltp.
    """
    ticks = (
        changes.withWatermark("event_ts", watermark)
        .where(F.col("rc").isNotNull())
        .select("marketId", "event_ts", "pt", F.explode("rc").alias("tick"))
        .select(
            "marketId",
            "event_ts",
            "pt",
            F.col("tick")["id"].alias("runnerId"),
            F.col("tick")["ltp"].alias("ltp"),
        )
    )
    return (
        ticks.groupBy(
            F.window("event_ts", window).alias("w"), "marketId", "runnerId"
        )
        .agg(
            F.count("*").alias("n_ticks"),
            F.max_by("ltp", "pt").alias("last_ltp"),
            F.min("ltp").alias("min_ltp"),
            F.max("ltp").alias("max_ltp"),
        )
        .select(
            F.col("w")["start"].alias("window_start"),
            "marketId",
            "runnerId",
            "n_ticks",
            "last_ltp",
            "min_ltp",
            "max_ltp",
        )
    )


def tick_sessions(
    changes: DataFrame, gap: str = "1 minute", watermark: str = "10 minutes"
) -> DataFrame:
    """Activity sessions per market via the NATIVE session_window aggregate:
    a session is a burst of changes separated by quiet gaps >= ``gap``.

    Unlike the fixed buckets of :func:`ltp_windowed`, session windows have
    data-driven extents; Spark's streaming state merges adjacent windows as
    ticks arrive and the watermark finalizes sessions once no in-gap late
    data can appear. Columns: session_start, session_end, marketId,
    n_changes. (The batch twin — gap sessionization with a lag/cumsum
    window — is the suite's ``ev_sessionize``.)
    """
    return (
        changes.withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap).alias("w"), "marketId")
        .agg(F.count("*").alias("n_changes"))
        .select(
            F.col("w")["start"].alias("session_start"),
            F.col("w")["end"].alias("session_end"),
            "marketId",
            "n_changes",
        )
    )


def dedup_stream(
    changes: DataFrame,
    keys: list[str] | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication: emit each (marketId, pt) change once,
    dropping replays/re-deliveries — the streaming twin of the batch
    ``exact_dedup`` and the standard front stage of an ingest pipeline
    (at-least-once sources re-deliver; downstream state must see each change
    once).

    ``dropDuplicatesWithinWatermark`` keys the dedup state by ``keys`` and
    EXPIRES entries older than the watermark — without it the key set (and
    the state store) grows without bound on an infinite stream, which is the
    scale failure mode of a naive dropDuplicates.

    The default key includes ``clk`` (Betfair's per-message sequence token):
    two DISTINCT messages can share a millisecond ``pt`` during a burst, and
    (marketId, pt) alone would silently drop the second.
    """
    keys = keys or ["marketId", "pt", "clk"]
    return changes.withWatermark("event_ts", watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )


def market_tick_state(changes: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-market
    arbitrary state that built-in aggregates can't express as one pass —
    cumulative tick count, the pt-latest (runner, ltp), and the max single-
    tick price jump between consecutive ticks of the same runner.

    State lives in the streaming state store keyed by marketId; each micro-
    batch emits the market's updated snapshot (update output mode).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ticks = (
        changes.where(F.col("rc").isNotNull())
        .select("marketId", "pt", F.explode("rc").alias("tick"))
        .select(
            "marketId",
            "pt",
            F.col("tick")["id"].alias("runnerId"),
            F.col("tick")["ltp"].alias("ltp"),
        )
        # a malformed tick (null runner id or price) must not poison the
        # state (int(nan) would kill the query; NaN prices corrupt jumps)
        .where(F.col("runnerId").isNotNull() & F.col("ltp").isNotNull())
    )

    out_schema = StructType(
        [
            StructField("marketId", StringType()),
            StructField("n_ticks", LongType()),
            StructField("last_pt", LongType()),
            StructField("last_runner", LongType()),
            StructField("last_ltp", DoubleType()),
            StructField("max_jump", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_ticks", LongType()),
            StructField("last_pt", LongType()),
            StructField("last_runner", LongType()),
            StructField("last_ltp", DoubleType()),
            StructField("max_jump", DoubleType()),
            # trailing per-runner last prices as parallel arrays
            StructField("runner_ids", StringType()),  # csv (state must be flat-ish)
            StructField("runner_ltps", StringType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        (market_id,) = key
        if state.exists:
            n, last_pt, last_runner, last_ltp, max_jump, rid_csv, ltp_csv = state.get
            per_runner = dict(
                zip(
                    (int(x) for x in rid_csv.split(",") if x),
                    (float(x) for x in ltp_csv.split(",") if x),
                )
            )
        else:
            n, last_pt, last_runner, last_ltp, max_jump = 0, -1, -1, None, 0.0
            per_runner = {}
        rows = []
        for pdf in pdfs:
            rows.extend(
                pdf[["pt", "runnerId", "ltp"]].itertuples(index=False)
            )
        for pt, runner, ltp in sorted(rows):
            n += 1
            prev = per_runner.get(int(runner))
            if prev is not None:
                max_jump = max(max_jump, abs(float(ltp) - prev))
            per_runner[int(runner)] = float(ltp)
            if pt >= last_pt:
                last_pt, last_runner, last_ltp = int(pt), int(runner), float(ltp)
        state.update(
            (
                n,
                last_pt,
                last_runner,
                last_ltp,
                max_jump,
                ",".join(str(k) for k in per_runner),
                ",".join(str(v) for v in per_runner.values()),
            )
        )
        yield pd.DataFrame(
            [
                {
                    "marketId": market_id,
                    "n_ticks": n,
                    "last_pt": last_pt,
                    "last_runner": last_runner,
                    "last_ltp": last_ltp,
                    "max_jump": max_jump,
                }
            ]
        )

    return ticks.groupBy("marketId").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def market_inactivity_sessions(
    changes: DataFrame,
    gap_ms: int = 120_000,
    watermark: str = "1 minute",
) -> DataFrame:
    """Inactivity-closed market sessions via EVENT-TIME TIMEOUT — the state
    dimension market_tick_state doesn't use: a market's session stays open
    in the state store while ticks keep arriving; when the WATERMARK passes
    last_tick + gap_ms the group times out, the finalized session row
    (start/end pt, tick count) is emitted, and the state is REMOVED. That
    removal is the point at 100 TB: without a timeout, one state row per
    ever-seen market accumulates forever; with it, state size tracks only
    markets active inside the gap horizon. Append output mode — only
    finalized sessions are emitted, like a batch gaps-and-islands.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ticks = (
        changes.withWatermark("event_ts", watermark)
        .where(F.col("rc").isNotNull())
        .select("marketId", "pt", "event_ts")
    )
    out_schema = StructType(
        [
            StructField("marketId", StringType()),
            StructField("start_pt", LongType()),
            StructField("end_pt", LongType()),
            StructField("n_ticks", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_pt", LongType()),
            StructField("end_pt", LongType()),
            StructField("n_ticks", LongType()),
        ]
    )

    def update(key, pdfs, state: "GroupState"):
        (market_id,) = key
        if state.hasTimedOut:
            start_pt, end_pt, n = state.get
            state.remove()
            yield pd.DataFrame(
                [{"marketId": market_id, "start_pt": start_pt,
                  "end_pt": end_pt, "n_ticks": n}]
            )
            return
        start_pt, end_pt, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            lo, hi = int(pdf["pt"].min()), int(pdf["pt"].max())
            start_pt = lo if start_pt is None else min(start_pt, lo)
            end_pt = hi if end_pt is None else max(end_pt, hi)
            n += len(pdf)
        state.update((start_pt, end_pt, n))
        # close the session when the event-time watermark passes this.
        # Clamp to just past the CURRENT watermark: if this group's data
        # arrived after other partitions already advanced the watermark
        # beyond end_pt + gap (out-of-order files, a straggling backfill),
        # an unclamped timestamp throws INVALID_TIMEOUT_TIMESTAMP and kills
        # the query — the session should instead close at the next
        # opportunity.
        state.setTimeoutTimestamp(
            max(end_pt + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield from ()  # open sessions emit nothing (append mode)

    return ticks.groupBy("marketId").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def join_ticks_to_definitions(
    changes: DataFrame,
    tolerance: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """STREAM-STREAM interval join: every price tick inner-joins the
    definition changes of the same market that occurred AT OR BEFORE the
    tick, no older than ``tolerance`` — "which ruleset was live when this
    price traded", computed online.

    Both sides derive from the one mcm stream (Spark plans them as two
    independent stateful inputs). The join condition is the canonical
    watermarked-interval form — equi key (marketId) PLUS a bounded
    event-time range — which is exactly what lets Spark garbage-collect
    join state: each side buffers only ``watermark + tolerance`` of rows
    per market instead of the whole stream. An unbounded-condition
    stream-stream join would be rejected (inner) or accumulate state
    forever (outer); the time bound is not an optimization, it is the
    thing that makes the operator runnable at all on an infinite stream.

    Emits one row per (tick, qualifying definition); downstream can keep
    the max defn_ts per tick for an exact streaming as-of. Columns:
    marketId, event_ts, runnerId, ltp, defn_ts, defn_status, defn_version.
    """
    ticks = (
        changes.where(F.col("rc").isNotNull())
        .select(
            "marketId",
            "event_ts",
            F.explode("rc").alias("tick"),
        )
        .select(
            "marketId",
            "event_ts",
            F.col("tick")["id"].alias("runnerId"),
            F.col("tick")["ltp"].alias("ltp"),
        )
        .withWatermark("event_ts", watermark)
    )
    defs = (
        changes.where(F.col("defn").isNotNull())
        .select(
            F.col("marketId").alias("d_marketId"),
            F.col("event_ts").alias("defn_ts"),
            F.col("defn")["status"].alias("defn_status"),
            F.col("defn")["version"].alias("defn_version"),
        )
        .withWatermark("defn_ts", watermark)
    )
    cond = (
        (F.col("marketId") == F.col("d_marketId"))
        & (F.col("defn_ts") <= F.col("event_ts"))
        & (F.col("defn_ts") >= F.expr(f"event_ts - INTERVAL {tolerance}"))
    )
    return ticks.join(defs, cond, "inner").select(
        "marketId",
        "event_ts",
        "runnerId",
        "ltp",
        "defn_ts",
        "defn_status",
        "defn_version",
    )


def enrich_with_index(
    changes: DataFrame,
    static_index: DataFrame,
    key: str = "marketId",
) -> DataFrame:
    """Stream-static join: every micro-batch left-joins the tick stream
    against a static (batch) frame — the canonical "enrich the stream with
    the catalogue/index" stage.

    The static side is broadcast-hinted: the index projection used for
    enrichment is a per-market row (bounded by live-market count, not data
    volume), and a broadcast keeps the stream side shuffle-free — state-free
    too, so nothing accumulates between batches. Spark re-evaluates the
    static plan per micro-batch, picking up index rewrites between batches.
    """
    from pyspark.sql import functions as _F

    return changes.join(_F.broadcast(static_index), key, "left")


def run_to_memory(
    stream: DataFrame, table_name: str, output_mode: str = "update"
) -> None:
    """Drain all currently-available input into an in-memory table
    (availableNow trigger) and stop — the batch-like test/debug harness.

    NOTE: the memory sink refuses checkpoint recovery, so this cannot resume
    stateful queries across runs; production deployments of the stateful
    operators use foreachBatch / kafka / delta sinks with a checkpoint
    location (state continuation verified with foreachBatch)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
