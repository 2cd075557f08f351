"""Per-key ordered time-series folds that SQL windows cannot express.

EWMA (s_i = alpha*x_i + (1-alpha)*s_{i-1}, s_0 = x_0) is the canonical
example: the recurrence is a sequential left fold, not a frame aggregate —
no combination of SUM/AVG window frames computes it without numerically
explosive (1-alpha)^(-i) rescaling tricks. The distributed shape is
``applyInPandas``: one hash shuffle on the key, then each key's history is
folded inside an Arrow batch with vectorizable pandas (``ewm``-equivalent
arithmetic spelled out so any engine reproduces it bit-for-bit — a
sequential IEEE double fold is deterministic given the order, and the order
is pinned by (ts, tiebreak)).

Scale: state per task is one key-group at a time; skewed keys are the
limit (a single key's history must fit an Arrow batch) — for unbounded
per-key histories the streaming twin with applyInPandasWithState keeps
O(1) state instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_last_per_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    tiebreak_col: str,
) -> DataFrame:
    """Final EWMA value per key after folding ``value_col`` in
    (ts_col, tiebreak_col) order. Returns (key_col, n, ewma).

    The fold uses exactly ``alpha * x + (1 - alpha) * s`` with s seeded by
    the first value (pandas ``ewm(adjust=False)`` semantics) — spelled out
    so an oracle engine's ordered list_reduce reproduces every bit.
    """
    import pandas as pd

    a = float(alpha)
    key_field = df.schema[key_col]
    out_schema = (
        f"`{key_col}` {key_field.dataType.simpleString()}, n long, ewma double"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_col, ts_col, tiebreak_col])
        # grouped ewm(adjust=False) is pandas' C path for exactly
        # y_t = (1-a)*y_{t-1} + a*x_t — bit-equality with the explicit
        # Python fold is asserted in tests/test_timeseries.py, so the
        # 50-100x speedup over a per-row loop costs no reproducibility
        ew = (
            pdf.groupby(key_col, sort=False)[value_col]
            .ewm(alpha=a, adjust=False)
            .mean()
            .reset_index(drop=True)
        )
        pdf = pdf.reset_index(drop=True)
        pdf["_ew"] = ew
        last = pdf.groupby(key_col, sort=False).tail(1)
        return pd.DataFrame(
            {
                key_col: last[key_col].values,
                "n": pdf.groupby(key_col, sort=False).size().values,
                "ewma": last["_ew"].values,
            }
        )

    # one pandas group per HASH BUCKET, not per key: applyInPandas pays a
    # per-group Arrow/pandas round-trip, so fold many keys per call and
    # split them with pandas' own groupby (C) inside
    bucketed = df.select(
        key_col, ts_col, value_col, tiebreak_col,
        F.pmod(F.xxhash64(key_col), F.lit(64)).alias("_kb"),
    )
    return (
        bucketed.groupBy("_kb")
        .applyInPandas(
            lambda pdf: fold(pdf.drop(columns=["_kb"])), schema=out_schema
        )
    )


def ewma_last_per_key_scalable(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    tiebreak_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Two-phase EWMA for the one-huge-key regime — the form to reach for
    when a single key's history exceeds an Arrow batch (the documented
    limit of ``ewma_last_per_key``). Same (key, n, ewma) output.

    EWMA is a linear recurrence, so a time bucket composes to
    ``s_out = A * s_in + B`` with ``A = (1-alpha)^n`` and ``B`` the fold
    seeded from 0: phase 1 computes (A, B, seeded-first-fold) per
    (key, bucket) in parallel — each task holds ONE bucket's history, not
    a whole key's — and phase 2 chains the per-bucket affine maps in
    bucket order over the |key| x |buckets|-sized frame (tiny).

    NOT bit-identical to the sequential fold: IEEE multiplication does
    not distribute over addition, so composing ``A*s + B`` reassociates
    the arithmetic (relative error ~1e-12 observed; parity-tested with
    tolerance). That is exactly why ``ewma_last_per_key`` does NOT
    auto-dispatch here the way interpolate_at/ffill do: its result is
    pinned bit-for-bit by the ts_ewma_user_value oracle row, and a silent
    plan change must never change bytes. Callers in the huge-key regime
    opt in explicitly and accept the last-ulp difference.
    """
    import numpy as np
    import pandas as pd

    a = float(alpha)
    key_field = df.schema[key_col]
    kt = key_field.dataType.simpleString()
    # _bkt rides as its ISO string: chronological == lexicographic, and it
    # sidesteps timestamp vs timestamp_ntz schema coupling in Arrow.
    part_schema = (
        f"`{key_col}` {kt}, _bkt string, n long, A double, B double,"
        " y double"
    )

    def partials(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_col, "_bkt", ts_col, tiebreak_col])
        out = []
        for (k, b), g in pdf.groupby([key_col, "_bkt"], sort=False):
            x = g[value_col].to_numpy(dtype=np.float64)
            n = len(x)
            w = (1.0 - a) ** np.arange(n - 1, -1, -1, dtype=np.float64)
            B = float(np.dot(x, a * w))
            # seeded fold: s0 = x0, then the pure-a tail
            y = float(x[0] * w[0] + np.dot(x[1:], a * w[1:])) if n else None
            out.append((k, b, n, float((1.0 - a) ** n), B, y))
        return pd.DataFrame(
            out, columns=[key_col, "_bkt", "n", "A", "B", "y"]
        )

    out_schema = f"`{key_col}` {kt}, n long, ewma double"

    def compose(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_col, "_bkt"])
        rows = []
        for k, g in pdf.groupby(key_col, sort=False):
            s = None
            for _, r in g.iterrows():
                s = r["y"] if s is None else r["A"] * s + r["B"]
            rows.append((k, int(g["n"].sum()), s))
        return pd.DataFrame(rows, columns=[key_col, "n", "ewma"])

    bkt = F.date_trunc(bucket, F.col(ts_col)).cast("string")
    bucketed = df.select(
        key_col, ts_col, value_col, tiebreak_col,
        bkt.alias("_bkt"),
        F.pmod(F.xxhash64(key_col, bkt), F.lit(256)).alias("_kb"),
    )
    parts = bucketed.groupBy("_kb").applyInPandas(
        lambda p: partials(p.drop(columns=["_kb"])), schema=part_schema
    )
    tiny = parts.withColumn(
        "_kb", F.pmod(F.xxhash64(key_col), F.lit(64))
    )
    return tiny.groupBy("_kb").applyInPandas(
        lambda p: compose(p.drop(columns=["_kb"])), schema=out_schema
    )


def resample_ohlc(
    df: DataFrame,
    bucket: "F.Column",
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """OHLC downsampling: per (bucket, keys) the open/high/low/close of
    ``value_col`` plus count and summed volume — the canonical time-series
    rollup (candlesticks, metric downsampling for retention tiers).

    Open/close are NOT windows-over-sorted-partitions: each is a plain
    ``min``/``max`` over a ``struct(ts, tiebreak, value)`` whose
    lexicographic order pins the earliest/latest row deterministically
    (ties broken by ``tiebreak_col``). That keeps the whole rollup ONE
    hash shuffle on the group key with map-side partial aggregation —
    no per-key sort, no window exchange — so at 100 TB it is exactly as
    cheap as a count(*) rollup. A window/row_number formulation would add
    a full sort per key; the struct-min trick is the scale-correct plan.

    Rounding of the four price columns is left to the caller (suite rows
    round to 2 for oracle hash-matching).
    """
    first = F.min(F.struct(ts_col, tiebreak_col, value_col))[value_col]
    last = F.max(F.struct(ts_col, tiebreak_col, value_col))[value_col]
    return df.groupBy(bucket, *key_cols).agg(
        first.alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        last.alias("close"),
        F.count("*").alias("n"),
        F.sum(value_col).alias("volume"),
    )


def path_ngrams(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    step_col: str,
    n: int = 3,
    sep: str = ">",
) -> DataFrame:
    """Sequential path mining: n-grams of ``step_col`` over each key's
    time-ordered event stream, counted corpus-wide — the "common user
    journeys" query (funnel discovery, session path analysis).

    Shape: one hash shuffle on the key + per-key sort for the lead()
    window (state bounded by a single key's history), then a hash
    aggregate on the path string. The window frame is per-user — never a
    global sort — so the plan scales with the largest single user, not
    the table. Returns (path, n) unordered; callers top-k it.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    steps = [F.col(step_col)] + [
        F.lead(step_col, i).over(w) for i in range(1, n)
    ]
    return (
        df.select(key_col, ts_col, tiebreak_col, step_col)
        .withColumns({f"_s{i}": s for i, s in enumerate(steps)})
        .where(F.col(f"_s{n - 1}").isNotNull())
        .select(
            F.concat_ws(sep, *[F.col(f"_s{i}") for i in range(n)]).alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
    )


# Cardinality dispatch for per-key ORDERED operators (round 9): a plain
# per-key window concentrates each key's ENTIRE history into one task —
# fine at market-level key counts, pathological when one key's history
# exceeds what a task sorts comfortably. Below this keys-per-core ratio
# AND above this rows-per-key count, interpolate_at switches to the
# two-phase bucketed form that restores |key| x |buckets| parallelism.
# Crossover MEASURED on the sf10 replica (SCALE.md round 9): at 2M and
# even 5M rows/key the plain window still wins on 32 cores (13-17 s vs
# ~21 s — in-memory sorts are cheap and the two-phase form pays an extra
# exchange + aggregate); at 10M rows in ONE key the bucketed form wins
# ~2x (16.9 s vs 32.7 s). The threshold sits just under the measured win
# and far above the measured loss; at real cluster scale it maps to "a
# single key no longer sorts in one task".
DISPATCH_MAX_KEYS_PER_CORE = 2.0
DISPATCH_MIN_ROWS_PER_KEY = 8_000_000


def _dispatch_thresholds(spark) -> tuple[float, float]:
    """Dispatch thresholds, overridable per cluster: the defaults are
    MEASURED on local[32] with in-memory sorts; a cluster with different
    executor memory/task sizing shifts the crossover, so operators read
    ``spark.bfdb.dispatch.maxKeysPerCore`` and
    ``spark.bfdb.dispatch.minRowsPerKey`` from the session conf first
    (module constants remain the test hook and the default source)."""
    conf = spark.conf
    try:
        max_kpc = float(
            conf.get(
                "spark.bfdb.dispatch.maxKeysPerCore",
                str(DISPATCH_MAX_KEYS_PER_CORE),
            )
        )
        min_rpk = float(
            conf.get(
                "spark.bfdb.dispatch.minRowsPerKey",
                str(DISPATCH_MIN_ROWS_PER_KEY),
            )
        )
    except ValueError:
        return DISPATCH_MAX_KEYS_PER_CORE, float(DISPATCH_MIN_ROWS_PER_KEY)
    return max_kpc, min_rpk
# Bucket-granularity pick: finer buckets balance better (hour beat day
# 16.9 vs 24.9 s on the 1-key run) — target ~10k rows per (key, bucket)
# but keep the carried-seeds frame broadcastable.
_TARGET_ROWS_PER_BUCKET = 10_000
_SEED_FRAME_CAP = 2_000_000


# Dispatch-stats memo (round 10, verdict #5): the auto dispatch costs one
# stats aggregate per call, which roughly doubled sub-second interactive
# calls (ts_interpolate_linear 0.78 -> 1.2-1.4 s at sf0.1). The probe is a
# pure function of the (key, ts) projection's LOGICAL PLAN, so repeated
# interpolate/ffill calls on the same frame within a session pay it once:
# keyed on (applicationId, analyzed-plan semanticHash, key, ts_col), LRU-
# bounded. Staleness window: a parquet path rewritten mid-session under an
# identical plan could serve old stats — harmless, the stats only pick a
# physical strategy, never affect results.
from collections import OrderedDict as _OrderedDict

_STATS_MEMO: "_OrderedDict[tuple, tuple[int, int, float]]" = _OrderedDict()
_STATS_MEMO_MAX = 64


def _stats_memo_key(proj: DataFrame, key: str, ts_col: str):
    try:
        h = int(proj._jdf.queryExecution().analyzed().semanticHash())
        app = proj.sparkSession.sparkContext.applicationId
    except Exception:  # Connect / API drift: skip memoization, stay correct
        return None
    return (app, h, key, ts_col)


def _stats_cache_dir(spark):
    """Cross-session dispatch-stats cache directory (round 11, verdict
    #8): conf ``spark.bfdb.dispatch.statsDir``; empty string disables;
    default ``~/.cache/bfdb/dispatch_stats``. The in-session memo closed
    the warm case; this closes the COLD one (fresh bench/job sessions
    paid the probe every time). Sidecars live here, NOT beside the data
    — source directories are routinely read-only (shared test fixtures,
    lake buckets)."""
    import os as _os

    default = _os.path.join(
        _os.path.expanduser("~"), ".cache", "bfdb", "dispatch_stats"
    )
    try:
        d = spark.conf.get("spark.bfdb.dispatch.statsDir", default)
    except Exception:
        d = default
    return d or None


def _stats_persist_key(proj: DataFrame, key: str, ts_col: str):
    """Cold-session-stable cache key: md5 over the full output schema,
    the CANONICALIZED plan's semanticHash (a structural hash —
    expression ids normalized, stable for the same query text across
    sessions, and unlike ``toString()`` never truncated at
    ``spark.sql.debug.maxToStringFields``, which silently collided two
    wide-but-different plans onto one sidecar entry — round-12 ADVICE),
    the backing file names (parquet part names are content-addressed-ish
    UUIDs, so a rewrite changes the key), and (key, ts_col). In-memory
    frames have no files and are never persisted. Same staleness
    contract as the memo: stats pick a physical strategy, never affect
    results, so a collision from a semanticHash clash is a perf wobble,
    not a wrong answer."""
    try:
        sem = int(proj._jdf.queryExecution().analyzed().semanticHash())
        schema_json = proj.schema.json()
        files = sorted(proj.inputFiles())
    except Exception:  # Connect / API drift: skip persistence
        return None
    if not files:
        return None
    import hashlib as _hashlib

    h = _hashlib.md5(f"{sem}|{schema_json}".encode())
    for f in files:
        h.update(f.encode())
    h.update(f"|{key}|{ts_col}".encode())
    return h.hexdigest()


def _stats_sidecar_read(cache_dir: str, pk: str):
    import json as _json
    import os as _os

    try:
        with open(_os.path.join(cache_dir, pk + ".json")) as fh:
            d = _json.load(fh)
        return int(d["n"]), int(d["k"]), float(d["span"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _stats_sidecar_write(
    cache_dir: str, pk: str, out, max_entries: int = 512
) -> None:
    import json as _json
    import os as _os
    import tempfile as _tempfile

    try:
        _os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = _tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        with _os.fdopen(fd, "w") as fh:
            _json.dump({"n": out[0], "k": out[1], "span": out[2]}, fh)
        _os.replace(tmp, _os.path.join(cache_dir, pk + ".json"))
        # Bound the sidecar directory (round-12 ADVICE: default-on cache
        # with no eviction): keep the newest ``max_entries`` by mtime —
        # writes happen once per cold probe, so the listing is rare.
        entries = [
            e
            for e in _os.scandir(cache_dir)
            if e.name.endswith(".json")
        ]
        if len(entries) > max_entries:
            entries.sort(key=lambda e: e.stat().st_mtime)
            for e in entries[: len(entries) - max_entries]:
                try:
                    _os.unlink(e.path)
                except OSError:
                    pass
    except OSError:
        pass  # cache-dir trouble never fails the query


def dispatch_stats(
    events: DataFrame,
    key: str,
    ts_col: str,
    stats: "tuple[int, int, float] | None" = None,
) -> tuple[int, int, float]:
    """``(n_rows, n_keys, span_seconds)`` for the dispatch heuristic —
    memoized per (session, plan, key, ts) so back-to-back ordered ops on
    the same frame probe once, and persisted in a local sidecar cache
    (round 11) so COLD sessions over file-backed frames skip the probe
    too. Pass a precomputed triple via ``stats`` (it is returned
    verbatim) to skip the probe entirely — the escape hatch for callers
    that already know their cardinality."""
    if stats is not None:
        return stats
    proj = events.select(key, ts_col)
    mk = _stats_memo_key(proj, key, ts_col)
    if mk is not None and mk in _STATS_MEMO:
        _STATS_MEMO.move_to_end(mk)
        return _STATS_MEMO[mk]

    def memoize(out):
        if mk is not None:
            _STATS_MEMO[mk] = out
            while len(_STATS_MEMO) > _STATS_MEMO_MAX:
                _STATS_MEMO.popitem(last=False)
        return out

    cache_dir = _stats_cache_dir(proj.sparkSession)
    pk = (
        _stats_persist_key(proj, key, ts_col)
        if cache_dir is not None
        else None
    )
    if pk is not None:
        cached = _stats_sidecar_read(cache_dir, pk)
        if cached is not None:
            return memoize(cached)
    out = memoize(_dispatch_stats(proj, key, ts_col))
    if pk is not None:
        try:
            cap = int(
                proj.sparkSession.conf.get(
                    "spark.bfdb.dispatch.statsMaxEntries", "512"
                )
            )
        except Exception:
            cap = 512
        _stats_sidecar_write(cache_dir, pk, out, max_entries=cap)
    return out


def _dispatch_stats(events: DataFrame, key: str, ts_col: str):
    """One map-side-partial aggregate over the event frame: row count,
    approximate key cardinality, and the time span — everything the
    dispatch heuristic and bucket-granularity pick need. O(scan) with
    tiny state; amortized against the per-key sort it prevents."""
    r = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(key).alias("k"),
        F.min(ts_col).alias("lo"),
        F.max(ts_col).alias("hi"),
    ).first()
    span = 0.0
    if r["lo"] is not None and r["hi"] is not None:
        try:
            span = (r["hi"] - r["lo"]).total_seconds()
        except (TypeError, AttributeError):
            # non-datetime ts (ISO string, epoch number): no span signal —
            # the granularity pick falls back to its finest unit, and
            # date_trunc's implicit cast handles ISO strings downstream
            span = 0.0
    return int(r["n"]), max(int(r["k"]), 1), span


_BUCKET_SECONDS = [
    ("year", 31_536_000.0),
    ("month", 2_592_000.0),
    ("day", 86_400.0),
    ("hour", 3_600.0),
    ("minute", 60.0),
]


def _pick_bucket(n_rows: int, n_keys: int, span_seconds: float) -> str:
    """Coarsest date_trunc granularity that still hits the target rows
    per (key, bucket) — subject to the seeds frame (|key| x |buckets|)
    staying broadcast-sized. Falls back to the finest allowed unit."""
    want_buckets = max(n_rows / _TARGET_ROWS_PER_BUCKET, 1.0)
    chosen = _BUCKET_SECONDS[0][0]
    for unit, sec in _BUCKET_SECONDS:
        n_buckets = n_keys * (span_seconds / sec + 1) if span_seconds > 0 else 1
        if n_buckets > _SEED_FRAME_CAP:
            break
        chosen = unit
        if n_buckets >= want_buckets:
            break
    return chosen


def interpolate_at(
    events: DataFrame,
    grid: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    bucket: str | None = "auto",
    stats: "tuple[int, int, float] | None" = None,
) -> DataFrame:
    """Linear interpolation of ``val_col`` at the ``grid`` timestamps.

    ``events``: (key, ts, id, value) observations; ``grid``: (key, ts)
    query points. Returns (key, ts, v_interp) for every grid point with
    an observation on both sides (exact-hit grid points return the
    observation value).

    Plan shape (window path): zero joins — grid markers are UNIONed into
    the event stream and two running ``last(..., ignorenulls=True)``
    windows (one per direction) carry the bracketing observations to each
    marker, so the cost is one shuffle on ``key`` + two per-key sorts
    regardless of grid density. The forward order is (ts, is_grid, id);
    the backward order is (ts DESC, is_grid ASC, id DESC) — is_grid stays
    ASCENDING in both so an observation at exactly a grid timestamp is
    processed before the marker in BOTH directions, making prev == next
    == the observation, and the t_next == t_prev guard then returns it
    exactly (no 0/0) — including at a key's LAST observation, where a
    fully reversed order would leave the marker's backward frame empty
    and drop the exact hit. Interpolation arithmetic is integer-
    MICROsecond diffs — the storage precision, where Spark's truncating
    timestampdiff and DuckDB's boundary-counting date_diff agree exactly
    (at any coarser unit they differ by one whenever the sub-unit part is
    nonzero); NTZ-safe, timezone-free.

    ``bucket`` picks the physical strategy — results are identical:
      * ``"auto"`` (default): one cheap stats aggregate dispatches — the
        two-phase bucketed form when the observed key count is under
        ~2 per core AND histories exceed the MEASURED crossover
        (DISPATCH_MIN_ROWS_PER_KEY — the regime where a single key's sort
        stops fitting one task; below it the plain window measurably
        wins), else the window form. The engine no longer depends on the
        caller knowing the cardinality constraint (round-9 verdict #3).
      * ``None``: force the per-key window form.
      * a ``date_trunc`` unit (``"day"``, ``"hour"``, ...): force the
        two-phase form at that granularity — per-(key, bucket) windows
        (parallelism |key| x |buckets|), with per-bucket boundary
        observations carried across buckets on a |key| x |buckets|-sized
        frame (broadcast back), so no task ever sorts a whole key.
    """
    ev = events.select(
        F.col(key),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_grid"),
        F.col(id_col).cast("long").alias("_id"),
        F.col(val_col).cast("double").alias("_v"),
    )
    gm = grid.select(
        F.col(key),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_grid"),
        F.lit(None).cast("long").alias("_id"),
        F.lit(None).cast("double").alias("_v"),
    )
    u = ev.unionByName(gm)
    if bucket == "auto":
        sc = events.sparkSession.sparkContext
        cores = max(sc.defaultParallelism, 1)
        max_kpc, min_rpk = _dispatch_thresholds(events.sparkSession)
        # probe the ORIGINAL frame's (key, ts) projection (identical
        # stats to ev's) so the memo keys interpolate_at and ffill calls
        # on the same frame together
        n, k, span = dispatch_stats(events, key, ts_col, stats=stats)
        if k <= cores * max_kpc and n / k >= min_rpk:
            bucket = _pick_bucket(n, k, span)
        else:
            bucket = None
    if bucket is None:
        return _interpolate_windowed(u, key, ts_col)
    return _interpolate_bucketed(u, key, ts_col, bucket)


def _interp_result(c: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Shared tail of both interpolate paths: the lerp over the carried
    (_pt,_pv,_nt,_nv) brackets, exact-hit guard included."""
    num = F.expr("timestampdiff(MICROSECOND, _pt, _ts)").cast("double")
    den = F.expr("timestampdiff(MICROSECOND, _pt, _nt)").cast("double")
    v = F.when(F.col("_nt") == F.col("_pt"), F.col("_pv")).otherwise(
        F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (num / den)
    )
    return (
        c.where(
            (F.col("_is_grid") == 1)
            & F.col("_pt").isNotNull()
            & F.col("_nt").isNotNull()
        )
        .select(F.col(key), F.col("_ts").alias(ts_col), v.alias("v_interp"))
    )


def _interpolate_windowed(u: DataFrame, key: str, ts_col: str) -> DataFrame:
    from pyspark.sql import Window

    fwd = [F.col("_ts"), F.col("_is_grid"), F.coalesce("_id", F.lit(0))]
    # NOT the full reverse: _is_grid stays ascending so obs-before-marker
    # holds at equal ts in both directions (see docstring).
    bwd = [
        F.col("_ts").desc(),
        F.col("_is_grid").asc(),
        F.coalesce("_id", F.lit(0)).desc(),
    ]
    w_f = (
        Window.partitionBy(key).orderBy(*fwd).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    w_b = (
        Window.partitionBy(key).orderBy(*bwd).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    obs_ts = F.when(F.col("_is_grid") == 0, F.col("_ts"))
    c = (
        u.withColumn("_pv", F.last("_v", ignorenulls=True).over(w_f))
        .withColumn("_pt", F.last(obs_ts, ignorenulls=True).over(w_f))
        .withColumn("_nv", F.last("_v", ignorenulls=True).over(w_b))
        .withColumn("_nt", F.last(obs_ts, ignorenulls=True).over(w_b))
    )
    return _interp_result(c, key, ts_col)


def _interpolate_bucketed(
    u: DataFrame, key: str, ts_col: str, bucket: str
) -> DataFrame:
    """Two-phase carry/boundary-merge form of the interpolation windows:
    within-bucket running lasts partitioned by (key, bucket) — so
    parallelism is |key| x |buckets|, never |key| — plus per-bucket
    boundary observations (last/first obs ts, last/first non-null value)
    carried across buckets on the tiny |key| x |buckets| frame and
    broadcast back as seeds. ``date_trunc`` is monotone, so the global
    (ts, is_grid, id) order is compatible with (bucket, ts, is_grid, id)
    and coalesce(within-bucket carry, cross-bucket seed) is EXACTLY the
    global running last — parity-pinned on randomized data in
    tests/test_timeseries.py. Null-valued observations keep the window
    path's semantics bit-for-bit: they advance the bracket TIMESTAMP but
    not the carried value (ts and value are carried separately in both
    phases)."""
    from pyspark.sql import Window

    ub = u.withColumn("_bkt", F.date_trunc(bucket, F.col("_ts")))
    is_obs = F.col("_is_grid") == 0
    # Phase 1: per-(key, bucket) boundary observations — one hash
    # aggregate with map-side partials, no sort. max/min over structs pin
    # the (ts, id)-last/first deterministically; value carried only from
    # non-null-v observations (matching last(_v, ignorenulls)).
    obs_t = F.when(is_obs, F.struct("_ts", "_id"))
    obs_v = F.when(is_obs & F.col("_v").isNotNull(), F.struct("_ts", "_id", "_v"))
    bounds = ub.groupBy(key, "_bkt").agg(
        F.max(obs_t).alias("_lt"),
        F.max(obs_v).alias("_lv"),
        F.min(obs_t).alias("_ft"),
        F.min(obs_v).alias("_fv"),
    )
    # Phase 2: carry boundaries across buckets per key — the frame is
    # |key| x |buckets| rows, so the per-key window here is trivial.
    w_prev = (
        Window.partitionBy(key)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy(F.col("_bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = bounds.select(
        key,
        "_bkt",
        F.last("_lt", ignorenulls=True).over(w_prev)["_ts"].alias("_spt"),
        F.last("_lv", ignorenulls=True).over(w_prev)["_v"].alias("_spv"),
        F.last("_ft", ignorenulls=True).over(w_next)["_ts"].alias("_snt"),
        F.last("_fv", ignorenulls=True).over(w_next)["_v"].alias("_snv"),
    )
    # Phase 3: ordinary running lasts, but partitioned by (key, bucket) —
    # full parallelism — seeded by the broadcast cross-bucket carries.
    fwd = [F.col("_ts"), F.col("_is_grid"), F.coalesce("_id", F.lit(0))]
    bwd = [
        F.col("_ts").desc(),
        F.col("_is_grid").asc(),
        F.coalesce("_id", F.lit(0)).desc(),
    ]
    w_f = (
        Window.partitionBy(key, "_bkt").orderBy(*fwd).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    w_b = (
        Window.partitionBy(key, "_bkt").orderBy(*bwd).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    obs_ts = F.when(is_obs, F.col("_ts"))
    c = (
        ub.join(F.broadcast(seeds), [key, "_bkt"])
        .withColumn(
            "_pv",
            F.coalesce(F.last("_v", ignorenulls=True).over(w_f), F.col("_spv")),
        )
        .withColumn(
            "_pt",
            F.coalesce(
                F.last(obs_ts, ignorenulls=True).over(w_f), F.col("_spt")
            ),
        )
        .withColumn(
            "_nv",
            F.coalesce(F.last("_v", ignorenulls=True).over(w_b), F.col("_snv")),
        )
        .withColumn(
            "_nt",
            F.coalesce(
                F.last(obs_ts, ignorenulls=True).over(w_b), F.col("_snt")
            ),
        )
    )
    return _interp_result(c, key, ts_col)


def ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    out_col: str = "filled",
    bucket: str | None = "auto",
    stats: "tuple[int, int, float] | None" = None,
) -> DataFrame:
    """Forward-fill (last non-null carry) with the round-9 cardinality
    dispatch: ``bucket="auto"`` (default) runs one cheap stats aggregate
    and picks the plain per-key running-last window — the measured winner
    whenever per-key histories sort comfortably in one task — or the
    two-phase ``ffill_scalable`` form (parallelism |key| x |buckets|)
    when the key count is under ~2 per core AND histories exceed the
    measured crossover (DISPATCH_MIN_ROWS_PER_KEY). ``bucket=None``
    forces the window form; a ``date_trunc`` unit forces the two-phase
    form at that granularity. Results are identical on every path
    (parity-pinned); total order inside a key is (ts, id)."""
    if bucket == "auto":
        sc = df.sparkSession.sparkContext
        cores = max(sc.defaultParallelism, 1)
        max_kpc, min_rpk = _dispatch_thresholds(df.sparkSession)
        n, k, span = dispatch_stats(df, key, ts_col, stats=stats)
        if k <= cores * max_kpc and n / k >= min_rpk:
            bucket = _pick_bucket(n, k, span)
        else:
            bucket = None
    if bucket is None:
        from pyspark.sql import Window

        w = (
            Window.partitionBy(key)
            .orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return df.withColumn(
            out_col, F.last(val_col, ignorenulls=True).over(w)
        )
    return ffill_scalable(
        df, key, ts_col, id_col, val_col, bucket=bucket, out_col=out_col
    )


def ffill_scalable(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    bucket: str = "day",
    out_col: str = "filled",
) -> DataFrame:
    """Forward-fill (last non-null carry) whose parallelism is
    |key| x |time buckets| instead of |key| — the two-phase distributed
    prefix-scan that rescues per-key ORDERED operators when the key is
    low-cardinality (the constraint the 100x run surfaced: 5 event types
    = 5 tasks for a plain per-key window, however big the data).

    Phase 1 (parallel): per (key, bucket) reduce to the bucket's LAST
    non-null value — a hash aggregate with map-side partials, no sort.
    Phase 2 (tiny): carry those bucket-lasts across buckets per key with
    a running window over the (key x buckets)-sized frame — thousands of
    rows, not billions.
    Phase 3 (parallel): within each (key, bucket) run the ordinary
    running-last window, seeded by the PREVIOUS buckets' carry — the
    window partitions by (key, bucket), restoring full parallelism.

    Exactly equals the single-window per-key fill (parity-tested on
    randomized data): within-bucket carry wins when present, else the
    cross-bucket seed. Total order inside a key is (ts, id).

    WHEN TO USE (measured, PLANS.md round-8): this form pays TWO full
    exchanges (phase-1 agg + phase-3 window) against the plain window's
    one; at 10M rows x 5 keys on 32 cores the plain window wins 5 s vs
    12.5 s. Reach for it only when a single key's rows exceed what one
    task can sort without spilling (≈100M+ rows/key) — exactly the
    regime where the plain form stops working at all.
    """
    from pyspark.sql import Window

    b = F.date_trunc(bucket, F.col(ts_col)).alias("_bucket")
    rows = df.withColumn("_bucket", F.date_trunc(bucket, F.col(ts_col)))
    nn = F.when(
        F.col(val_col).isNotNull(),
        F.struct(F.col(ts_col), F.col(id_col), F.col(val_col)),
    )
    bucket_last = rows.groupBy(key, "_bucket").agg(
        F.max(nn).alias("_last")
    )
    w_seed = (
        Window.partitionBy(key)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = bucket_last.select(
        key,
        "_bucket",
        F.last(F.col("_last")[val_col], ignorenulls=True)
        .over(w_seed)
        .alias("_seed"),
    )
    w_in = (
        Window.partitionBy(key, "_bucket")
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        # seeds is |key| x |buckets| rows — broadcast, so the only big
        # exchange is the window's own (key, bucket) partitioning
        rows.join(F.broadcast(seeds), [key, "_bucket"])
        .withColumn("_within", F.last(val_col, ignorenulls=True).over(w_in))
        .withColumn(out_col, F.coalesce("_within", "_seed"))
        .drop("_bucket", "_within", "_seed")
    )
