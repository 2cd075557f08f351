"""Suite extension 9: linear interpolation at grid timestamps and
per-user interval union (gaps-and-islands coverage accounting).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py`` (aliases identical on both
sides, doubles rounded before compare, deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betfair_database_spark.operators import rangejoin, timeseries
from betfair_database_spark.suite import _q, _t

# =========================================================================
# ts_interpolate_linear — lerp the value series onto an hourly grid
# =========================================================================

_INTERP_ORACLE = r"""
WITH b AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
  FROM events GROUP BY event_type
),
grid AS (
  SELECT event_type,
         unnest(generate_series(lo + INTERVAL 1 HOUR, hi, INTERVAL 1 HOUR)) AS ts
  FROM b
),
u AS (
  SELECT event_type, ts, 0 AS is_grid, event_id, value FROM events
  UNION ALL
  SELECT event_type, ts, 1 AS is_grid, NULL, NULL FROM grid
),
c AS (
  SELECT event_type, ts, is_grid,
         last_value(value IGNORE NULLS) OVER wf AS pv,
         last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER wf AS pt,
         last_value(value IGNORE NULLS) OVER wb AS nv,
         last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER wb AS nt
  FROM u
  WINDOW
    wf AS (PARTITION BY event_type
           ORDER BY ts, is_grid, coalesce(event_id, 0)
           ROWS UNBOUNDED PRECEDING),
    wb AS (PARTITION BY event_type
           ORDER BY ts DESC, is_grid ASC, coalesce(event_id, 0) DESC
           ROWS UNBOUNDED PRECEDING)
)
SELECT event_type,
       strftime(ts, '%Y-%m-%d %H:%M') AS grid_ts,
       round(CASE WHEN nt = pt THEN pv
                  ELSE pv + (nv - pv) * (date_diff('microsecond', pt, ts)::DOUBLE
                                         / date_diff('microsecond', pt, nt)::DOUBLE)
             END, 4) AS v_interp
FROM c
WHERE is_grid = 1 AND pt IS NOT NULL AND nt IS NOT NULL
"""


@_q("ts_interpolate_linear", _INTERP_ORACLE)
def ts_interpolate_linear(spark, sf):
    """Hourly-grid linear interpolation of the per-type value series —
    the resampling primitive for irregular telemetry. Zero joins: grid
    markers union into the stream, two running ignore-nulls windows
    carry the bracketing observations (see timeseries.interpolate_at for
    the tie-break and exact-hit contract)."""
    ev = _t(spark, sf, "events")
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.max("ts").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.expr("sequence(lo + interval 1 hour, hi, interval 1 hour)")
        ).alias("ts"),
    )
    out = timeseries.interpolate_at(
        ev, grid, key="event_type", ts_col="ts", id_col="event_id", val_col="value"
    )
    return out.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("grid_ts"),
        F.round("v_interp", 4).alias("v_interp"),
    )


# =========================================================================
# range_interval_union — per-user coverage from overlapping intervals
# =========================================================================

_UNION_ORACLE = r"""
WITH iv AS (
  SELECT user_id, event_id, ts AS s,
         ts + (CAST(round(value * 60) AS BIGINT) * INTERVAL 1 SECOND) AS e
  FROM events
),
c AS (
  SELECT user_id, event_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e, event_id
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM c
),
g AS (
  SELECT user_id, island, min(s) AS island_start, max(e) AS island_end,
         count(*) AS n_intervals
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       count(*) AS n_islands,
       CAST(sum(n_intervals) AS BIGINT) AS n_intervals,
       CAST(sum(date_diff('microsecond', island_start, island_end)) AS BIGINT)
         AS covered_us,
       CAST(max(date_diff('microsecond', island_start, island_end)) AS BIGINT)
         AS longest_us
FROM g GROUP BY user_id
"""


@_q("range_interval_union", _UNION_ORACLE)
def range_interval_union(spark, sf):
    """Per-user interval union: each event opens a [ts, ts + value
    minutes] activity interval; overlapping/touching intervals merge
    into islands (rangejoin.merge_intervals — one shuffle on user_id,
    windows + group-by reuse the exchange, no self-join), then per-user
    coverage accounting. Duration arithmetic is integer MICROseconds —
    the storage precision, where Spark's truncating timestampdiff and
    DuckDB's boundary-counting date_diff agree exactly."""
    ev = _t(spark, sf, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        F.expr(
            "timestampadd(SECOND, cast(round(value * 60) as bigint), ts)"
        ).alias("e"),
    )
    islands = rangejoin.merge_intervals(
        iv, key="user_id", start="s", end="e", order_tiebreak="event_id"
    )
    dur = F.expr("timestampdiff(MICROSECOND, island_start, island_end)")
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_intervals").alias("n_intervals"),
        F.sum(dur).alias("covered_us"),
        F.max(dur).alias("longest_us"),
    )


# =========================================================================
# graph_jaccard_similar_pairs — common-neighbor node similarity
# =========================================================================

_JACCARD_ORACLE = """
WITH slots AS (
  SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS slot
  FROM events WHERE user_id < 1000
),
e AS (
  SELECT a.u AS u, b.u AS v
  FROM slots a JOIN slots b ON a.slot = b.slot AND a.u < b.u
  GROUP BY 1, 2 HAVING count(*) >= 8
),
adj AS (SELECT u AS c, v AS s FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT c AS n, count(*) AS d FROM adj GROUP BY c),
wed AS (
  SELECT l.s AS u, r.s AS v, count(*) AS common_neighbors
  FROM adj l JOIN adj r ON l.c = r.c AND l.s < r.s
  GROUP BY 1, 2
)
SELECT w.u, w.v,
       CAST(w.common_neighbors AS BIGINT) AS common_neighbors,
       round(w.common_neighbors::DOUBLE
             / (d1.d + d2.d - w.common_neighbors), 6) AS jaccard
FROM wed w JOIN deg d1 ON d1.n = w.u JOIN deg d2 ON d2.n = w.v
ORDER BY jaccard DESC, u, v LIMIT 20
"""


@_q("graph_jaccard_similar_pairs", _JACCARD_ORACLE)
def graph_jaccard_similar_pairs(spark, sf):
    """Top-20 most-similar user pairs by common-neighbor Jaccard over the
    bounded-cohort co-activity graph (same edge rule as
    graph_triangle_count) — the link-prediction primitive: high-overlap
    NON-edges are the candidate links. Wedge-join form with the degree
    table broadcast (graph.jaccard_similarity); sort key is the ROUNDED
    score on both engines so a rounding collapse at the cut boundary
    cannot reorder them differently."""
    from betfair_database_spark.operators.graph import jaccard_similarity

    ev = _t(spark, sf, "events").where(F.col("user_id") < 1000)
    slots = ev.select(
        F.col("user_id").alias("u"),
        F.date_trunc("hour", F.col("ts")).alias("slot"),
    ).distinct()
    a = slots.select(F.col("u").alias("a"), "slot")
    b = slots.select(F.col("u").alias("b"), "slot")
    # broadcast the b-side slots frame (cohort-bounded) — BHJ on slot
    edges = (
        a.join(F.broadcast(b), "slot")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 8)
        .select("a", "b")
    )
    sim = jaccard_similarity(
        edges,
        canonical=True,
        broadcast_degrees=True,
        broadcast_adjacency=True,
        # the >=8-shared-slots screen above bounds the cohort's degree
        # distribution (measured), so the quadratic wedge join is safe
        unbounded=True,
    ).withColumn("jaccard", F.round("jaccard", 6))
    return sim.orderBy(
        F.col("jaccard").desc(), F.col("u"), F.col("v")
    ).limit(20)


# =========================================================================
# text_zipf_slope — Zipf-law exponent of the corpus token distribution
# =========================================================================

_ZIPF_ORACLE = r"""
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
),
freq AS (SELECT w, count(*) AS f FROM tok GROUP BY w),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
  FROM freq
),
pts AS (
  SELECT CAST(round(ln(r) * 1000000) AS BIGINT) AS x,
         CAST(round(ln(f) * 1000000) AS BIGINT) AS y
  FROM ranked WHERE r <= 1000
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,
         CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
         CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx,
         CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy,
         CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy
  FROM pts
)
SELECT n AS n_points,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 5) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             / 1000000.0, 5) AS intercept,
       round(pow((n * sxy - sx * sy), 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 5) AS r2
FROM m
"""


@_q("text_zipf_slope", _ZIPF_ORACLE)
def text_zipf_slope(spark, sf):
    """Zipf-law fit over the top-1000 token frequencies: slope of
    ln(freq) on ln(rank) by closed-form least squares — the corpus-health
    statistic (natural text ~ -1; templated/spammy corpora deviate).
    Cross-engine determinism: built-in regr_slope is a running double
    aggregate (merge-order-dependent), and even DECIMAL moment sums
    diverge across engines (product-scale rounding rules + the
    decimal->double cast differ) — measured, not theory. So the moments
    are INTEGER: each ln() is scaled by 1e6 and rounded to a BIGINT,
    integer sums are exact and associative, int64->double conversion is
    correctly rounded everywhere, and the 1e6 scale cancels in the slope
    and r2 (the intercept divides it back out). One token-count
    exchange + a 1000-row fit."""
    d = _t(spark, sf, "documents")
    from pyspark.sql import Window

    tok = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    # distributed TakeOrdered bounds the frame to 1000 rows BEFORE the
    # global rank window (an unpartitioned window over the raw vocabulary
    # would funnel millions of tokens through one task at corpus scale —
    # caught by the repo's bounded-frame guard, test_layout.py)
    from betfair_database_spark.plans.guards import assert_bounded_frame

    top = freq.orderBy(F.col("f").desc(), F.col("w")).limit(1000)
    ranked = assert_bounded_frame(top, "zipf top-1000 tokens").withColumn(
        "r",
        F.row_number().over(
            Window.orderBy(F.col("f").desc(), F.col("w"))
        ),
    )
    pts = ranked.select(
        F.round(F.log(F.col("r").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n / F.lit(1000000.0)
    r2 = F.pow(n * F.col("sxy") - F.col("sx") * F.col("sy"), F.lit(2)) / (
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").alias("n_points"),
        F.round(slope, 5).alias("zipf_slope"),
        F.round(intercept, 5).alias("intercept"),
        F.round(r2, 5).alias("r2"),
    )


# =========================================================================
# curation_dataset_card — one-pass per-language corpus accounting
# =========================================================================

_CARD_ORACLE = r"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 2) AS mean_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
GROUP BY lang
"""


@_q("curation_dataset_card", _CARD_ORACLE)
def curation_dataset_card(spark, sf):
    """Per-language dataset-card accounting in ONE grouped pass: doc /
    unique-text / duplicate counts, char and whitespace-token totals,
    source fan-in. countDistinct over md5(text) keys the dedup tally so
    the exchange carries 32-byte digests, never document bodies —
    the at-scale form of 'how dirty is this corpus' accounting."""
    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias(
            "n_dup_docs"
        ),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("mean_chars"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )


# =========================================================================
# ev_anomaly_mad — robust outliers via median absolute deviation
# =========================================================================

_MAD_ORACLE = r"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, abs(e.value - med.m) AS ad, med.m
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) FILTER (WHERE d.ad > 3 * 1.4826 * mad.mad) AS BIGINT)
         AS n_outliers,
       round(min(d.value) FILTER (WHERE d.ad > 3 * 1.4826 * mad.mad), 2)
         AS min_outlier,
       round(max(d.value) FILTER (WHERE d.ad > 3 * 1.4826 * mad.mad), 2)
         AS max_outlier,
       round(any_value(d.m), 4) AS median_value,
       round(any_value(mad.mad), 4) AS mad
FROM dev d JOIN mad USING (event_type)
GROUP BY d.event_type
"""


@_q("ev_anomaly_mad", _MAD_ORACLE)
def ev_anomaly_mad(spark, sf):
    """Robust outlier detection: |v - median| > 3 * 1.4826 * MAD per event
    type — unlike the z-score family, one corrupted heavy tail cannot
    inflate its own threshold. Exact interpolated medians on both engines
    (Spark percentile == DuckDB quantile_cont); the two grouped passes
    share one scan each and the 5-row stats sides broadcast, so events
    shuffle zero times."""
    ev = _t(spark, sf, "events").select("event_type", "event_id", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .withColumn("ad", F.abs(F.col("value") - F.col("m")))
        .localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds (two consumers (mad agg + final) share one scan)
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    d = dev.join(F.broadcast(mad), "event_type")
    is_out = F.col("ad") > 3 * 1.4826 * F.col("mad")
    return d.groupBy("event_type").agg(
        F.count(F.when(is_out, 1)).alias("n_outliers"),
        F.round(F.min(F.when(is_out, F.col("value"))), 2).alias("min_outlier"),
        F.round(F.max(F.when(is_out, F.col("value"))), 2).alias("max_outlier"),
        F.round(F.first("m"), 4).alias("median_value"),
        F.round(F.first("mad"), 4).alias("mad"),
    )


# =========================================================================
# pipeline_markov_eval — temporal-split next-event prediction accuracy
# =========================================================================

_MARKOV_EVAL_ORACLE = r"""
WITH pairs AS (
  SELECT user_id, ts, event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS t
  FROM events
),
valid AS (SELECT * FROM pairs WHERE t IS NOT NULL),
train AS (
  SELECT f, t, count(*) AS c FROM valid
  WHERE ts < TIMESTAMP '2024-01-22 00:00:00' GROUP BY f, t
),
pred AS (
  SELECT f, t AS predicted
  FROM (SELECT f, t, row_number() OVER (PARTITION BY f
                                        ORDER BY c DESC, t) AS rn
        FROM train)
  WHERE rn = 1
),
test AS (
  SELECT v.f, v.t, p.predicted FROM valid v
  LEFT JOIN pred p USING (f)
  WHERE v.ts >= TIMESTAMP '2024-01-22 00:00:00'
)
SELECT f AS from_type,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN predicted = t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(sum(CASE WHEN predicted = t THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 4) AS accuracy
FROM test GROUP BY f
"""


@_q("pipeline_markov_eval", _MARKOV_EVAL_ORACLE)
def pipeline_markov_eval(spark, sf):
    """In-engine model evaluation with a TEMPORAL split (the
    leakage-correct protocol for sequence models): fit the first-order
    Markov next-event predictor on days 1-21, score top-1 accuracy on the
    rest. One lead() pass builds all transitions; the train/test split is
    a filter on the pair's own timestamp (no second scan); the fitted
    argmax table is |event_type|^2-bounded and broadcast to the test
    join. Unseen test contexts count as misses on both engines (NULL
    prediction never equals)."""
    from pyspark.sql import Window

    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "ts",
            F.col("event_type").alias("f"),
            F.lead("event_type").over(w).alias("t"),
        )
        .where(F.col("t").isNotNull())
        .localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds (train and test split one lead() pass)
    )
    cutoff = F.lit("2024-01-22 00:00:00").cast("timestamp_ntz")
    train = (
        pairs.where(F.col("ts") < cutoff)
        .groupBy("f", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # argmax with the oracle's (count desc, type asc) tie rule; the fitted
    # table is |event_type|^2 rows, so this window is trivially small
    wp = Window.partitionBy("f").orderBy(F.col("c").desc(), F.col("t"))
    pred = (
        train.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select("f", F.col("t").alias("predicted"))
    )
    test = pairs.where(F.col("ts") >= cutoff).join(
        F.broadcast(pred), "f", "left"
    )
    hit = F.when(F.col("predicted") == F.col("t"), 1).otherwise(0)
    return test.groupBy(F.col("f").alias("from_type")).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(hit).alias("n_correct"),
        F.round(
            F.sum(hit).cast("double") / F.count(F.lit(1)), 4
        ).alias("accuracy"),
    )


# =========================================================================
# multimodal_audio_rms — sample-level PCM analysis vs closed form
# =========================================================================

_AUDIO_RMS_ORACLE = r"""
WITH p AS (
  SELECT doc_id,
         (n_chars % 50 + 1) * 80 AS n,
         doc_id % 100 + 1 AS a,
         (doc_id % 7 + 1) * ((n_chars % 50 + 1) * 80) // 8 AS h
  FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(a AS BIGINT) AS peak,
       round(sqrt((h * a * a)::DOUBLE / n), 6) AS rms
FROM p
"""


@_q("multimodal_audio_rms", _AUDIO_RMS_ORACLE)
def multimodal_audio_rms(spark, sf):
    """PCM sample-level round trip: synthesize a real 8-bit WAV square-
    wave burst per document (multimodal.synthesize_audio_pcm), decode the
    container and compute peak/RMS from the actual samples
    (multimodal.audio_rms — int64-exact squared sums, one double sqrt),
    verify against the closed form. The engine side does real signal
    processing over binary columns; the oracle knows only the synthesis
    parameters."""
    from betfair_database_spark.operators import multimodal

    media = multimodal.synthesize_audio_pcm(_t(spark, sf, "documents"))
    out = multimodal.audio_rms(media)
    return out.select(
        "doc_id", "n_samples", "peak", F.round("rms", 6).alias("rms")
    )


# =========================================================================
# ts_autocorrelation — ACF of the hourly count series at lags 1..3
# =========================================================================

_ACF_ORACLE = r"""
WITH b AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM b
),
cnt AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT g.event_type, g.h, coalesce(cnt.c, 0) AS c
  FROM grid g LEFT JOIN cnt ON g.event_type = cnt.event_type AND g.h = cnt.h
),
led AS (
  SELECT event_type, c,
         lead(c, 1) OVER w AS c1,
         lead(c, 2) OVER w AS c2,
         lead(c, 3) OVER w AS c3
  FROM series WINDOW w AS (PARTITION BY event_type ORDER BY h)
),
pairs AS (
  SELECT event_type, 1 AS lag, c AS x, c1 AS y FROM led WHERE c1 IS NOT NULL
  UNION ALL
  SELECT event_type, 2, c, c2 FROM led WHERE c2 IS NOT NULL
  UNION ALL
  SELECT event_type, 3, c, c3 FROM led WHERE c3 IS NOT NULL
),
m AS (
  SELECT event_type, lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,
         CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
         CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx,
         CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy,
         CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy
  FROM pairs GROUP BY event_type, lag
)
SELECT event_type, lag,
       n AS n_pairs,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 5) AS acf
FROM m
"""


@_q("ts_autocorrelation", _ACF_ORACLE)
def ts_autocorrelation(spark, sf):
    """Autocorrelation of the per-type hourly volume series at lags 1-3 —
    the seasonality/burstiness diagnostic. The series is gap-FILLED onto
    the full hourly grid (missing hours are real zeros; skipping them
    would corrupt every lag), three lead() columns stack into (lag, x, y)
    pairs, and the Pearson formula runs on exact INTEGER moments (counts
    are ints, BIGINT sums are associative) so the one double expression
    matches cross-engine bit-for-bit. One window sort per type; the grid
    union and moments reuse the same event_type partitioning."""
    from pyspark.sql import Window

    ev = _t(spark, sf, "events")
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h"),
    )
    cnt = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    series = (
        grid.join(cnt, ["event_type", "h"], "left")
        .select("event_type", "h", F.coalesce("c", F.lit(0)).alias("c"))
        .localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds (the 3-lag union consumes it three times)
    )
    w = Window.partitionBy("event_type").orderBy("h")
    led = series.select(
        "event_type",
        "c",
        F.lead("c", 1).over(w).alias("c1"),
        F.lead("c", 2).over(w).alias("c2"),
        F.lead("c", 3).over(w).alias("c3"),
    )
    pairs = None
    for k in (1, 2, 3):
        p = led.where(F.col(f"c{k}").isNotNull()).select(
            "event_type",
            F.lit(k).alias("lag"),
            F.col("c").alias("x"),
            F.col(f"c{k}").alias("y"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    m = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    acf = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "event_type",
        "lag",
        F.col("n").alias("n_pairs"),
        F.round(acf, 5).alias("acf"),
    )


# =========================================================================
# text_rake_keywords — RAKE keyword extraction (stopword-delimited phrases)
# =========================================================================

_RAKE_STOPS = "the|and|of|to|a"

_RAKE_ORACLE = rf"""
WITH ph AS (
  SELECT trim(p) AS phrase
  FROM (SELECT unnest(regexp_split_to_array(lower(text),
                      '\b(?:{_RAKE_STOPS})\b')) AS p
        FROM documents)
  WHERE trim(p) <> ''
),
pw AS (
  SELECT phrase, w,
         len(list_filter(string_split(phrase, ' '), x -> x <> '')) AS plen
  FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM ph)
  WHERE w <> ''
),
ws AS (
  SELECT w,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(plen) AS BIGINT) AS degree,
         (CAST(sum(plen) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
           AS score_fp
  FROM pw GROUP BY w
),
ps AS (
  SELECT pw.phrase, CAST(sum(ws.score_fp) AS BIGINT) AS fp
  FROM (SELECT DISTINCT phrase, w FROM pw) pw JOIN ws USING (w)
  GROUP BY pw.phrase
),
occ AS (SELECT phrase, count(*) AS n_occ FROM ph GROUP BY phrase)
SELECT o.phrase,
       CAST(o.n_occ AS BIGINT) AS n_occ,
       round(ps.fp / 1000000.0, 4) AS rake_score
FROM occ o JOIN ps USING (phrase)
ORDER BY rake_score DESC, phrase LIMIT 20
"""


@_q("text_rake_keywords", _RAKE_ORACLE)
def text_rake_keywords(spark, sf):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; word score = degree/freq where
    degree sums the lengths of phrases containing the word; a phrase
    scores the sum of its DISTINCT member-word scores. Word scores are
    FIXED-POINT (degree*1e6 // freq): summing exact integers instead of
    double ratios keeps the phrase score associative and cross-engine
    identical (same reason the zipf/acf rows use integer moments). The
    word-score table is vocabulary-bounded and broadcast to the phrase
    join; top-20 by (score desc, phrase)."""
    d = _t(spark, sf, "documents")
    ph = (
        d.select(
            F.explode(
                F.split(F.lower("text"), rf"\b(?:{_RAKE_STOPS})\b")
            ).alias("p")
        )
        .select(F.trim("p").alias("phrase"))
        .where(F.col("phrase") != "")
        .localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds (words + occurrence counts share the split)
    )
    words = ph.select(
        "phrase",
        F.explode(F.split("phrase", " ")).alias("w"),
        F.size(
            F.filter(F.split("phrase", " "), lambda x: x != "")
        ).alias("plen"),
    ).where(F.col("w") != "").localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds (ws + ps consumers)
    ws = words.groupBy("w").agg(
        F.sum("plen").alias("degree"), F.count(F.lit(1)).alias("freq")
    )
    # integer floor-div semantics to mirror the oracle's // exactly
    ws = ws.select(
        "w",
        F.floor(
            (F.col("degree") * F.lit(1000000)) / F.col("freq")
        ).cast("long").alias("score_fp"),
    )
    ps = (
        words.select("phrase", "w")
        .distinct()
        .join(F.broadcast(ws), "w")
        .groupBy("phrase")
        .agg(F.sum("score_fp").alias("fp"))
    )
    occ = ph.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occ"))
    out = occ.join(ps, "phrase").select(
        "phrase",
        "n_occ",
        F.round(F.col("fp") / F.lit(1000000.0), 4).alias("rake_score"),
    )
    return out.orderBy(F.col("rake_score").desc(), "phrase").limit(20)


# =========================================================================
# ev_burstiness — inter-arrival burstiness / CV per event type
# =========================================================================

_BURST_ORACLE = r"""
WITH g AS (
  SELECT event_type,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id)) // 1000 AS gap_ms
  FROM events
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(gap_ms) AS BIGINT) AS DOUBLE) AS s,
         CAST(CAST(sum(gap_ms * gap_ms) AS BIGINT) AS DOUBLE) AS q
  FROM g WHERE gap_ms IS NOT NULL GROUP BY event_type
)
SELECT event_type, n AS n_gaps,
       round(s / n / 1000.0, 3) AS mean_gap_s,
       round(sqrt((n * q - s * s) / (n * (n - 1.0))) / 1000.0, 3) AS std_gap_s,
       round((sqrt((n * q - s * s) / (n * (n - 1.0))) - s / n)
             / (sqrt((n * q - s * s) / (n * (n - 1.0))) + s / n), 5)
         AS burstiness
FROM m
"""


@_q("ev_burstiness", _BURST_ORACLE)
def ev_burstiness(spark, sf):
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of the
    inter-arrival gaps per event type (B ~ -1 periodic, 0 Poisson, -> 1
    bursty) — the traffic-shape diagnostic behind rate-limiter and
    capacity decisions. Gaps are exact integer milliseconds
    (microsecond diff // 1000, both engines floor); moments are BIGINT
    sums, so the double formula is cross-engine identical. One window
    sort + one grouped aggregate."""
    from pyspark.sql import Window

    ev = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # `div` is exact integer division, mirroring the oracle's // (gaps
    # are non-negative so floor == trunc)
    g = ev.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, ts, lead(ts) over "
            "(partition by event_type order by ts, event_id)) div 1000"
        ).alias("gap_ms"),
    )
    m = g.where(F.col("gap_ms").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap_ms").cast("double").alias("s"),
        F.sum(F.col("gap_ms") * F.col("gap_ms")).cast("double").alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    std = F.sqrt((n * q - s * s) / (n * (n - F.lit(1.0))))
    mu = s / n
    return m.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.round(mu / 1000.0, 3).alias("mean_gap_s"),
        F.round(std / 1000.0, 3).alias("std_gap_s"),
        F.round((std - mu) / (std + mu), 5).alias("burstiness"),
    )


# =========================================================================
# ml_quantile_binning — decile discretization with exact boundaries
# =========================================================================

_QBIN_ORACLE = r"""
WITH b AS (
  -- boundaries round to 4 decimals on BOTH engines (round 12): the
  -- interpolation arithmetic differs in the last ulp across engines
  -- (59.24 vs 59.239999999999995 observed at sf0.1, flipping the bucket
  -- of values exactly on the boundary). True boundaries carry at most 3
  -- exact decimals (2-decimal values x exact tenth fractions), so the
  -- 4-decimal round has no half-point and both engines land identically.
  SELECT event_type,
         list_transform(
           quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
           q -> round(q, 4)) AS qs
  FROM events GROUP BY event_type
),
assigned AS (
  SELECT e.event_type, e.value,
         (SELECT count(*) FROM unnest(b.qs) AS t(q) WHERE e.value > q)
           AS bucket
  FROM events e JOIN b USING (event_type)
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi
FROM assigned GROUP BY event_type, bucket
"""


@_q("ml_quantile_binning", _QBIN_ORACLE)
def ml_quantile_binning(spark, sf):
    """Decile feature discretization with EXACT interpolated boundaries
    (Spark percentile == DuckDB quantile_cont, the pairing the
    inter-arrival row established) — unlike ntile(), boundary-based
    buckets are a pure function of the VALUE, so they reproduce across
    engines, runs, and partitionings (ntile ties break by row position).
    Bucket = how many boundaries the value exceeds; the 5-row boundary
    table broadcasts, events shuffle once for the final rollup."""
    ev = _t(spark, sf, "events").select("event_type", "value")
    # boundary round-to-4 mirrors the oracle (round 12): engines differ
    # in interpolation ulps; true boundaries have <= 3 exact decimals
    b = ev.groupBy("event_type").agg(
        F.expr(
            "transform(percentile(value, "
            "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)), "
            "q -> round(q, 4))"
        ).alias("qs")
    )
    assigned = ev.join(F.broadcast(b), "event_type").select(
        "event_type",
        "value",
        F.aggregate(
            F.filter("qs", lambda q: F.col("value") > q),
            F.lit(0),
            lambda acc, _: acc + 1,
        ).alias("bucket"),
    )
    return assigned.groupBy("event_type", F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


# =========================================================================
# pipeline_entity_resolution — blocked fuzzy match -> clusters -> canonical
# =========================================================================

_ER_ORACLE = r"""
WITH RECURSIVE pairs AS (
  SELECT a.p_partkey AS a, b.p_partkey AS b
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
  WHERE levenshtein(a.p_name, b.p_name) <= 3
),
sym AS (SELECT a AS s, b AS d FROM pairs UNION SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT s AS node FROM sym),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, sym.d FROM reach JOIN sym ON sym.s = reach.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
clusters AS (
  SELECT component, count(*) AS n_members, max(node) AS max_member
  FROM comp GROUP BY component
)
SELECT CAST(c.component AS BIGINT) AS canonical_id,
       p.p_name AS canonical_name,
       CAST(c.n_members AS BIGINT) AS n_members,
       CAST(c.max_member AS BIGINT) AS max_member
FROM clusters c JOIN part p ON p.p_partkey = c.component
"""


@_q("pipeline_entity_resolution", _ER_ORACLE)
def pipeline_entity_resolution(spark, sf):
    """The classic entity-resolution pipeline composed from existing
    operators: MULTI-KEY-blocked edit-distance matching, connected
    components over the match graph (min-label propagation, one shuffle
    per round), then canonical-record selection (min id per cluster)
    enriched with its name. Clusters are size >= 2 by construction
    (singletons have no edges — the dedup-report contract).

    Blocking is the ER scale decision, made explicitly here: a single
    brand block densifies quadratically with catalog size (measured:
    15.6 s at sf0.1, minutes at 10x — 800M candidate pairs), so the
    block key is (brand, size) — the standard multi-key refinement
    that keeps per-block comparison sets bounded as the catalog grows.
    The oracle recomputes components with a recursive reachability CTE
    over the identical pair set. Round 13: the blocking rule is enforced
    at runtime — assert_pair_budget prices the (brand, size) blocks and
    refuses loudly when they stop being flat."""
    from betfair_database_spark.operators import graph
    from betfair_database_spark.plans.guards import assert_pair_budget

    part = _t(spark, sf, "part")
    assert_pair_budget(
        part,
        ["p_brand", "p_size"],
        context="pipeline_entity_resolution (brand, size) blocks",
        remediation=(
            "refine the blocking key so expected block size stays flat "
            "as the catalog grows"
        ),
    )
    a = part.select(
        F.col("p_partkey").alias("a"),
        F.col("p_name").alias("na"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
    )
    b = part.select(
        F.col("p_partkey").alias("b"),
        F.col("p_name").alias("nb"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
    )
    pairs = (
        a.join(b, ["brand", "size"])
        .where(F.col("a") < F.col("b"))
        .where(F.levenshtein("na", "nb") <= 3)
        .select("a", "b")
    )
    comp = graph.connected_components(pairs, "a", "b")
    clusters = comp.groupBy(F.col("component").cast("long").alias("canonical_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").cast("long").alias("max_member"),
    )
    names = part.select(
        F.col("p_partkey").cast("long").alias("canonical_id"),
        F.col("p_name").alias("canonical_name"),
    )
    return clusters.join(names, "canonical_id").select(
        "canonical_id", "canonical_name", "n_members", "max_member"
    )


# =========================================================================
# unpivot_lineitem_measures — relational UNPIVOT (wide -> long)
# =========================================================================

_UNPIVOT_ORACLE = r"""
WITH long AS (
  SELECT l_returnflag, measure, value FROM (
    SELECT l_returnflag, 'quantity' AS measure, l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'tax', l_tax FROM lineitem
  )
)
SELECT l_returnflag, measure,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 1000000.0, 2) AS total,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi
FROM long GROUP BY l_returnflag, measure
"""


@_q("unpivot_lineitem_measures", _UNPIVOT_ORACLE)
def unpivot_lineitem_measures(spark, sf):
    """Relational UNPIVOT (wide -> long): the four lineitem measures melt
    into (measure, value) rows via the native unpivot operator — ONE scan
    (the oracle's 4-way UNION ALL re-reads the table per measure; Spark's
    Expand node emits 4 rows per input row in the same pass), then a
    grouped profile per measure. Money sums are SCALED-LONG integers
    (value*1e6 is exact for these <=2dp columns; int sums are 2.7x the
    int128-decimal throughput — measured 11.1 -> 4.0 s on the 24M-row
    expand at sf1 — and order-free like decimals; the long headroom at
    these magnitudes reaches ~1e7-row groups per measure)."""
    li = _t(spark, sf, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn(
        "measure", F.expr("substring(measure, 3)")  # drop the 'l_' prefix
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("value") * 1000000).cast("long"))
            .cast("double")
            / 1000000.0,
            2,
        ).alias("total"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


# =========================================================================
# graph_negative_samples — deterministic non-edge sampling (training data
# for link prediction: the complement set is sampled, never materialized)
# =========================================================================

_NEG_ORACLE = """
WITH slots AS (
  SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS slot
  FROM events WHERE user_id < 1000
),
e AS (
  SELECT a.u AS u, b.u AS v
  FROM slots a JOIN slots b ON a.slot = b.slot AND a.u < b.u
  GROUP BY 1, 2 HAVING count(*) >= 8
),
cand AS (
  SELECT i,
         CAST('0x' || substr(md5('u' || i), 1, 8) AS BIGINT) % 1000 AS u,
         CAST('0x' || substr(md5('v' || i), 1, 8) AS BIGINT) % 1000 AS v
  FROM (SELECT unnest(generate_series(0, 4999)) AS i)
),
pairs AS (
  SELECT i, least(u, v) AS u, greatest(u, v) AS v FROM cand WHERE u <> v
),
neg AS (
  SELECT p.i, p.u, p.v FROM pairs p
  LEFT JOIN e ON e.u = p.u AND e.v = p.v
  WHERE e.u IS NULL
)
SELECT CAST(i AS BIGINT) AS draw, CAST(u AS BIGINT) AS u,
       CAST(v AS BIGINT) AS v
FROM neg ORDER BY i LIMIT 100
"""


@_q("graph_negative_samples", _NEG_ORACLE)
def graph_negative_samples(spark, sf):
    """Negative sampling for link-prediction training: 100 deterministic
    NON-edges of the cohort co-activity graph (same edge rule as the
    jaccard/triangle rows). The complement graph is never materialized —
    candidate pairs come from an md5 hash stream (engine-independent,
    reproducible across runs and partitionings, like every sampler in
    this repo), rejected by an anti-join against the edge set, first 100
    by draw index. At scale the edge side is the big relation and the
    candidate stream is O(k) — the anti-join shuffles candidates, never
    the complement."""
    ev = _t(spark, sf, "events").where(F.col("user_id") < 1000)
    slots = ev.select(
        F.col("user_id").alias("u"),
        F.date_trunc("hour", F.col("ts")).alias("slot"),
    ).distinct()
    a = slots.select(F.col("u").alias("a"), "slot")
    b = slots.select(F.col("u").alias("b"), "slot")
    # broadcast the b-side slots frame (cohort-bounded) — BHJ on slot
    edges = (
        a.join(F.broadcast(b), "slot")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 8)
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
    )
    h = lambda pfx: (  # noqa: E731 — first-8-hex-md5 as long, mod cohort
        F.conv(
            F.substring(F.md5(F.concat(F.lit(pfx), F.col("i"))), 1, 8), 16, 10
        ).cast("long")
        % 1000
    )
    cand = (
        spark.range(0, 5000)
        .select(F.col("id").cast("string").alias("i"))
        .select("i", h("u").alias("cu"), h("v").alias("cv"))
        .where(F.col("cu") != F.col("cv"))
        .select(
            F.col("i").cast("long").alias("draw"),
            F.least("cu", "cv").alias("u"),
            F.greatest("cu", "cv").alias("v"),
        )
    )
    neg = cand.join(edges, ["u", "v"], "left_anti")
    return neg.orderBy("draw").limit(100).select("draw", "u", "v")


# =========================================================================
# asof_join_tolerance — as-of with a max-staleness bound
# =========================================================================

_ASOF_TOL_ORACLE = """
WITH r AS (
  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       CASE WHEN date_diff('microsecond', r.o_orderdate, e.ts)
                 <= 30 * 86400 * 1000000::BIGINT
            THEN r.o_orderkey END AS recent_order_key
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
"""


@_q("asof_join_tolerance", _ASOF_TOL_ORACLE)
def asof_join_tolerance(spark, sf):
    """As-of join with a STALENESS TOLERANCE (pandas merge_asof's
    ``tolerance=``): the latest order at each event's time counts only if
    it is at most 30 days old — the market-data rule that a quote older
    than the tolerance window is no quote at all. The bound applies AFTER
    the as-of match (null, not next-older), so it is a projection over
    the existing union+window as-of plan: zero extra joins or shuffles.
    Duration test in exact microseconds (the round-8 cross-engine rule)."""
    from betfair_database_spark.operators import asof

    ev = _t(spark, sf, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("_ts")
    )
    r = (
        _t(spark, sf, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    joined = asof.asof_join(
        ev, r, on="user_id", left_ts="_ts", right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
    )
    fresh = F.expr(
        "timestampdiff(MICROSECOND, o_orderdate, _ts)"
    ) <= F.lit(30 * 86400 * 1_000_000)
    return joined.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("o_orderkey")).alias("recent_order_key"),
    )


# =========================================================================
# ev_peak_concurrency — max simultaneous open intervals (endpoint sweep)
# =========================================================================

_PEAK_ORACLE = r"""
WITH iv AS (
  SELECT event_type, ts AS s,
         ts + (CAST(round(value * 60) AS BIGINT) * INTERVAL 1 SECOND) AS e
  FROM events
),
pts AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e, -1 FROM iv
),
sweep AS (
  SELECT event_type, t, d,
         sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS open_now
  FROM pts
)
SELECT event_type,
       CAST(max(open_now) AS BIGINT) AS peak_concurrency,
       CAST(count(*) / 2 AS BIGINT) AS n_intervals
FROM sweep GROUP BY event_type
"""


@_q("ev_peak_concurrency", _PEAK_ORACLE)
def ev_peak_concurrency(spark, sf):
    """Peak concurrency per event type — the endpoint sweep: every
    interval contributes (+1 at start, -1 at end), a running sum over the
    time-ordered endpoints is the live count, its max the peak. One
    shuffle on the type key + a per-key sort; no interval self-join (the
    naive overlap-count pairing is O(n^2) per key). Half-open semantics:
    at an instant where one interval ends exactly as another starts, the
    -1 sorts first (ORDER BY t, d with d=-1 < 1), so they never count as
    concurrent — identical tie rule on both engines."""
    ev = _t(spark, sf, "events")
    iv = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        F.expr(
            "timestampadd(SECOND, cast(round(value * 60) as bigint), ts)"
        ).alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = pts.withColumn("open_now", F.sum("d").over(w))
    return sweep.groupBy("event_type").agg(
        F.max("open_now").cast("long").alias("peak_concurrency"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )
