"""Suite extension 5: tokenizer-training and corpus-rewrite operators —
C4-style duplicate-span removal (the sibling of document-level dedup that
operates INSIDE documents) and byte-pair-encoding merge training (the first
merges of a BPE tokenizer, learned distributively from the corpus).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``; same
hash-matching conventions as ``suite.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from betfair_database_spark.operators import curation, textstats
from betfair_database_spark.suite import _q, _t


# =========================================================================
# C4-style span dedup: remove every repeated 20-token span corpus-wide
# (keep the first occurrence), then summarize what remains of each doc
# =========================================================================


@_q(
    "dedup_span_c4_stats",
    r"""
    WITH tk AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE trim(text) <> ''
    ),
    ix AS (
      SELECT doc_id, w,
             unnest(generate_series(
               0, CAST(ceil(len(w) / 20.0) AS BIGINT) - 1)) AS i
      FROM tk
    ),
    sp AS (
      SELECT doc_id, CAST(i AS BIGINT) AS span_ix,
             array_to_string(list_slice(w, i * 20 + 1, i * 20 + 20), ' ')
               AS span_text,
             CAST(len(list_slice(w, i * 20 + 1, i * 20 + 20)) AS BIGINT)
               AS span_len
      FROM ix
    ),
    fl AS (
      SELECT doc_id, span_ix, span_text, span_len,
             row_number() OVER (PARTITION BY md5(span_text)
                                ORDER BY doc_id, span_ix) = 1 AS keep
      FROM sp
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(span_len) FILTER (WHERE keep), 0) AS BIGINT)
             AS kept_tokens,
           md5(string_agg(span_text, ' ' ORDER BY span_ix)
               FILTER (WHERE keep)) AS dedup_md5
    FROM fl GROUP BY doc_id
    """,
)
def dedup_span_c4_stats(spark, sf):
    """Duplicate-span removal (C4's repeated-span rule, reference-free
    extension): every 20-token non-overlapping span that occurs more than
    once in the corpus is kept only at its first (doc_id, span_ix)
    occurrence; documents are reassembled from their surviving spans. Two
    uniform shuffles (span md5, then doc id) — see curation.span_dedup."""
    return curation.span_dedup(
        _t(spark, sf, "documents"), span_tokens=20
    ).orderBy("doc_id")


# =========================================================================
# BPE tokenizer training: first 3 merge rules, corpus-weighted
# =========================================================================


def _bpe_ctes(iters: int, rewrite_last: bool) -> str:
    """Shared CTE chain for the BPE oracles: the same spaced-string
    representation, the same ``replace`` merge (identical
    leftmost-non-overlapping semantics in both engines), one CTE trio
    (pairs -> top-1 -> rewritten vocabulary) per iteration. The rewrite
    mirrors _bpe_apply_merge's LEFT JOIN ON TRUE + coalesce (an empty
    top-pair frame leaves sequences unchanged instead of emptying the
    vocabulary)."""
    parts = [
        r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    wf AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok
      WHERE w <> '' GROUP BY w
    ),
    s0 AS (
      SELECT w, ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS s, f FROM wf
    )"""
    ]
    for it in range(1, iters + 1):
        prev = f"s{it - 1}"
        parts.append(
            f"""
    , p{it} AS (
      SELECT t[i] AS a, t[i + 1] AS b, CAST(sum(f) AS BIGINT) AS c
      FROM (
        SELECT regexp_split_to_array(trim(s), ' +') AS t, f,
               unnest(generate_series(
                 1, len(regexp_split_to_array(trim(s), ' +')) - 1)) AS i
        FROM {prev}
      )
      GROUP BY a, b
    ),
    t{it} AS (SELECT a, b, c FROM p{it} ORDER BY c DESC, a, b LIMIT 1)"""
        )
        if it < iters or rewrite_last:
            parts.append(
                f"""
    , s{it} AS (
      SELECT w,
             coalesce(replace(s, ' ' || t{it}.a || ' ' || t{it}.b || ' ',
                                 ' ' || t{it}.a || t{it}.b || ' '), s) AS s,
             f
      FROM {prev} LEFT JOIN t{it} ON TRUE
    )"""
            )
    return "".join(parts)


def _bpe_oracle(iters: int = 3) -> str:
    selects = [
        f"SELECT CAST({it} AS BIGINT) AS it, a AS sym_a, b AS sym_b,"
        f" c AS pair_count FROM t{it}"
        for it in range(1, iters + 1)
    ]
    return (
        _bpe_ctes(iters, rewrite_last=False)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
    )


def _bpe_apply_oracle(iters: int = 3) -> str:
    return (
        _bpe_ctes(iters, rewrite_last=True)
        + f"""
    , wl AS (
      SELECT w, CAST(len(regexp_split_to_array(trim(s), ' +')) AS BIGINT)
               AS n_sym
      FROM s{iters}
    )
    SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(wl.n_sym) AS BIGINT) AS n_bpe_tokens
    FROM tok JOIN wl USING (w)
    GROUP BY tok.doc_id
    """
    )


# =========================================================================
# Data-drift monitoring: per-day KL divergence of the event-type mix
# =========================================================================


@_q(
    "ev_type_drift_kl",
    """
    WITH c AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    d AS (SELECT day, CAST(sum(n) AS BIGINT) AS day_n FROM c GROUP BY day),
    g AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS type_n FROM c
          GROUP BY event_type),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n FROM c)
    SELECT c.day, d.day_n,
           CAST(sum(CAST(round(
             (CAST(c.n AS DOUBLE) / CAST(d.day_n AS DOUBLE))
             * ln((CAST(c.n AS DOUBLE) / CAST(d.day_n AS DOUBLE))
                  / (CAST(g.type_n AS DOUBLE) / CAST(t.total_n AS DOUBLE))), 6)
             AS DECIMAL(18,6))) AS DOUBLE) AS kl
    FROM c JOIN d USING (day) JOIN g USING (event_type), t
    GROUP BY c.day, d.day_n ORDER BY c.day
    """,
)
def ev_type_drift_kl(spark, sf):
    """Distribution-drift monitor: KL(P_day || P_global) of the event-type
    mix, per day — the standard pipeline alarm for "today's traffic looks
    different". Counts reduce to a (day, type) table (one shuffle of
    exact integers); day totals and global type totals are tiny re-aggs of
    that table, broadcast back. Each KL term is rounded to 6 THEN summed
    as DECIMAL(18,6): the only doubles that cross engines are per-term
    (identical division/ln inputs), never an order-sensitive double sum —
    the q9 lesson applied to information-theoretic aggregates."""
    ev = _t(spark, sf, "events")
    c = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    c = c.localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds (three consumers, one materialization)
    d = c.groupBy("day").agg(F.sum("n").alias("day_n"))
    g = c.groupBy("event_type").agg(F.sum("n").alias("type_n"))
    t = c.agg(F.sum("n").alias("total_n"))
    p = F.col("n").cast("double") / F.col("day_n").cast("double")
    q = F.col("type_n").cast("double") / F.col("total_n").cast("double")
    term = F.round(p * F.log(p / q), 6).cast("decimal(18,6)")
    return (
        c.join(d, "day")
        .join(F.broadcast(g), "event_type")
        .join(F.broadcast(t))
        .groupBy("day", "day_n")
        .agg(F.sum(term).cast("double").alias("kl"))
        .orderBy("day")
    )


@_q(
    "ev_value_drift_ks",
    """
    WITH b AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(least(floor("value" / 25), 19) AS BIGINT) AS bin
      FROM events
    ),
    c AS (SELECT day, bin, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
    grid AS (
      SELECT d.day, g.bin
      FROM (SELECT DISTINCT day FROM c) d,
           (SELECT unnest(generate_series(0, 19)) AS bin) g
    ),
    cum AS (
      SELECT grid.day, grid.bin,
             sum(coalesce(c.n, 0)) OVER (PARTITION BY grid.day
                                         ORDER BY grid.bin) AS cd
      FROM grid LEFT JOIN c ON grid.day = c.day AND grid.bin = c.bin
    ),
    tot AS (SELECT day, CAST(sum(n) AS BIGINT) AS nd FROM c GROUP BY day),
    gcum AS (
      SELECT bin, sum(n_all) OVER (ORDER BY bin) AS cg, n_tot
      FROM (SELECT g.bin, CAST(coalesce(sum(c.n), 0) AS BIGINT) AS n_all,
                   (SELECT CAST(sum(n) AS BIGINT) FROM c) AS n_tot
            FROM (SELECT unnest(generate_series(0, 19)) AS bin) g
            LEFT JOIN c ON g.bin = c.bin GROUP BY g.bin)
    )
    SELECT cum.day, tot.nd AS n_day,
           round(max(abs(CAST(cum.cd AS DOUBLE) / CAST(tot.nd AS DOUBLE)
                       - CAST(gcum.cg AS DOUBLE) / CAST(gcum.n_tot AS DOUBLE))),
                 6) AS ks
    FROM cum JOIN tot USING (day) JOIN gcum USING (bin)
    GROUP BY cum.day, tot.nd ORDER BY cum.day
    """,
)
def ev_value_drift_ks(spark, sf):
    """Numeric-distribution drift: binned Kolmogorov–Smirnov distance of
    each day's value distribution vs the global one, on a fixed 20-bin
    grid (the KL monitor's numeric sibling). Every intermediate is an
    EXACT integer — binned counts, windowed cumulative sums — and the
    final statistic is a max over identical rational divisions, a
    SELECTION rather than a float sum, so it is cross-engine
    deterministic with no rounding tricks at all. One (day,bin) count
    shuffle; the day×20 grid, per-day totals and the 20-row global ECDF
    are broadcast-sized."""
    ev = _t(spark, sf, "events")
    b = ev.select(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.least(F.floor(F.col("value") / 25), F.lit(19)).cast("long").alias("bin"),
    )
    c = b.groupBy("day", "bin").agg(F.count("*").alias("n"))
    c = c.localCheckpoint(eager=False)  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds (four consumers)
    bins = spark.range(0, 20).select(F.col("id").alias("bin"))
    grid = c.select("day").distinct().crossJoin(F.broadcast(bins))
    wday = Window.partitionBy("day").orderBy("bin")
    cum = (
        grid.join(c, ["day", "bin"], "left")
        .select("day", "bin", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
        .withColumn("cd", F.sum("n").over(wday))
    )
    tot = c.groupBy("day").agg(F.sum("n").alias("nd"))
    from betfair_database_spark.plans.guards import assert_bounded_frame

    gall = (
        assert_bounded_frame(
            bins.join(
                c.groupBy("bin").agg(F.sum("n").alias("n_all")), "bin", "left"
            ).select(
                "bin", F.coalesce(F.col("n_all"), F.lit(0)).alias("n_all")
            ),
            "KS 20-bin grid",
        )
        # bounded-frame global window: 20 fixed bins (plan-guarded above)
        .withColumn("cg", F.sum("n_all").over(Window.orderBy("bin")))
        .crossJoin(F.broadcast(c.agg(F.sum("n").alias("n_tot"))))
    )
    diff = F.abs(
        F.col("cd").cast("double") / F.col("nd").cast("double")
        - F.col("cg").cast("double") / F.col("n_tot").cast("double")
    )
    return (
        cum.join(F.broadcast(tot), "day")
        .join(F.broadcast(gall), "bin")
        .groupBy("day", F.col("nd").alias("n_day"))
        .agg(F.round(F.max(diff), 6).alias("ks"))
        .orderBy("day")
    )


# =========================================================================
# Distribution-matched resampling: thin the corpus to a target language mix
# =========================================================================

_MIX = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


def _mix_oracle() -> str:
    case = (
        "CASE lang "
        + " ".join(
            f"WHEN '{k}' THEN CAST({v!r} AS DOUBLE)"
            for k, v in sorted(_MIX.items())
        )
        + " END"
    )
    langs = ", ".join(f"'{k}'" for k in sorted(_MIX))
    return f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 10000 AS bk,
             {case} AS share
      FROM documents WHERE lang IN ({langs})
    ),
    c AS (SELECT lang, count(*) AS n, any_value(share) AS share
          FROM d GROUP BY lang),
    cap AS (SELECT min(CAST(n AS DOUBLE) / share) AS cap FROM c)
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
    FROM d, c, cap
    WHERE d.lang = c.lang
      AND d.bk < floor(d.share * cap.cap / CAST(c.n AS DOUBLE) * 10000 + 0.5)
    GROUP BY d.lang ORDER BY d.lang
    """


@_q("sample_match_target_mix", _mix_oracle())
def sample_match_target_mix(spark, sf):
    """Resample the corpus to a target language distribution (en 40%, four
    others 15% each) without upsampling: output size is the largest N the
    corpus supports at that mix, the binding language keeps everything,
    the rest are hash-thinned. Rates are derived IN-PLAN from observed
    counts (strata-sized agg + 1-row min, both broadcast); the corpus is
    scanned once and never shuffled — see sampling.match_target_mix."""
    from betfair_database_spark.operators import sampling

    kept = sampling.match_target_mix(
        _t(spark, sf, "documents"), "lang", "doc_id", _MIX
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


# =========================================================================
# Containment join: quote / partial-copy detection (asymmetric similarity)
# =========================================================================


@_q(
    "dedup_containment_ssjoin",
    """
    WITH reps AS (
      -- collapse_exact=True contract (round 12): see dedup_jaccard_ssjoin
      SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(length(text) - 8, 0) + 1),
                                   i -> substr(lower(text), CAST(i AS INT), 9))) AS w
      FROM reps
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      FROM sh x JOIN sh y ON x.w = y.w AND x.doc_id <> y.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(i * 1.0 / sa.n, 4) AS containment
    FROM inter JOIN sz sa ON sa.doc_id = a
    WHERE i * 1.0 / sa.n >= 0.9
    """,
)
def dedup_containment_ssjoin(spark, sf):
    """EXACT containment pairs (>= 0.9 of a's 9-gram shingles appear in b)
    via the asymmetric prefix filter — the quote/partial-copy detector
    Jaccard misses (a short doc quoted inside a long one has high
    containment but tiny Jaccard). Oracle is the brute-force join; the
    0.9 threshold sits in this corpus's empty 0.8-0.98 containment gap,
    catching the 50 planted full/partial containments. See
    dedup.containment_ssjoin for the prefix-lemma shape."""
    from betfair_database_spark.operators.dedup import containment_ssjoin

    d = _t(spark, sf, "documents")
    return containment_ssjoin(d, threshold=0.9, k=9)


@_q("text_bpe_top_merges", _bpe_oracle(3))
def text_bpe_top_merges(spark, sf):
    """First 3 BPE tokenizer merges learned from the corpus (pair merged
    per iteration + its corpus-weighted count). The corpus is scanned once
    for the word-frequency table; each merge step is a map + hash agg over
    the Heaps'-bounded distinct-word table — see textstats.bpe_merge_steps."""
    return textstats.bpe_merge_steps(_t(spark, sf, "documents"), iters=3)


@_q("text_bpe_apply_counts", _bpe_apply_oracle(3))
def text_bpe_apply_counts(spark, sf):
    """Tokenize the corpus with the BPE tokenizer trained on it (the 3
    merges of text_bpe_top_merges, applied): per document, word count and
    total symbol count. One word-keyed join carries each word's final
    symbol count back onto the token stream — the only corpus-sized
    shuffle; see textstats.bpe_apply_counts."""
    return textstats.bpe_apply_counts(_t(spark, sf, "documents"), iters=3)


_BM25_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
), toks2 AS (SELECT doc_id, w FROM toks WHERE w <> ''),
doclen AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM doclen),
q AS (SELECT doc_id, w FROM toks2 WHERE w IN ('filter', 'merge', 'vector')),
tf AS (SELECT doc_id, w, count(*) AS tf FROM q GROUP BY doc_id, w),
dfq AS (SELECT w, CAST(count(DISTINCT doc_id) AS DOUBLE) AS dfq FROM q GROUP BY w),
contrib AS (
  SELECT t.doc_id, t.w,
         ln(1.0 + (s.n_docs - d.dfq + 0.5) / (d.dfq + 0.5))
         * ((t.tf * (1.2 + 1.0))
            / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS c
  FROM tf t JOIN doclen l USING (doc_id) JOIN dfq d USING (w), stats s
),
scored AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(c ORDER BY w)),
                           (acc, x) -> acc + x), 4) AS score
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""


@_q("text_bm25_topk", _BM25_ORACLE)
def text_bm25_topk(spark, sf):
    """BM25 keyword retrieval over the corpus (query: filter/merge/vector,
    Lucene idf, k1=1.2, b=0.75): the sparse-retrieval complement to the
    dense ANN family. Token stream filtered to the query terms before any
    shuffle; per-doc scores fold per-term contributions in sorted term
    order so the floating sum is order-pinned cross-engine. See
    textstats.bm25_topk."""
    return textstats.bm25_topk(
        _t(spark, sf, "documents"), ["filter", "merge", "vector"], k=10
    )
