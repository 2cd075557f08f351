"""Suite extension 7: conditional-LM quality scoring (the KenLM-style
perplexity proxy one order above unigrams), greedy next-fit-decreasing
sequence packing (the padding-waste-minimizing packer, with a recursive-
CTE oracle), and a composed cluster-balance resampling pipeline over the
trained k-means assignment.

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from betfair_database_spark.operators import sampling, textstats
from betfair_database_spark.suite import _q, _t
from betfair_database_spark.suite_ext2 import _kmeans_fit_ctes

_BIGRAM_LM_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     w -> w <> '') AS ws
  FROM documents
),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(2, len(ws) + 1),
                i -> struct_pack(w1 := ws[i - 1], w2 := ws[i]))) AS b
  FROM d WHERE len(ws) >= 2
),
bb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bb GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bb GROUP BY 1),
voc AS (SELECT count(DISTINCT w) AS v
        FROM (SELECT unnest(ws) AS w FROM d))
SELECT bb.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln((c2.c2 + 1.0) / (c1.c1 + voc.v))), 4) AS logprob
FROM bb JOIN c2 USING (w1, w2) JOIN c1 USING (w1), voc
GROUP BY bb.doc_id
"""


@_q("text_bigram_lm_logprob", _BIGRAM_LM_ORACLE)
def text_bigram_lm_logprob(spark, sf):
    """Per-document mean conditional log-probability ln P(w_i|w_{i-1})
    with add-one smoothing over this corpus's bigram table — the quality
    filter that catches fluent-unigram word salad. One tokenize pass;
    the corpus-sized bigram stream shuffles once on the bigram key (the
    prefix counts are pre-joined into the vocab-bounded rate table).
    See textstats.bigram_logprob_scores."""
    return textstats.bigram_logprob_scores(_t(spark, sf, "documents"))


_PACK_NF_ORACLE = r"""
WITH RECURSIVE t AS (
  SELECT source, doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END AS BIGINT) AS n_tokens,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+'))
                    END DESC, doc_id) AS rn
  FROM documents
),
walk AS (
  SELECT source, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS bin, n_tokens AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN w.fill + t.n_tokens <= 500
              THEN w.bin ELSE w.bin + 1 END,
         CASE WHEN w.fill + t.n_tokens <= 500
              THEN w.fill + t.n_tokens ELSE t.n_tokens END
  FROM walk w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
)
SELECT source, bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM walk GROUP BY source, bin
"""


@_q("pack_nextfit_decreasing", _PACK_NF_ORACLE)
def pack_nextfit_decreasing(spark, sf):
    """Greedy next-fit-DECREASING packing into 500-token bins per source,
    summarized per bin — the waste-minimizing packer beside
    pack_sequences' streaming split. The per-group sequential walk runs
    in one Arrow-batched applyInPandas task per group; the oracle replays
    the identical walk as a recursive CTE. See
    sampling.pack_greedy_nextfit."""
    d = _t(spark, sf, "documents").select(
        "source",
        "doc_id",
        textstats.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    packed = sampling.pack_greedy_nextfit(
        d, group_col="source", key_col="doc_id",
        tokens_col="n_tokens", budget=500,
    )
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


_CLUSTER_BALANCE_ORACLE = (
    _kmeans_fit_ctes()
    + """,
sized AS (
  SELECT a.cid AS cell, a.vec_id,
         count(*) OVER (PARTITION BY a.cid) AS n_cell,
         row_number() OVER (
           PARTITION BY a.cid
           ORDER BY md5(CAST(a.vec_id AS VARCHAR)), a.vec_id) AS rk
  FROM aF a
),
floor_n AS (SELECT min(n_cell) AS m FROM (SELECT DISTINCT cell, n_cell
                                          FROM sized))
SELECT cell, CAST(max(n_cell) AS BIGINT) AS n_orig,
       CAST(count(*) FILTER (WHERE rk <= floor_n.m) AS BIGINT) AS n_kept
FROM sized, floor_n
GROUP BY cell
"""
)


@_q("pipeline_cluster_balance", _CLUSTER_BALANCE_ORACLE)
def pipeline_cluster_balance(spark, sf):
    """Topic-balanced resampling composed over the trained k-means
    assignment (SemDeDup's cousin on the SELECTION side): train k=4 for
    3 Lloyd iterations, then downsample every cluster to the SMALLEST
    cluster's size in deterministic md5 order — the cluster-proportional
    cap that stops one dominant topic from flooding a training mix.
    Reported per cell as (n_orig, n_kept). The balance stage is one
    cell-keyed window over the assignment; the md5 take is the same
    engine-independent order every sampling operator here uses."""
    from betfair_database_spark.operators import similarity

    emb = _t(spark, sf, "embeddings")
    _, assigned = similarity.kmeans_fit(emb, k=4, max_iters=3, tol=0.0)
    # the assignment plan feeds the window, the floor agg AND the final
    # join — checkpoint so the literal-argmax job runs once, not three
    # times
    assigned = assigned.localCheckpoint()  # lc-ok: gate-row scratch, materialized before its source dir is removed; rerun rebuilds
    sized = assigned.select(
        "cell",
        "vec_id",
        F.count("*").over(Window.partitionBy("cell")).alias("n_cell"),
        F.row_number()
        .over(
            Window.partitionBy("cell").orderBy(
                F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
            )
        )
        .alias("rk"),
    )
    floor_n = sized.select("cell", "n_cell").distinct().agg(
        F.min("n_cell").alias("m")
    )
    return (
        sized.join(F.broadcast(floor_n))
        .groupBy("cell")
        .agg(
            F.max("n_cell").alias("n_orig"),
            F.count(F.when(F.col("rk") <= F.col("m"), 1)).alias("n_kept"),
        )
    )


def _logreg_oracle(n_buckets: int = 64, iters: int = 3, lr: float = 0.01) -> str:
    """Unrolled batch-gradient-descent logistic regression as a CTE chain
    (the kmeans_fit_3iter pattern for a TRAINED model): zero-initialized
    weights make iteration 1's sigmoid exactly 0.5; every subsequent
    cross-engine float (z, p, gradient, weight) rounds to 9 decimals at
    the same chain points the Spark trainer rounds."""
    head = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            t -> t <> '')) AS t
  FROM documents
),
feat AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % {n_buckets}
              AS INT) AS bucket,
         count(*) AS cnt
  FROM tok GROUP BY 1, 2
),
lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents),
nn AS (SELECT count(*) AS n FROM documents),
spine AS (SELECT CAST(unnest(range(0, {n_buckets})) AS INT) AS bucket),
r1 AS (SELECT doc_id, y - 0.5 AS r FROM lab),
g1 AS (SELECT f.bucket, round(sum(f.cnt * r.r), 9) AS g
       FROM feat f JOIN r1 r USING (doc_id) GROUP BY f.bucket),
w1 AS (SELECT s.bucket,
              round({lr} * coalesce(g1.g, 0) / nn.n, 9) AS w
       FROM spine s LEFT JOIN g1 USING (bucket), nn),
b1 AS (SELECT round({lr} * round(sum(r1.r), 9) / max(nn.n), 9) AS b
       FROM r1 CROSS JOIN nn)"""
    parts = [head]
    for i in range(2, iters + 1):
        parts.append(f""",
z{i} AS (SELECT f.doc_id, round(sum(f.cnt * w.w), 9) AS z
        FROM feat f JOIN w{i - 1} w USING (bucket) GROUP BY f.doc_id),
r{i} AS (SELECT l.doc_id,
               l.y - round(1.0 / (1.0 + exp(-(b{i - 1}.b
                     + coalesce(z{i}.z, 0.0)))), 9) AS r
        FROM lab l LEFT JOIN z{i} USING (doc_id), b{i - 1}),
g{i} AS (SELECT f.bucket, round(sum(f.cnt * r.r), 9) AS g
        FROM feat f JOIN r{i} r USING (doc_id) GROUP BY f.bucket),
w{i} AS (SELECT w.bucket,
               round(w.w + {lr} * coalesce(g{i}.g, 0) / nn.n, 9) AS w
        FROM w{i - 1} w LEFT JOIN g{i} USING (bucket), nn),
b{i} AS (SELECT round(max(b.b) + {lr} * round(sum(r.r), 9)
                     / max(nn.n), 9) AS b
        FROM r{i} r CROSS JOIN b{i - 1} b CROSS JOIN nn)""")
    parts.append(f"""
SELECT -1 AS bucket, round(b, 6) AS weight FROM b{iters}
UNION ALL
SELECT bucket, round(w, 6) AS weight FROM w{iters}
""")
    return "".join(parts)


@_q("text_logreg_train_weights", _logreg_oracle())
def text_logreg_train_weights(spark, sf):
    """Train the hashed-bag-of-words logistic quality filter in-engine
    (label: lang = 'en') — 3 batch-gradient iterations, weights reported
    per bucket with the intercept at bucket -1. The iterative trainer is
    exactly oracle-checkable the same way kmeans_fit is: fixed trip
    count, floats rounded at pinned chain points. (This row checks the
    training MATH; the synthetic corpus's lang label is independent of
    its text, so the learned weights are near-zero here — the
    learns-on-learnable-data property is pinned in
    test_operators.test_train_logreg_hashed_learns_separation.) See
    textstats.train_logreg_hashed."""
    d = _t(spark, sf, "documents")
    return textstats.train_logreg_hashed(
        d, label=(F.col("lang") == "en"), n_buckets=64, iters=3, lr=0.01
    )


_CDC_ORACLE = r"""
WITH d AS (
  SELECT doc_id, lower(text) AS lt FROM documents WHERE length(text) > 0
),
cuts AS (
  SELECT doc_id, lt,
         list_concat(list_concat(
           [CAST(1 AS BIGINT)],
           list_filter(range(2, greatest(length(lt) - 15 + 1, 2)),
             i -> CAST('0x' || substr(md5(substr(lt, CAST(i AS INT), 16)),
                       1, 8) AS BIGINT) % 64 = 0)),
           [CAST(length(lt) + 1 AS BIGINT)]) AS c
  FROM d
),
ch AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(c)),
           k -> struct_pack(
             ix := k - 1,
             chunk := substr(lt, CAST(c[CAST(k AS INT)] AS INT),
                             CAST(c[CAST(k + 1 AS INT)]
                                  - c[CAST(k AS INT)] AS INT))))) AS s
  FROM cuts
),
chunks AS (SELECT doc_id, s.ix AS chunk_ix, s.chunk AS chunk
           FROM ch WHERE s.chunk <> ''),
cnt AS (SELECT chunk, count(*) AS n FROM chunks GROUP BY 1)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE cnt.n > 1) AS BIGINT) AS n_dup_chunks,
       CAST(sum(length(c.chunk)) AS BIGINT) AS n_chars
FROM chunks c JOIN cnt USING (chunk)
GROUP BY c.doc_id
"""


@_q("dedup_cdc_chunk_stats", _CDC_ORACLE)
def dedup_cdc_chunk_stats(spark, sf):
    """Content-defined chunking dedup stats: split every document at
    rolling-context hash boundaries (expected chunk ~64 chars), count
    each document's chunks and how many of them are duplicated anywhere
    in the corpus. The insertion-robust sibling of the fixed-span C4
    dedup — shared text between near-identical documents re-synchronizes
    to identical chunks within ~one window of an edit. Chunking is a
    pure per-row projection (zero shuffle); the dedup count is one
    chunk-keyed aggregation. See curation.cdc_chunks."""
    from betfair_database_spark.operators import curation

    chunks = curation.cdc_chunks(_t(spark, sf, "documents"))
    cnt = chunks.groupBy("chunk").agg(F.count("*").alias("n"))
    return (
        chunks.join(cnt, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count(F.when(F.col("n") > 1, 1)).alias("n_dup_chunks"),
            F.sum(F.length("chunk")).alias("n_chars"),
        )
    )


_ENTROPY_ORACLE = r"""
WITH ch AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) + 1),
                i -> substr(lower(text), CAST(i AS INT), 1))) AS c
  FROM documents WHERE length(text) > 0
),
freq AS (SELECT doc_id, c, count(*) AS f FROM ch GROUP BY 1, 2),
tot AS (SELECT doc_id, sum(f) AS n FROM freq GROUP BY 1)
SELECT f.doc_id,
       CAST(max(t.n) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(-sum((f.f * 1.0 / t.n) * ln(f.f * 1.0 / t.n) / ln(2)), 4)
         AS entropy_bits
FROM freq f JOIN tot t USING (doc_id)
GROUP BY f.doc_id
"""


@_q("text_char_entropy", _ENTROPY_ORACLE)
def text_char_entropy(spark, sf):
    """Per-document character-distribution Shannon entropy (bits) — the
    classic cheap quality signal: binary junk scores high, repetitive
    boilerplate scores low, natural text sits in a narrow band. One
    explode + two doc-keyed aggregations; the alphabet bounds the
    frequency table at ~doc_count x charset."""
    d = _t(spark, sf, "documents").where(F.length("text") > 0)
    ch = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "(?!^)")).alias("c"),
    ).where(F.col("c") != "")
    freq = ch.groupBy("doc_id", "c").agg(F.count("*").alias("f"))
    tot = freq.groupBy("doc_id").agg(F.sum("f").alias("n"))
    p = F.col("f") / F.col("n")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_chars"),
            F.count("*").alias("n_distinct"),
            F.round(
                -F.sum(p * F.log(p) / F.lit(math.log(2.0))), 4
            ).alias("entropy_bits"),
        )
    )


_FRAME_DEDUP_ORACLE = """
WITH base AS (SELECT doc_id, n_chars % 50 + 1 AS n FROM documents),
idx AS (SELECT doc_id, unnest(range(0, n, 4)) AS i FROM base),
cnt AS (SELECT i, count(*) AS c FROM idx GROUP BY i)
SELECT x.doc_id,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(count(*) FILTER (WHERE cnt.c > 1) AS BIGINT) AS n_dup_frames
FROM idx x JOIN cnt USING (i)
GROUP BY x.doc_id
"""


@_q("pipeline_video_frame_dedup", _FRAME_DEDUP_ORACLE)
def pipeline_video_frame_dedup(spark, sf):
    """Cross-video frame dedup over BINARY media columns end to end:
    synthesize AVIs with real movi frame chunks, container-walk +
    every-4th frame sampling (no codec), then dedupe the sampled frames
    corpus-wide by content hash — the multimodal twin of the text dedup
    family (near-identical videos share frame bytes; the hash groupBy
    finds them without decoding). The oracle is the closed form the
    synthetic frames guarantee: frame bytes are a function of the frame
    index, so a sampled frame is duplicated iff >= 2 videos are long
    enough to sample that index."""
    from betfair_database_spark.operators import multimodal

    d = _t(spark, sf, "documents")

    def _make(batches):
        import pandas as pd

        for batch in batches:
            payloads = [
                multimodal.encode_avi_frames(int(s) % 50 + 1, 32)
                for s in batch["n_chars"]
            ]
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"], "payload": payloads}
            )

    media = d.select("doc_id", "n_chars").mapInPandas(
        _make, schema="doc_id long, payload binary"
    )
    fr = multimodal.sample_frames(media, every_n=4).select(
        "doc_id", F.md5(F.col("frame")).alias("h")
    )
    cnt = fr.groupBy("h").agg(F.count("*").alias("c"))
    return (
        fr.join(cnt, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.count(F.when(F.col("c") > 1, 1)).alias("n_dup_frames"),
        )
    )


def _pagerank_oracle(iters: int = 3, damping: float = 0.85) -> str:
    """Unrolled PageRank power iterations over the cohort co-activity
    graph (the triangle row's edge build), rounding ranks to 9 decimals
    per iteration exactly where the Spark operator rounds."""
    head = f"""
WITH slots AS (
  SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS slot
  FROM events WHERE user_id < 1000
),
e AS (
  SELECT a.u AS a, b.u AS b
  FROM slots a JOIN slots b ON a.slot = b.slot AND a.u < b.u
  GROUP BY 1, 2 HAVING count(*) >= 8
),
dirs AS (SELECT a AS src, b AS dst FROM e
         UNION ALL SELECT b AS src, a AS dst FROM e),
deg AS (SELECT src, count(*) AS deg FROM dirs GROUP BY src),
r0 AS (SELECT src AS node, 1.0 AS rank FROM deg)"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(f""",
r{i} AS (
  SELECT bo.dst AS node,
         round({1.0 - damping} + {damping}
               * sum(r.rank / d.deg), 9) AS rank
  FROM dirs bo JOIN deg d ON d.src = bo.src
       JOIN r{i - 1} r ON r.node = bo.src
  GROUP BY bo.dst
)""")
    parts.append(f"""
SELECT node, round(rank, 6) AS rank
FROM r{iters}
ORDER BY rank DESC, node LIMIT 20
""")
    return "".join(parts)


@_q("graph_pagerank_top20", _pagerank_oracle())
def graph_pagerank_top20(spark, sf):
    """Three PageRank power iterations over the bounded-cohort
    co-activity graph (same edge build as graph_triangle_count), top-20
    nodes. Iterative-but-oracle-exact via the unrolled-CTE + pinned
    rounding pattern (kmeans_fit, train_logreg). Per iteration: one
    rank-onto-out-edges join + one destination-keyed sum. See
    graph.pagerank."""
    from betfair_database_spark.operators.graph import pagerank

    ev = _t(spark, sf, "events").where(F.col("user_id") < 1000)
    slots = ev.select(
        F.col("user_id").alias("u"),
        F.date_trunc("hour", F.col("ts")).alias("slot"),
    ).distinct()
    a = slots.select(F.col("u").alias("a"), "slot")
    b = slots.select(F.col("u").alias("b"), "slot")
    # broadcast the b-side slots frame (cohort-bounded: <=1000 users x
    # the fixed hour grid) — BHJ on slot instead of shuffling both sides
    edges = (
        a.join(F.broadcast(b), "slot")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= 8)
        .select("a", "b")
    )
    # broadcast_ranks: one row per cohort node — bounded, see pagerank doc
    ranks = pagerank(edges, iters=3, broadcast_ranks=True)
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy(F.desc("rank"), F.asc("node")).limit(20)


_CDC_REWRITE_ORACLE = r"""
WITH d AS (
  SELECT doc_id, lower(text) AS lt FROM documents WHERE length(text) > 0
),
cuts AS (
  SELECT doc_id, lt,
         list_concat(list_concat(
           [CAST(1 AS BIGINT)],
           list_filter(range(2, greatest(length(lt) - 15 + 1, 2)),
             i -> CAST('0x' || substr(md5(substr(lt, CAST(i AS INT), 16)),
                       1, 8) AS BIGINT) % 64 = 0)),
           [CAST(length(lt) + 1 AS BIGINT)]) AS c
  FROM d
),
ch AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(c)),
           k -> struct_pack(
             ix := k - 1,
             chunk := substr(lt, CAST(c[CAST(k AS INT)] AS INT),
                             CAST(c[CAST(k + 1 AS INT)]
                                  - c[CAST(k AS INT)] AS INT))))) AS s
  FROM cuts
),
chunks AS (SELECT doc_id, s.ix AS chunk_ix, s.chunk AS chunk
           FROM ch WHERE s.chunk <> ''),
keep AS (
  SELECT doc_id, chunk_ix, chunk,
         row_number() OVER (PARTITION BY md5(chunk)
                            ORDER BY doc_id, chunk_ix) AS rn
  FROM chunks
)
SELECT k.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       md5(string_agg(CASE WHEN rn = 1 THEN chunk ELSE '' END, ''
                      ORDER BY chunk_ix)) AS rewrite_md5
FROM keep k
GROUP BY k.doc_id
"""


@_q("dedup_cdc_rewrite", _CDC_REWRITE_ORACLE)
def dedup_cdc_rewrite(spark, sf):
    """CDC-based corpus rewrite: drop every content-defined chunk that
    already occurred earlier in the corpus (first occurrence in
    (doc_id, chunk_ix) order wins) and reassemble what is left of each
    document — span_dedup's rewrite semantics on insertion-robust
    boundaries. The keeper window partitions on md5(chunk) (uniform
    shuffle key regardless of text skew, same trick as span_dedup);
    reassembly is one doc-keyed ordered fold."""
    from pyspark.sql import Window as W

    from betfair_database_spark.operators import curation

    chunks = curation.cdc_chunks(_t(spark, sf, "documents"))
    keep = chunks.select(
        "doc_id",
        "chunk_ix",
        "chunk",
        F.row_number()
        .over(
            W.partitionBy(F.md5("chunk")).orderBy("doc_id", "chunk_ix")
        )
        .alias("rn"),
    )
    return keep.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "chunk_ix",
                                F.when(F.col("rn") == 1, F.col("chunk"))
                                .otherwise(F.lit(""))
                                .alias("chunk"),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                "",
            )
        ).alias("rewrite_md5"),
    )


_CORPUS_DIFF_ORACLE = """
WITH old AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' edited' ELSE text END)
           AS h
  FROM documents WHERE doc_id % 11 <> 3
),
j AS (SELECT o.doc_id AS od, o.h AS ho, n.doc_id AS nd, n.h AS hn
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
SELECT CAST(count(*) FILTER (WHERE ho IS NULL) AS BIGINT) AS n_added,
       CAST(count(*) FILTER (WHERE hn IS NULL) AS BIGINT) AS n_removed,
       CAST(count(*) FILTER (WHERE ho IS NOT NULL AND hn IS NOT NULL
                             AND ho <> hn) AS BIGINT) AS n_modified,
       CAST(count(*) FILTER (WHERE ho = hn) AS BIGINT) AS n_unchanged
FROM j
"""


@_q("curation_corpus_diff", _CORPUS_DIFF_ORACLE)
def curation_corpus_diff(spark, sf):
    """Snapshot diff between two corpus versions derived deterministically
    from the documents table (v1 drops every 7th doc; v2 drops every
    11th-mod-3 and edits every 5th) — added/removed/modified/unchanged
    counts from one (id, hash) full-outer join. See
    curation.corpus_diff."""
    from betfair_database_spark.operators import curation

    d = _t(spark, sf, "documents")
    old = d.where(F.col("doc_id") % 7 != 0)
    new = d.where(F.col("doc_id") % 11 != 3).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" edited"))
        ).otherwise(F.col("text")),
    )
    return curation.corpus_diff(old, new)


_WATERFILL_ORACLE = r"""
WITH sup AS (
  SELECT source,
         CAST(sum(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END) AS BIGINT) AS supply
  FROM documents GROUP BY source
),
tot AS (SELECT sum(supply) AS total, count(*) AS m,
               CAST(sum(supply) * 6 // 10 AS BIGINT) AS b FROM sup),
rk AS (
  SELECT source, supply,
         row_number() OVER (ORDER BY supply, source) AS j,
         coalesce(sum(supply) OVER (ORDER BY supply, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
         coalesce(lag(supply) OVER (ORDER BY supply, source), 0) AS prev
  FROM sup
),
cand AS (
  SELECT (tot.b - rk.prefix) // (tot.m - rk.j + 1) AS lam,
         rk.prev, rk.supply
  FROM rk, tot
),
lev AS (SELECT max(lam) AS level FROM cand
        WHERE lam >= prev AND lam < supply)
SELECT s.source, s.supply,
       CAST(CASE WHEN tot.total <= tot.b THEN s.supply
            ELSE least(s.supply, coalesce(lev.level, 0)) END AS BIGINT)
         AS allocation
FROM sup s, tot, lev
"""


@_q("sample_waterfill_budget", _WATERFILL_ORACLE)
def sample_waterfill_budget(spark, sf):
    """Water-filling token-budget allocation across sources (budget =
    60% of total supply): small sources taken whole, large ones capped
    at the common integer level — the training-mix planner. All
    arithmetic integer, so cross-engine bit-exact; the global sort
    window runs on the per-source table (bounded frame, plan-guarded).
    See sampling.waterfill_budget."""
    from betfair_database_spark.operators import sampling

    sup = (
        _t(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.sum(textstats.token_count(F.col("text")).cast("long")).alias(
                "supply"
            )
        )
    )
    tot = sup.agg(
        F.expr("(sum(supply) * 6) div 10").cast("long").alias("budget")
    )
    supplied = sup.join(F.broadcast(tot))
    return sampling.waterfill_budget(supplied)
