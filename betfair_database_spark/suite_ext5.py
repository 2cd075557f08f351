"""Suite extension 5: tokenizer-training and corpus-rewrite operators —
C4-style duplicate-span removal (the sibling of document-level dedup that
operates INSIDE documents) and byte-pair-encoding merge training (the first
merges of a BPE tokenizer, learned distributively from the corpus).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``; same
hash-matching conventions as ``suite.py``.
"""

from __future__ import annotations

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


def _bpe_oracle(iters: int = 3) -> str:
    """Unrolled DuckDB twin of textstats.bpe_merge_steps: the same
    spaced-string representation, the same ``replace`` merge (identical
    leftmost-non-overlapping semantics in both engines), one CTE trio
    (pairs -> top-1 -> rewritten corpus) per iteration."""
    parts = [
        r"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    wf AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok
      WHERE w <> '' GROUP BY w
    ),
    s0 AS (
      SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS s, f FROM wf
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
        if it < iters:
            parts.append(
                f"""
    , s{it} AS (
      SELECT replace(s, ' ' || t{it}.a || ' ' || t{it}.b || ' ',
                        ' ' || t{it}.a || t{it}.b || ' ') AS s, f
      FROM {prev}, t{it}
    )"""
            )
    selects = [
        f"SELECT CAST({it} AS BIGINT) AS it, a AS sym_a, b AS sym_b,"
        f" c AS pair_count FROM t{it}"
        for it in range(1, iters + 1)
    ]
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


@_q("text_bpe_top_merges", _bpe_oracle(3))
def text_bpe_top_merges(spark, sf):
    """First 3 BPE tokenizer merges learned from the corpus (pair merged
    per iteration + its corpus-weighted count). The corpus is scanned once
    for the word-frequency table; each merge step is a map + hash agg over
    the Heaps'-bounded distinct-word table — see textstats.bpe_merge_steps."""
    return textstats.bpe_merge_steps(_t(spark, sf, "documents"), iters=3)
