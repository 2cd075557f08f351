"""Suite extension 6: web-corpus curation operators — per-domain capping
(the RefinedWeb/FineWeb step that stops one domain from dominating a
crawl) and fastText-style hashed linear classifier inference (the
standard quality-filter shape).

Registered into :data:`betfair_database_spark.suite.SUITE` via ``_q``;
same hash-matching conventions as ``suite.py``.
"""

from __future__ import annotations

from betfair_database_spark.operators import sampling, textstats
from betfair_database_spark.suite import _q, _t

_DOMAIN_CAP_ORACLE = """
WITH rk AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM rk WHERE rk <= 40
"""


@_q("sample_domain_cap", _DOMAIN_CAP_ORACLE)
def sample_domain_cap(spark, sf):
    """Keep at most 40 documents per source, preferring the longest
    (n_chars as the quality proxy; ties on doc_id). One domain-keyed
    shuffle; the window partitions by domain so no task ever sees more
    than one domain's rows. See sampling.domain_cap."""
    return sampling.domain_cap(
        _t(spark, sf, "documents").select("doc_id", "source", "n_chars"),
        cap=40,
        quality_col="n_chars",
    )


# int(first 8 hex chars of md5) in pure ANSI-ish SQL (DuckDB has no
# hex->int cast): positional digit expansion over strpos
_HEX8 = " + ".join(
    f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)

_CLASSIFIER_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
  FROM documents
),
tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
hx AS (SELECT doc_id, substr(md5(tok), 1, 8) AS h FROM tok2),
wt AS (
  SELECT doc_id,
         ((({_HEX8}) % 1024) * 2654435761) % 1000003 AS w
  FROM hx
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(w) AS BIGINT) AS wsum
  FROM wt GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(wsum / n_tokens / 1000003.0 - 0.5, 6) AS score,
       CASE WHEN wsum / n_tokens / 1000003.0 - 0.5 > 0
            THEN 'keep' ELSE 'drop' END AS label
FROM agg
"""


@_q("text_classifier_score", _CLASSIFIER_ORACLE)
def text_classifier_score(spark, sf):
    """Hashed bag-of-words linear classifier inference over every
    document: md5-bucketed features, integer weight table (exact
    aggregation — no floating-point order pinning needed), one doc-keyed
    aggregation. See textstats.hashed_classifier_score."""
    return textstats.hashed_classifier_score(_t(spark, sf, "documents"))
