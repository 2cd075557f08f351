"""Training-data curation operators (SURVEY §2.11): PII redaction,
benchmark decontamination, repetition scoring.

These are the standard scrubbing stages of an LLM data pipeline, each built
as pure Column expressions or broadcast-bounded joins so they hold at
100 TB:

  - PII redaction: chained ``regexp_replace`` — whole-stage codegen, zero
    shuffle, streams through the corpus once. Patterns are RE2-compatible
    (no backreferences/lookaround) so the DuckDB oracle evaluates the
    identical regexes.
  - Decontamination: training docs sharing an n-gram with a benchmark set.
    The benchmark n-gram set is tiny relative to the corpus → broadcast
    inner join against per-doc distinct n-grams; the corpus never shuffles.
    (At extreme scale, swap the broadcast for a bloom filter of benchmark
    n-grams pushed into the scan.)
  - Repetition score: Gopher-style most-frequent-bigram fraction per doc,
    computed entirely map-side: build the bigram array, sort it, and count
    the longest equal-run with one ``aggregate`` fold — no explode, no
    shuffle, O(tokens log tokens) per row inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe (works identically in Java regex and DuckDB's RE2):
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-row counts of each PII class (before redaction)."""
    return {
        "n_emails": F.regexp_count(col, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(col, F.lit(PHONE_RE)),
        "n_ips": F.regexp_count(col, F.lit(IPV4_RE)),
    }


def redact_pii(col: Column) -> Column:
    """Replace every email/phone/IPv4 occurrence with a typed placeholder.

    Order matters: emails first (an address contains no phone/IP match but
    redacting IPs first could split a dotted hostname), then IPs, then
    phones.
    """
    out = F.regexp_replace(col, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, IPV4_RE, "[IP]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


def word_ngrams(col: Column, n: int) -> Column:
    """Array of space-joined word n-grams of ``col`` (whitespace tokens).
    Empty array when the doc has fewer than ``n`` tokens (guarded: Spark's
    ``sequence(1, 0)`` would count DOWN and fabricate bogus indices)."""
    words = F.split(col, r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs that share at least one word n-gram with the benchmark set:
    ``(doc_id, n_shared)`` where n_shared counts DISTINCT shared n-grams.

    The benchmark's distinct n-gram set broadcasts; each doc contributes its
    distinct n-grams once. One aggregation shuffle on doc_id, corpus scanned
    once.
    """
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.lower(F.col(text_col)), n)).alias("g")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(F.lower(F.col(text_col)), n))
        ).alias("g"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def top_bigram_run(col: Column) -> Column:
    """Count of the most frequent word bigram, computed without a shuffle:
    sort the bigram array, then fold once counting the longest equal-run."""
    grams = F.array_sort(word_ngrams(col, 2))
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(grams, init, step, lambda acc: acc["best"])


def repetition_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signal: fraction of all word bigrams taken by
    the single most frequent bigram. ``(id, n_bigrams, top_bigram_ratio)``;
    ratio is NULL for docs with <2 tokens. Map-only — no shuffle."""
    grams = word_ngrams(F.lower(F.col(text_col)), 2)
    n = F.size(grams)
    return df.select(
        F.col(id_col),
        n.alias("n_bigrams"),
        F.when(
            n > 0,
            F.round(
                top_bigram_run(F.lower(F.col(text_col))).cast("double") / n, 4
            ),
        ).alias("top_bigram_ratio"),
    )
