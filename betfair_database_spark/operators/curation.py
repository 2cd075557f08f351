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

from pyspark.sql import Column, DataFrame, Window
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


def word_ngrams_of(words: Column, n: int) -> Column:
    """Array of space-joined n-grams of a PRE-SPLIT token array column.
    Empty array when the doc has fewer than ``n`` tokens (guarded: Spark's
    ``sequence(1, 0)`` would count DOWN and fabricate bogus indices).

    Operators pre-materialize the token array in their own projection and
    call this form: an outer expression referenced inside a higher-order
    lambda is inlined into the lambda body and re-evaluated PER ELEMENT, so
    passing ``split(text)`` directly re-tokenized the whole document once
    per gram — O(tokens^2) per doc, a measured 10x on the corpus scan. A
    separate projection boundary makes the split a per-row column that the
    lambdas merely index (CollapseProject keeps it: the alias is referenced
    more than once, so Catalyst declines to inline it back)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(col: Column, n: int) -> Column:
    """n-grams straight from a text column. The tokenization is bound to a
    lambda VARIABLE via a 1-element outer transform so the split happens
    once per row even without a projection boundary (see word_ngrams_of;
    pre-splitting in a projection is faster still — prefer it in scans)."""
    return F.element_at(
        F.transform(
            F.array(F.split(col, r"\s+")), lambda w: word_ngrams_of(w, n)
        ),
        1,
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
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    bench_grams = (
        benchmark.select(words.alias("_w"))
        .select(F.explode(word_ngrams_of(F.col("_w"), n)).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(F.col(id_col), words.alias("_w")).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams_of(F.col("_w"), n))).alias("g"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def top_bigram_run(col: Column) -> Column:
    """Count of the most frequent word bigram, computed without a shuffle:
    sort the bigram array, then fold once counting the longest equal-run.
    ``col`` is a PRE-SPLIT token array (see word_ngrams_of)."""
    grams = F.array_sort(word_ngrams_of(col, 2))
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


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
) -> DataFrame:
    """C4-style duplicate-span removal: partition every document into
    non-overlapping ``span_tokens``-token spans, keep only the FIRST
    occurrence of each distinct span corpus-wide (ordered by
    ``(doc_id, span_ix)``), and reassemble what is left of each document.

    This is the C4 pipeline's "remove any repeated three-sentence span"
    stage re-expressed for a tokens-only corpus (C4 spans sentences; this
    corpus has no sentence boundaries, so spans are fixed token windows).

    Output per surviving document: ``(id, n_spans, n_kept, kept_tokens,
    dedup_md5)`` where ``dedup_md5`` is the md5 of the reassembled text
    (NULL when every span of the doc was a repeat). Documents with no
    tokens produce no spans and are absent.

    Scale shape: two shuffles total — one on ``md5(span)`` (uniform 128-bit
    key, so no skew regardless of how skewed the text is; the window that
    picks the keeper runs inside that partitioning) and one on the id for
    reassembly. Text bytes flow through exactly once; the span table is the
    corpus re-chunked, not duplicated. An md5 collision would merge two
    unrelated spans — at 2^64 spans that is the standard birthday-bound
    trade every content-addressed dedup makes.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    pre = df.select(F.col(id_col), toks.alias("_w")).where(
        F.trim(F.col(text_col)) != ""
    )
    n_spans_ix = F.sequence(
        F.lit(0), F.ceil(F.size(F.col("_w")) / span_tokens).cast("int") - 1
    )
    spans = pre.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                n_spans_ix,
                lambda i: F.slice(F.col("_w"), i * span_tokens + 1, span_tokens),
            )
        ).alias("span_ix", "_toks"),
    ).select(
        F.col(id_col),
        F.col("span_ix").cast("long").alias("span_ix"),
        F.concat_ws(" ", F.col("_toks")).alias("span_text"),
        F.size(F.col("_toks")).cast("long").alias("span_len"),
    )
    w = Window.partitionBy(F.md5(F.col("span_text"))).orderBy(
        F.col(id_col), F.col("span_ix")
    )
    flagged = spans.withColumn("keep", F.row_number().over(w) == 1)
    kept_text = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("keep"),
                        F.struct(F.col("span_ix"), F.col("span_text")),
                    )
                )
            ),
            lambda s: s["span_text"],
        ),
    )
    n_kept = F.sum(F.col("keep").cast("long"))
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        n_kept.alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("keep"), F.col("span_len"))), F.lit(0)
        ).alias("kept_tokens"),
        F.when(n_kept > 0, F.md5(kept_text)).alias("dedup_md5"),
    )


def repetition_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signal: fraction of all word bigrams taken by
    the single most frequent bigram. ``(id, n_bigrams, top_bigram_ratio)``;
    ratio is NULL for docs with <2 tokens. Map-only — no shuffle."""
    pre = df.select(
        F.col(id_col),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("_w"),
    )
    n = F.size(word_ngrams_of(F.col("_w"), 2))
    return pre.select(
        F.col(id_col),
        n.alias("n_bigrams"),
        F.when(
            n > 0,
            F.round(top_bigram_run(F.col("_w")).cast("double") / n, 4),
        ).alias("top_bigram_ratio"),
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    mask_bits: int = 6,
) -> DataFrame:
    """Content-defined chunking: split each document at positions where
    the hash of the ``window``-char context is 0 mod 2^mask_bits — the
    rsync/CDC boundary rule that makes chunk identity ROBUST TO
    INSERTIONS. Fixed spans (span_dedup) shift every downstream boundary
    when one token is inserted; content-defined boundaries re-synchronize
    within ~window chars, so shared text between near-identical documents
    still yields identical chunks — the primitive behind chunk-level
    corpus dedup and delta storage.

    Boundary hash = first 8 md5 hex chars of the lowercased window (the
    engine-portable hash every operator here uses), giving expected chunk
    length 2^mask_bits. Pure per-row array expressions — zero shuffle, no
    Python; documents shorter than the window are one chunk; empty
    documents yield no rows.

    Output: (id, chunk_ix, chunk) with chunk_ix 0-based in document
    order.
    """
    m = 1 << mask_bits
    lt = F.lower(F.col(text_col))
    pre = df.select(F.col(id_col), lt.alias("_lt")).where(
        F.length("_lt") > 0
    )
    # guard the candidate range: Spark's sequence(2, 1) is DESCENDING,
    # not empty, so short documents must produce array() explicitly
    cuts = F.expr(
        "concat(array(1), "
        f" if(length(_lt) >= {window + 1},"
        f"  filter(sequence(2, length(_lt) - {window - 1}),"
        f"   i -> CAST(conv(substr(md5(substring(_lt, i, {window})), 1, 8),"
        f"   16, 10) AS BIGINT) % {m} = 0),"
        "  array()),"
        " array(length(_lt) + 1))"
    )
    staged = pre.select(F.col(id_col), F.col("_lt"), cuts.alias("_cuts"))
    return (
        staged.select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(_cuts) - 1),"
                    " k -> substring(_lt, _cuts[k - 1],"
                    " _cuts[k] - _cuts[k - 1]))"
                )
            ).alias("chunk_ix", "chunk"),
        )
        .where(F.col("chunk") != "")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-version diff: compare two corpus snapshots by id and
    content hash — the release-engineering primitive behind "what
    changed between data v1 and v2" (additions, removals, in-place
    edits, untouched documents).

    One full-outer join on the id with md5 content fingerprints computed
    in the scan projections; counts are a single aggregation. At scale
    this is one shuffle of (id, 16-byte hash) pairs — text bytes never
    cross the exchange. Returns one row: (n_added, n_removed,
    n_modified, n_unchanged)."""
    o = old.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_ho")
    )
    n = new.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_hn")
    )
    j = o.join(n, "_id", "full_outer")
    return j.agg(
        F.count(F.when(F.col("_ho").isNull(), 1)).alias("n_added"),
        F.count(F.when(F.col("_hn").isNull(), 1)).alias("n_removed"),
        F.count(
            F.when(
                F.col("_ho").isNotNull()
                & F.col("_hn").isNotNull()
                & (F.col("_ho") != F.col("_hn")),
                1,
            )
        ).alias("n_modified"),
        F.count(F.when(F.col("_ho") == F.col("_hn"), 1)).alias(
            "n_unchanged"
        ),
    )


def canonicalize_urls(
    df: DataFrame, url_col: str, out_col: str = "canonical_url"
) -> DataFrame:
    """Canonicalize a URL column for exact dedup — the FineWeb/
    CommonCrawl-style pre-pass that collapses crawl variants of one page
    before any content-level dedup runs (tracking params, case-variant
    hosts and fragments otherwise defeat a URL equality join):

      1. drop the fragment;
      2. lowercase the scheme and host, strip a leading ``www.``;
      3. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``);
      4. SORT the surviving params (order never distinguishes pages);
      5. strip a trailing slash from a non-root path.

    Pure column expressions — regexp splits plus array filter/sort
    higher-order functions; no UDF, stays a projection at any scale.
    Values without a ``scheme://host`` shape pass through unchanged."""
    u = F.col(url_col)
    nofrag = F.substring_index(u, "#", 1)
    base = F.substring_index(nofrag, "?", 1)
    has_q = F.instr(nofrag, "?") > 0
    qstr = F.substring(nofrag, F.instr(nofrag, "?") + 1, F.length(nofrag))
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    host = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/]*)", 1)
    path = F.regexp_extract(
        base, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(/.*)?$", 1
    )
    norm_host = F.regexp_replace(F.lower(host), r"^www\.", "")
    # non-root trailing slash only: "/" stays, "/a/" -> "/a"
    norm_path = F.regexp_replace(path, r"^(/.+)/$", "$1")
    params = F.filter(
        F.split(qstr, "&"),
        lambda prm: (F.length(prm) > 0)
        & ~prm.rlike(r"^(utm_[^=]*|fbclid|gclid)(=|$)"),
    )
    norm_q = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        F.lower(scheme),
        F.lit("://"),
        norm_host,
        norm_path,
        F.when(
            has_q & (F.length(norm_q) > 0), F.concat(F.lit("?"), norm_q)
        ).otherwise(F.lit("")),
    )
    return df.withColumn(
        out_col, F.when(scheme != "", rebuilt).otherwise(u)
    )
