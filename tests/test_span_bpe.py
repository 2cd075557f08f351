"""Property tests: span dedup and BPE merge training vs pure-Python
references (same keeper/tie-break/replace semantics, reimplemented
independently with dicts and str.replace)."""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.sampled_from(["aa", "ab", "ba", "abab", "b", "q"]), min_size=0, max_size=10
)


def _py_span_dedup(docs: list[tuple[int, str]], w: int):
    spans = []
    for d, text in sorted(docs):
        toks = text.strip().split()
        if text.strip() == "":
            continue
        for ix in range((len(toks) + w - 1) // w):
            seg = toks[ix * w : (ix + 1) * w]
            spans.append((d, ix, " ".join(seg), len(seg)))
    first: dict[str, tuple[int, int]] = {}
    for d, ix, s, _l in spans:
        if s not in first or (d, ix) < first[s]:
            first[s] = (d, ix)
    out = {}
    for d, _text in docs:
        mine = [sp for sp in spans if sp[0] == d]
        if not mine:
            continue
        kept = [sp for sp in mine if first[sp[2]] == (sp[0], sp[1])]
        joined = " ".join(s for _d, _ix, s, _l in kept)
        out[d] = (
            len(mine),
            len(kept),
            sum(l for *_x, l in kept),
            hashlib.md5(joined.encode()).hexdigest() if kept else None,
        )
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_words, min_size=1, max_size=6), st.integers(1, 4))
def test_span_dedup_matches_python(spark, docs, w):
    from betfair_database_spark.operators.curation import span_dedup

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_spans, r.n_kept, r.kept_tokens, r.dedup_md5)
        for r in span_dedup(df, span_tokens=w).collect()
    }
    assert got == _py_span_dedup(rows, w)


def _py_bpe(docs: list[str], iters: int):
    toks = [t for d in docs for t in d.strip().lower().split() if t]
    wf = Counter(toks)
    seqs = [(" " + "".join(c + " " for c in w), f) for w, f in sorted(wf.items())]
    out = []
    for it in range(1, iters + 1):
        pc: Counter = Counter()
        for s, f in seqs:
            t = s.strip().split()
            for i in range(len(t) - 1):
                pc[(t[i], t[i + 1])] += f
        if not pc:
            return out
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((it, a, b, c))
        seqs = [
            (s.replace(f" {a} {b} ", f" {a}{b} "), f) for s, f in seqs
        ]
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_words, min_size=1, max_size=5))
def test_bpe_merges_matches_python(spark, docs):
    from betfair_database_spark.operators.textstats import bpe_merge_steps

    texts = [" ".join(ws) for ws in docs]
    expected = _py_bpe(texts, 3)
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        (r.it, r.sym_a, r.sym_b, r.pair_count)
        for r in bpe_merge_steps(df, iters=3).orderBy("it").collect()
    ]
    assert got == expected


def _py_bpe_apply(docs: list[str], iters: int):
    toks = [t for d in docs for t in d.strip().lower().split() if t]
    wf = Counter(toks)
    seqs = {w: " " + "".join(c + " " for c in w) for w in wf}
    for _it in range(iters):
        pc: Counter = Counter()
        for w, s in seqs.items():
            t = s.strip().split()
            for i in range(len(t) - 1):
                pc[(t[i], t[i + 1])] += wf[w]
        if not pc:
            continue  # no pair anywhere: sequences stay as-is
        (a, b), _c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        seqs = {w: s.replace(f" {a} {b} ", f" {a}{b} ") for w, s in seqs.items()}
    nsym = {w: len(s.strip().split()) for w, s in seqs.items()}
    out: dict[int, tuple[int, int]] = {}
    for i, d in enumerate(docs):
        ws = [t for t in d.strip().lower().split() if t]
        if ws:
            out[i] = (len(ws), sum(nsym[w] for w in ws))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_words, min_size=1, max_size=5))
def test_bpe_apply_counts_matches_python(spark, docs):
    from betfair_database_spark.operators.textstats import bpe_apply_counts

    texts = [" ".join(ws) for ws in docs]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_apply_counts(df, iters=3).collect()
    }
    assert got == _py_bpe_apply(texts, 3)


def test_span_dedup_deterministic_under_repartition(spark):
    """The keeper choice and reassembled text are pure functions of the
    data — identical under any partitioning (the window orders on
    (doc_id, span_ix), never on arrival order)."""
    from betfair_database_spark.operators.curation import span_dedup

    rows = [(i, " ".join(["tok%d" % (j % 7) for j in range(i + 3)])) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, span_dedup(df, span_tokens=3).collect()))
    b = sorted(map(tuple, span_dedup(df.repartition(13), span_tokens=3).collect()))
    assert a == b
