from __future__ import annotations

import hashlib
from collections import Counter

from pargraph_spark.operators.spans import (
    ngram_spans,
    repeated_spans,
    span_dup_stats,
)

BOILER = "all rights reserved contact us for details"


def _docs():
    return [
        (1, f"alpha beta gamma delta {BOILER} epsilon zeta"),
        (2, f"one two three {BOILER} four five six seven"),
        (3, "completely unrelated text with no repeats at all here"),
        (4, f"{BOILER} and nothing else"),
        (5, "short doc"),
        (6, None),
        (7, "  Mixed   CASE    whitespace   mixed case whitespace  "),
    ]


def _norm_tokens(text):
    if text is None:
        return []
    t = " ".join(text.strip().split()).lower()
    return t.split(" ") if t else []


def _spans_oracle(docs, n):
    out = []
    for doc_id, text in docs:
        toks = _norm_tokens(text)
        for i in range(len(toks) - n + 1):
            key = hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
            out.append((doc_id, i + 1, key))
    return out


def test_ngram_spans_match_oracle(spark):
    n = 4
    df = spark.createDataFrame(_docs(), "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["pos"], r["span"]) for r in ngram_spans(df, n=n).collect()
    )
    assert got == sorted(_spans_oracle(_docs(), n))


def test_repeated_spans_finds_boilerplate(spark):
    n = 4
    df = spark.createDataFrame(_docs(), "doc_id long, text string")
    got = {
        r["span"]: (r["n_occurrences"], r["n_docs"])
        for r in repeated_spans(df, n=n).collect()
    }
    cnt = Counter(k for _, _, k in _spans_oracle(_docs(), n))
    docs_per = Counter()
    for key, c in Counter(
        {(d, k) for d, _, k in _spans_oracle(_docs(), n)}
    ).items():
        docs_per[key[1]] += 1
    want = {
        k: (c, docs_per[k]) for k, c in cnt.items() if c >= 2
    }
    assert got == want
    # every window fully inside BOILER is repeated across docs 1, 2, 4
    btoks = BOILER.split()
    for i in range(len(btoks) - n + 1):
        key = hashlib.md5(" ".join(btoks[i : i + n]).encode()).hexdigest()
        assert got[key][1] == 3


def test_span_dup_stats(spark):
    n = 4
    df = spark.createDataFrame(_docs(), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_frac"])
        for r in span_dup_stats(df, n=n).collect()
    }
    cnt = Counter(k for _, _, k in _spans_oracle(_docs(), n))
    for doc_id, text in _docs():
        spans = [k for d, _, k in _spans_oracle([(doc_id, text)], n)]
        nd = sum(1 for k in spans if cnt[k] >= 2)
        want_frac = nd / len(spans) if spans else 0.0
        assert got[doc_id] == (len(spans), nd, want_frac), doc_id
    # doc 3 is clean, doc 4 is pure boilerplate
    assert got[3][1] == 0
    assert got[4][2] > 0.4
    # short/None docs: zero spans, zero fraction
    assert got[5] == (0, 0, 0.0)
    assert got[6] == (0, 0, 0.0)
