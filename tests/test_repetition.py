from __future__ import annotations

import re
from collections import Counter

from pargraph_spark.operators.repetition import (
    repetition_filter,
    repetition_stats,
)


def _norm_tokens(text):
    t = re.sub(r"\s+", " ", (text or "").strip()).lower()
    return t.split(" ") if t else []


def _py_stats(text, ngram=2):
    lines = [ln.strip() for ln in (text or "").split("\n")]
    lines = [ln for ln in lines if ln]
    nl, ndl = len(lines), len(set(lines))
    lc = Counter(lines)
    chars = sum(len(ln) * c for ln, c in lc.items())
    dupchars = sum(len(ln) * (c - 1) for ln, c in lc.items())
    toks = _norm_tokens(text)
    grams = [
        " ".join(toks[i : i + ngram]) for i in range(len(toks) - ngram + 1)
    ] if len(toks) >= ngram else []
    gc = Counter(grams)
    tchars = sum(len(t) for t in toks)
    if gc:
        top = min((g for g, c in gc.items() if c == max(gc.values())))
        # token chars only (no separator spaces), clamped at 1
        tfrac = (
            min(1.0, gc[top] * (len(top) - (ngram - 1)) / tchars)
            if tchars else 0.0
        )
    else:
        top, tfrac = None, 0.0
    return {
        "n_lines": nl,
        "dup_line_frac": (nl - ndl) / nl if nl else 0.0,
        "dup_line_char_frac": dupchars / chars if chars else 0.0,
        "top_ngram": top,
        "top_ngram_char_frac": tfrac,
    }


DOCS = [
    (1, "buy now\nbuy now\nbuy now\ngreat product"),
    (2, "a quiet page\nwith distinct lines\nand varied words here"),
    (3, "spam spam spam spam spam"),
    (4, ""),
    (5, None),
    (6, "one"),  # fewer tokens than the n-gram size
]


def test_repetition_stats_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    for i, text in DOCS:
        ref = _py_stats(text)
        g = got[i]
        for k in ("n_lines", "top_ngram"):
            assert g[k] == ref[k], (i, k, g, ref)
        for k in ("dup_line_frac", "dup_line_char_frac", "top_ngram_char_frac"):
            assert g[k] == ref[k], (i, k, g, ref)  # single exact division


def test_repetition_filter_gopher_rules(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    kept = {r["id"] for r in repetition_filter(df).collect()}
    # 1: 3/4 duplicate lines -> dropped; 3: one 2-gram covers nearly all
    # chars -> dropped; clean/empty docs kept
    assert 2 in kept and 4 in kept and 5 in kept
    assert 1 not in kept and 3 not in kept
