

def test_cooccurrence_edges_brute(spark):
    from collections import Counter

    from pargraph_spark.functions.text import cooccurrence_edges

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat")],
        "doc_id long, text string",
    )
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in cooccurrence_edges(docs, window=2).collect()
    }
    brute = Counter()
    for toks in [
        "the cat sat on the mat".split(), "the dog sat".split()
    ]:
        for i in range(len(toks)):
            for j in range(i + 1, min(i + 2, len(toks) - 1) + 1):
                if toks[i] != toks[j]:
                    brute[tuple(sorted((toks[i], toks[j])))] += 1
    assert got == dict(brute)


def test_textrank_keywords(spark):
    from pargraph_spark.functions.text import textrank_keywords

    # "hub" co-occurs with everything; "rare" appears once at the edge
    docs = spark.createDataFrame(
        [
            (1, "hub alpha beta hub gamma"),
            (2, "hub delta alpha hub beta"),
            (3, "gamma hub delta rare"),
        ],
        "doc_id long, text string",
    )
    out = textrank_keywords(spark, docs, k=3, window=2, iters=8).collect()
    assert [r["rn"] for r in out] == [1, 2, 3]
    assert out[0]["term"] == "hub"
    assert all(r["term"] != "rare" for r in out)
    # deterministic under repartition
    again = textrank_keywords(
        spark, docs.repartition(5), k=3, window=2, iters=8
    ).collect()
    assert [(r["term"], r["score"]) for r in out] == [
        (r["term"], r["score"]) for r in again
    ]


def test_document_keywords_semijoin(spark):
    from pargraph_spark.functions.text import (
        document_keywords,
        textrank_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "hub alpha beta hub gamma"),
            (2, "hub delta alpha hub beta"),
            (3, "gamma hub delta rare"),
        ],
        "doc_id long, text string",
    )
    corpus = textrank_keywords(spark, docs, k=4, window=2, iters=6)
    per_doc = document_keywords(docs, corpus).collect()
    by_doc = {}
    for r in per_doc:
        by_doc.setdefault(r["id"], []).append((r["rn"], r["term"]))
    corpus_terms = {r["term"] for r in corpus.collect()}
    # every doc's keywords are corpus keywords present in that doc
    texts = {1: "hub alpha beta hub gamma", 2: "hub delta alpha hub beta",
             3: "gamma hub delta rare"}
    for doc, kws in by_doc.items():
        terms = [t for _, t in sorted(kws)]
        assert set(terms) == corpus_terms & set(texts[doc].split())
        # rn is 1..m and ordered by corpus score
        assert [rn for rn, _ in sorted(kws)] == list(range(1, len(kws) + 1))
