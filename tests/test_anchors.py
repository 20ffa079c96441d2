from __future__ import annotations

from collections import Counter, defaultdict

from pargraph_spark.functions.extract import extract_anchors
from pargraph_spark.functions.urlnorm import normalize_url
from pargraph_spark.operators.anchors import anchor_edges, inbound_anchor_topk

PAGES = [
    ("http://a.com/", "<a href='http://t.com/x'>Widget Co</a> "
                      "<a href='http://t.com/x'>widgets</a>"),
    ("http://b.com/", "<p><a href='/local'>self-site</a>"
                      "<a href='http://t.com/x'>Widget Co</a></p>"),
    ("http://c.com/", "<a href='http://t.com/x'><img src='i.png'></a>"
                      "<a href='http://t.com/y'>other <b>page</b></a>"),
    ("http://d.com/", "<script><a href='http://t.com/x'>hidden</a></script>"
                      "<a href='http://t.com/y'>other page</a>"),
]


def test_extract_anchors_pure_function():
    got = extract_anchors(PAGES[2][1])
    assert got == [("http://t.com/x", ""), ("http://t.com/y", "other page")]
    # script content is CDATA to the parser: the embedded <a> never
    # parses, so no anchor is emitted for it at all
    got = extract_anchors(PAGES[3][1])
    assert got == [("http://t.com/y", "other page")]
    # implicit close: a new <a> ends the open one; EOF ends the last
    got = extract_anchors("<a href=/p>one<a href=/q>two")
    assert got == [("/p", "one"), ("/q", "two")]
    assert extract_anchors(None) == []
    assert extract_anchors(b"<a href='/z'>bytes \xc3\xa9</a>") == [("/z", "bytes é")]


def _oracle_topk(pages, k):
    per_pair = set()
    for url, html in pages:
        for href, text in extract_anchors(html):
            u = normalize_url(href, url)
            if u is None or u == url:
                continue
            per_pair.add((url, u, text))
    counts = Counter((d, a) for _, d, a in per_pair)
    by_dst = defaultdict(list)
    for (d, a), n in counts.items():
        by_dst[d].append((-n, a))
    out = {}
    for d, rows in by_dst.items():
        for rn, (neg_n, a) in enumerate(sorted(rows)[:k], 1):
            out[(d, a)] = (-neg_n, rn)
    return out


def test_inbound_anchor_topk_vs_oracle(spark):
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in PAGES], "url string, html binary"
    )
    got = {
        (r["dst_url"], r["anchor"]): (r["n_pages"], r["rn"])
        for r in inbound_anchor_topk(anchor_edges(df), k=2).collect()
    }
    assert got == _oracle_topk(PAGES, 2)
    # the headline fact: 'Widget Co' tops t.com/x with 2 distinct pages
    # (a.com's duplicate-anchor link counts once; d.com's is in a script)
    assert got[("http://t.com/x", "Widget Co")] == (2, 1)


def test_inbound_anchor_topk_is_window_group_limit(spark):
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in PAGES], "url string, html binary"
    )
    plan = (
        inbound_anchor_topk(anchor_edges(df), k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_anchor_edges_on_synth_pages(spark):
    from pargraph_spark.sources.pages import latest_pages
    from pargraph_spark.synth import generate_pages_spark

    pages = latest_pages(generate_pages_spark(spark, 200, seed=42))
    ae = anchor_edges(pages)
    top = inbound_anchor_topk(ae, k=3)
    rows = top.collect()
    assert len(rows) > 0
    by_dst = defaultdict(list)
    for r in rows:
        by_dst[r["dst_url"]].append(r)
    for d, rs in by_dst.items():
        assert len(rs) <= 3
        ordered = sorted(rs, key=lambda r: r["rn"])
        ns = [r["n_pages"] for r in ordered]
        assert ns == sorted(ns, reverse=True)


def test_extract_anchors_unclosed_anchor_bounded_by_blocks():
    # review r5: an <a> never closed (e.g. opened inside <head>) used to
    # swallow the whole rest of the document as its anchor text
    html = '<head><a href="/x"></head><body><p>Hello world</p><p>etc</p></body>'
    got = extract_anchors(html)
    assert got == [("/x", "")]  # closed at the <body> boundary, empty text
    # inline markup still collects across the anchor
    got2 = extract_anchors('<a href="/y">go <b>here</b> now</a> trailing')
    assert got2 == [("/y", "go here now")]
    # block boundary inside an open anchor closes it
    got3 = extract_anchors('<a href="/z">start<p>not anchor text')
    assert got3 == [("/z", "start")]
