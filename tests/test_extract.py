from __future__ import annotations

from pargraph_spark.functions.extract import extract_text_and_links
from pargraph_spark.functions.urlnorm import normalize_url


def test_extract_basic():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b'<body><p>Hello  world</p><a href="http://a.example/x">link</a>'
        b'<a href="/rel">rel</a><a>no href</a></body></html>'
    )
    text, links = extract_text_and_links(html)
    assert text == "Hello world link rel no href"
    assert links == ["http://a.example/x", "/rel"]


def test_extract_skips_script_style():
    text, links = extract_text_and_links(
        b"<body><style>.c{}</style><script>bad()</script>ok</body>"
    )
    assert text == "ok"
    assert links == []


def test_extract_entities_and_unicode():
    text, _ = extract_text_and_links("(&amp;) café".encode("utf-8"))
    assert text == "(&) café"


def test_extract_bad_utf8_replaced_deterministically():
    t1, _ = extract_text_and_links(b"<body>ab\xff\xfecd</body>")
    t2, _ = extract_text_and_links(b"<body>ab\xff\xfecd</body>")
    assert t1 == t2
    assert "ab" in t1 and "cd" in t1


def test_extract_none_and_empty():
    assert extract_text_and_links(None) == ("", [])
    assert extract_text_and_links(b"") == ("", [])


def test_normalize_url():
    base = "http://SiteA.Example/p/3"
    assert normalize_url("/p/7", base) == "http://sitea.example/p/7"
    assert normalize_url("../p/7", base) == "http://sitea.example/p/7"
    assert normalize_url("HTTP://B.example:80/x#frag", base) == "http://b.example/x"
    assert normalize_url("https://b.example:443/", base) == "https://b.example/"
    assert normalize_url("http://b.example", base) == "http://b.example/"
    assert normalize_url("http://b.example/x?q=1#f", base) == "http://b.example/x?q=1"
    assert normalize_url("mailto:x@y.z", base) is None
    assert normalize_url("javascript:void(0)", base) is None
    assert normalize_url("", base) is None
    assert normalize_url(None, base) is None
