from __future__ import annotations

from pargraph_spark.synth import generate_pages_rows, pages_df_local, generate_pages_spark


def test_generator_deterministic():
    a = list(generate_pages_rows(200, seed=42))
    b = list(generate_pages_rows(200, seed=42))
    assert a == b
    c = list(generate_pages_rows(200, seed=7))
    assert a != c


def test_generator_shape_properties():
    rows = list(generate_pages_rows(1000, seed=42))
    urls = [r["url"] for r in rows]
    # ~2% recrawl duplicates
    dups = len(urls) - len(set(urls))
    assert 5 <= dups <= 60
    assert all(r["text"] is None for r in rows)
    assert all(isinstance(r["html"], bytes) for r in rows)
    langs = {r["lang"] for r in rows}
    assert "en" in langs


def test_spark_generation_matches_driver(spark):
    n = 300
    driver_rows = sorted(
        ((r["url"], r["warc_ts"], r["html"]) for r in generate_pages_rows(n, seed=42))
    )
    sdf = generate_pages_spark(spark, n, seed=42, num_partitions=5)
    spark_rows = sorted(
        (r["url"], r["warc_ts"], r["html"]) for r in sdf.collect()
    )
    assert spark_rows == driver_rows


def test_pages_df_local_schema(spark):
    df = pages_df_local(spark, 50)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
