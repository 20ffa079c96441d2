

def test_url_template_mining(spark):
    from pyspark.sql import functions as F

    from pargraph_spark.functions.urlnorm import (
        url_template_expr,
        url_templates,
    )

    urls = [
        "https://a.com/post/8412?page=3",
        "http://a.com/post/77?page=12",
        "https://a.com/about",
        "https://b.org/doc/deadbeef01/view",
        "https://b.org/doc/CAFEBABE42/view",
        "https://b.org/u/550e8400-e29b-41d4-a716-446655440000",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["u"]: r["t"]
        for r in df.select(
            F.col("url").alias("u"),
            url_template_expr(F.col("url")).alias("t"),
        ).collect()
    }
    assert got["https://a.com/post/8412?page=3"] == "a.com/post/{n}?page={n}"
    assert got["http://a.com/post/77?page=12"] == "a.com/post/{n}?page={n}"
    assert got["https://a.com/about"] == "a.com/about"
    assert got["https://b.org/doc/deadbeef01/view"] == "b.org/doc/{hex}/view"
    assert got["https://b.org/doc/CAFEBABE42/view"] == "b.org/doc/{hex}/view"
    assert (
        got["https://b.org/u/550e8400-e29b-41d4-a716-446655440000"]
        == "b.org/u/{uuid}"
    )
    roll = {
        (r["template"], r["host"]): r["n_pages"]
        for r in url_templates(df, min_pages=2).collect()
    }
    assert roll == {
        ("a.com/post/{n}?page={n}", "a.com"): 2,
        ("b.org/doc/{hex}/view", "b.org"): 2,
    }
