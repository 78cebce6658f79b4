"""URL normalization / domain extraction (functions/url.py contract)."""

from pyspark.sql import functions as F

from rag_content_spark.functions.url import url_domain, url_normalize


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    rows = df.select(
        url_normalize("u").alias("n"), url_domain("u").alias("d")
    ).collect()
    return [(r["n"], r["d"]) for r in rows]


def test_normalization_rules(spark):
    got = _norm(
        spark,
        [
            # lowercase scheme+host, default port dropped, fragment gone,
            # trailing slash stripped, utm_* dropped, params sorted
            "HTTPS://Ex.COM:443/Docs/A/?utm_source=f&b=2&a=1#frag",
            # http:80 dropped, no query
            "http://ex.com:80/docs/x",
            # explicit non-default port kept; param order canonicalized
            "http://ex.com:8080/api?z=1&a=2",
            # www. stripped from domain but kept in url host
            "https://www.Ex.com/path/",
        ],
    )
    assert got == [
        ("https://ex.com/Docs/A?a=1&b=2", "ex.com"),
        ("http://ex.com/docs/x", "ex.com"),
        ("http://ex.com:8080/api?a=2&z=1", "ex.com"),
        ("https://www.ex.com/path", "ex.com"),
    ]


def test_idempotent(spark):
    urls = ["HTTPS://Ex.COM:443/D/?b=2&a=1#f", "http://a.b.c:8080/x?q=1"]
    once = [n for n, _ in _norm(spark, urls)]
    twice = [n for n, _ in _norm(spark, once)]
    assert once == twice


def test_normalize_text_folds_accents_case_whitespace(spark):
    from rag_content_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Héllo   Wörld\t"), (2, "hello world"), (3, "ÀÉÎÕÜ ç ñ")],
        ["id", "t"],
    )
    got = {r["id"]: r["n"] for r in df.select("id", normalize_text("t").alias("n")).collect()}
    assert got[1] == "hello world"
    assert got[1] == got[2]
    assert got[3] == "aeiou c n"


def test_markdown_to_text_strips_markup(spark):
    from rag_content_spark.functions.text import markdown_to_text

    md = (
        "# Title\n"
        "**bold** and *ital* and [anchor](http://x) and `code` "
        "and ![alt](img.png)\n"
        "## Sub heading\n"
        "plain line"
    )
    df = spark.createDataFrame([(1, md)], ["id", "t"])
    out = df.select(markdown_to_text("t").alias("p")).collect()[0]["p"]
    assert out == (
        "Title\nbold and ital and anchor and code and alt\n"
        "Sub heading\nplain line"
    )
