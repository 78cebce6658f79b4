"""robots.txt parse + URL-allow filter (operators/robots.py)."""

from pyspark.sql import functions as F

ROBOTS = """# crawl policy
User-agent: googlebot
Disallow: /google-only

User-agent: *
Disallow: /tmp/
Allow: /tmp/public
Disallow:
Crawl-delay: 10

User-agent: other
Disallow: /
"""


def test_parse_robots_rules_star_section_only(spark):
    from rag_content_spark.operators.robots import parse_robots_rules

    df = spark.createDataFrame([("a.com", ROBOTS)], ["domain", "robots_txt"])
    rules = {(r["allow"], r["prefix"]) for r in parse_robots_rules(df).collect()}
    # only the * section; empty Disallow and Crawl-delay dropped
    assert rules == {(False, "/tmp/"), (True, "/tmp/public")}


def test_parse_robots_no_star_section_yields_no_rules(spark):
    from rag_content_spark.operators.robots import parse_robots_rules

    df = spark.createDataFrame(
        [("b.com", "User-agent: googlebot\nDisallow: /x")],
        ["domain", "robots_txt"],
    )
    assert parse_robots_rules(df).count() == 0


def test_filter_allowed_urls_longest_match_and_tiebreak(spark):
    from rag_content_spark.operators.robots import (
        filter_allowed_urls,
        parse_robots_rules,
    )

    robots = spark.createDataFrame([("a.com", ROBOTS)], ["domain", "robots_txt"])
    rules = parse_robots_rules(robots)
    urls = spark.createDataFrame(
        [
            ("a.com", "/tmp/secret"),        # matches /tmp/ -> disallow
            ("a.com", "/tmp/public/doc"),    # longer Allow wins
            ("a.com", "/home"),              # no rule -> allowed
            ("norobots.com", "/anything"),   # no robots -> allowed
        ],
        ["domain", "path"],
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in filter_allowed_urls(urls, rules).collect()
    }
    assert got[("a.com", "/tmp/secret")] is False
    assert got[("a.com", "/tmp/public/doc")] is True
    assert got[("a.com", "/home")] is True
    assert got[("norobots.com", "/anything")] is True


def test_allow_beats_disallow_on_equal_length(spark):
    from rag_content_spark.operators.robots import filter_allowed_urls

    rules = spark.createDataFrame(
        [("a.com", True, "/p"), ("a.com", False, "/p")],
        ["domain", "allow", "prefix"],
    )
    urls = spark.createDataFrame([("a.com", "/page")], ["domain", "path"])
    assert filter_allowed_urls(urls, rules).collect()[0]["allowed"] is True


def test_filter_allowed_urls_plan_broadcasts_rules(spark):
    """Plan guard: the rules side (domains-sized) must broadcast."""
    from rag_content_spark.operators.robots import filter_allowed_urls

    rules = spark.createDataFrame(
        [("a.com", False, "/tmp/")], ["domain", "allow", "prefix"]
    )
    urls = spark.createDataFrame([("a.com", "/tmp/x")], ["domain", "path"])
    plan = (
        filter_allowed_urls(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
