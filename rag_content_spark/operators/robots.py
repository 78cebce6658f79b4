"""robots.txt parsing and URL-allow filtering — the crawl-politeness
gate a web-scale ingest runs between frontier and fetch (and that
post-hoc corpus audits re-run on archived crawls).

Supported subset (documented, deterministic): the ``User-agent: *``
section, plain-prefix ``Allow``/``Disallow`` rules (the original 1994
spec — no ``*``/``$`` wildcards), longest-prefix-match wins with Allow
beating Disallow on ties (the Google REP tie-break). The section ends
at the next ``User-agent`` line; consecutive-agent grouping beyond
``*`` is out of scope.

Everything is narrow Column expressions + one rules explode + one
domain join — no UDFs, both engines (Spark / DuckDB oracle) parse the
same bytes identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _kv_lines(text_col: Column) -> Column:
    """lines -> array<struct<k,v>>: k = lowercased directive, v = the
    trimmed remainder after the first ':' (comments stripped)."""
    lines = F.split(text_col, "\n")
    return F.transform(
        lines,
        lambda l: F.struct(
            F.lower(F.trim(F.substring_index(l, ":", 1))).alias("k"),
            # remainder after the first ':' ('' when the line has no
            # colon — a bare 'allow' line must NOT become a rule);
            # '#' comments stripped
            F.when(
                l.contains(":"),
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(l, r"^[^:]*:", ""), r"#.*$", ""
                    )
                ),
            )
            .otherwise("")
            .alias("v"),
        ),
    )


def parse_robots_rules(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(domain, allow boolean, prefix) — the ``User-agent: *`` section's
    Allow/Disallow prefix rules. Empty-value ``Disallow:`` (allow all)
    is dropped — it is the no-op rule."""
    kv = _kv_lines(F.col(text_col))
    # 1-based index of the 'user-agent: *' line, and of the NEXT
    # 'user-agent' line after it (section end)
    idx = F.filter(
        F.transform(
            kv, lambda s, i: F.when((s["k"] == "user-agent") & (s["v"] == "*"), i + 1)
        ),
        lambda x: x.isNotNull(),
    )
    # F.get (0-based) returns NULL past the end — element_at THROWS
    # under ANSI mode on a robots file with no '*' section
    start = F.get(idx, 0)
    after = F.filter(
        F.transform(
            kv,
            lambda s, i: F.when(
                (s["k"] == "user-agent") & (i + 1 > start), i + 1
            ),
        ),
        lambda x: x.isNotNull(),
    )
    end = F.coalesce(F.get(after, 0), F.size(kv) + 1)
    section = F.slice(kv, start + 1, F.greatest(end - start - 1, F.lit(0)))
    rules = F.filter(
        section,
        lambda s: s["k"].isin("allow", "disallow") & (s["v"] != ""),
    )
    return (
        robots.select(
            F.col(domain_col).alias("domain"), rules.alias("_rules")
        )
        .filter(F.col("_rules").isNotNull())
        .select("domain", F.explode("_rules").alias("_r"))
        .select(
            "domain",
            (F.col("_r.k") == "allow").alias("allow"),
            F.col("_r.v").alias("prefix"),
        )
    )


def filter_allowed_urls(
    urls: DataFrame,
    rules: DataFrame,
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Adds ``allowed`` per URL row: longest matching prefix decides,
    Allow wins length ties, no matching rule (or no robots at all)
    means allowed.

    Shape: one equi-join on domain filtered to matching prefixes (a
    domain's rule list is small — tens of rows — so the join fans out
    per matching rule, then a map-side-combining max_by collapses it),
    then a left join back. The rules side of a real crawl is
    domains-sized: broadcast it.
    """
    matched = (
        urls.select(domain_col, path_col)
        .join(F.broadcast(rules), on=domain_col)
        .filter(F.col(path_col).startswith(F.col("prefix")))
        .groupBy(domain_col, path_col)
        .agg(
            # (length, allow) ordering packed into one integer: lengths
            # dominate, allow breaks exact-length ties — equal keys
            # imply equal verdicts, so max_by tie choice is immaterial
            F.max_by(
                F.col("allow"),
                F.length("prefix") * 2 + F.col("allow").cast("int"),
            ).alias("_verdict")
        )
    )
    return urls.join(matched, on=[domain_col, path_col], how="left").withColumn(
        "allowed", F.coalesce(F.col("_verdict"), F.lit(True))
    ).drop("_verdict")
