"""URL normalization + domain extraction — web-corpus curation columns.

Training-data pipelines dedupe and filter by URL/domain before content
dedup (same page fetched twice, tracking-param variants, domain
blocklists). Pure Column expressions over ``parse_url`` — JVM-side,
codegen-friendly, no UDFs: at 100 TB this is a narrow map.

Normalization contract (each rule mirrors what web-crawl pipelines do):
- scheme and host lowercased; path case preserved,
- fragment dropped,
- default ports dropped (http:80, https:443), explicit others kept,
- trailing slashes stripped from the path,
- ``utm_*`` tracking params dropped, remaining params sorted (byte
  order) so param order never distinguishes identical resources.

``url_domain`` lowercases the host and strips one leading ``www.`` — the
blocklist/grouping key.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _part(url: Column, part: str) -> Column:
    return F.parse_url(url, F.lit(part))


def url_normalize(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    proto = F.lower(_part(u, "PROTOCOL"))
    auth = F.coalesce(_part(u, "AUTHORITY"), F.lit(""))
    host = F.lower(F.coalesce(_part(u, "HOST"), F.lit("")))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default = ((proto == "http") & (port == "80")) | (
        (proto == "https") & (port == "443")
    )
    portpart = F.when(
        (port != "") & ~default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_replace(
        F.coalesce(_part(u, "PATH"), F.lit("")), r"/+$", ""
    )
    query = F.coalesce(_part(u, "QUERY"), F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~F.lower(p).startswith("utm_"),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(proto, F.lit("://"), host, portpart, path, qpart)


def url_domain(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.coalesce(_part(u, "HOST"), F.lit("")))
    return F.regexp_replace(host, r"^www\.", "")
