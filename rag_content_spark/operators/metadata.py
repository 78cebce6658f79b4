"""Document metadata population (P1, reference metadata_processor.py:85-117).

Per document derive:
- ``docs_url``      : frontmatter url ▸ url_function(file_path) (default =
                      basename, reference metadata_processor.py:125-135)
- ``title``         : frontmatter title ▸ first line stripped of '# '
                      (reference metadata_processor.py:44-57)
- ``url_reachable`` : HTTP GET with retries — or constant True under
                      hermetic builds (reference metadata_processor.py:104-117)

Scale notes (improving on the reference, which pings every file's URL
sequentially with 3×30 s budgets): reachability runs over DISTINCT urls
only (dropDuplicates → mapPartitions with one shared Session per
partition → broadcast join back). The reference pings once per file even
when thousands of files share a URL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from rag_content_spark.functions.text import (
    basename,
    first_line_title,
    frontmatter_field,
)


def populate_metadata(
    df: DataFrame,
    path_col: str = "file_path",
    text_col: str = "text",
    hermetic: bool = True,
) -> DataFrame:
    """Add docs_url / title / url_reachable columns (P1).

    Title semantics match the reference exactly (metadata_processor.py:
    43-56): when the document STARTS with a frontmatter marker, the title
    is the frontmatter title — or '' if the block has no title key, with
    NO first-line fallback; only frontmatter-less documents use the
    first-line-stripped-of-'# ' title.
    """
    fm_url = F.nullif(frontmatter_field(F.col(text_col), "url"), F.lit(""))
    has_fm = F.col(text_col).startswith("---")
    out = df.withColumn(
        "docs_url", F.coalesce(fm_url, basename(F.col(path_col)))
    ).withColumn(
        "title",
        F.when(has_fm, frontmatter_field(F.col(text_col), "title")).otherwise(
            first_line_title(F.col(text_col))
        ),
    )
    if hermetic:
        return out.withColumn("url_reachable", F.lit(True))
    return check_urls(out)


def http_prober(urls: list[str], retries: int = 3) -> list[bool]:
    """Default prober with the reference ping_url semantics
    (metadata_processor.py:70-83): reachable iff the response status is
    exactly 200; non-200 responses AND request errors retry up to
    ``retries`` attempts; the last attempt decides. One Session per
    partition batch (the reference opens a fresh connection per ping)."""
    try:
        import requests

        session = requests.Session()
    except Exception:  # offline container: everything unreachable
        return [False] * len(urls)
    out = []
    for url in urls:
        ok = False
        if isinstance(url, str) and url.startswith("http"):
            for trynum in range(1, retries + 1):
                try:
                    status = session.get(url, timeout=30).status_code
                    if trynum < retries and status != 200:
                        continue
                    ok = status == 200
                    break
                except Exception:
                    if trynum < retries:
                        continue
                    ok = False
                    break
        out.append(ok)
    return out


def check_urls(
    df: DataFrame, url_col: str = "docs_url", prober=http_prober
) -> DataFrame:
    """Non-hermetic reachability: ping each DISTINCT url once, join back.

    ``prober(urls) -> [bool]`` runs inside a Pandas-batched mapInPandas
    (injectable so tests stay offline; the default does real HTTP). The
    reference pings once per FILE with a fresh session each time
    (metadata_processor.py:71-83) — deduplicating by URL first is the
    cluster-side fix for corpora where thousands of files share a URL.
    """
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField(url_col, T.StringType()),
            T.StructField("url_reachable", T.BooleanType()),
        ]
    )

    def _ping(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = list(pdf[url_col])
            yield pd.DataFrame({url_col: urls, "url_reachable": prober(urls)})

    distinct = df.select(url_col).dropDuplicates([url_col])
    pinged = distinct.mapInPandas(_ping, schema=schema)
    # distinct-urls side is small — broadcast so the join is shuffle-free
    return df.join(F.broadcast(pinged), on=url_col, how="left")
