"""Stable cross-engine 64-bit hashing.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so oracle-checked operators (dedup, minhash, simhash,
fingerprints) need a hash both engines compute identically. We use the
first 15 hex chars (60 bits) of md5 — md5 is bit-identical everywhere,
and 60 bits fits a signed BIGINT in both engines.

Spark:  conv(substring(md5(x), 1, 15), 16, 10)::bigint
DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

The reference has no content hashing at all (it trusts file identity);
hashing here powers the scale-path extensions (exact dedup, MinHash-LSH,
SimHash) the north star requires.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def stable_hash64(col: Column | str, salt: str | None = None) -> Column:
    """60-bit stable hash of a string column, identical in Spark and DuckDB.

    ``salt`` derives independent hash functions from one primitive
    (used as the MinHash hash family: salt=f"mh{i}").
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt + ":"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def stable_hash64_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB-SQL rendering of :func:`stable_hash64` over ``expr``."""
    if salt is not None:
        expr = f"('{salt}:' || {expr})"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
