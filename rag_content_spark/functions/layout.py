"""Data-layout functions: Morton (z-order) codes for multi-dimensional
file clustering.

Sorting a table by the interleaved-bit Morton code of two (or more)
filter columns before writing makes parquet row-group min/max stats
selective on BOTH columns at once — the z-ordering optimization the
lakehouse engines expose (`OPTIMIZE ... ZORDER BY`), here as a plain
Column expression: ``df.orderBy(morton_code("x", "y")).write...``.

Pure integer bit math (shift/and/or) — exact on every engine, so the
code column is oracle-checkable; the layout win itself is a write-time
property (clustered row groups), demonstrated by the locality test.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def morton_code(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    a's bit i lands at position 2i, b's at 2i+1. 2*bits <= 62."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    ac = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    bc = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        code = (
            code
            + F.shiftleft(F.shiftright(ac, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(bc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return code


def morton_code_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB rendering of :func:`morton_code` (same bit positions)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
