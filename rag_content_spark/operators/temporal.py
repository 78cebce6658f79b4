"""Temporal joins Spark lacks as built-ins: as-of join and banded range
join — expressed as shuffle-even compositions, never inequality cross
joins.

Both are pipeline staples (attach the latest prior state to an event;
correlate events within a time window). A naive SQL inequality join is a
per-key cross product — O(n_left x n_right) within every key — which is
exactly what dies at 100 TB. The shapes here:

- ``asof_join``: union the two tagged streams and resolve with ONE window
  over (key, time) — a single shuffle on the key, linear work per key,
  the classic sort-merge as-of. (DuckDB's native ASOF JOIN is the
  independent oracle.)
- ``range_join``: band the right side into width-sized time buckets and
  equi-join the (at most two) buckets a left window can touch, then
  apply the exact predicate — the standard range-join binning used by
  the big SQL engines' range-join optimizations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

import pyspark.sql.types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts_sec",
    right_cols: tuple[str, ...] = ("value",),
    strict: bool = False,
) -> DataFrame:
    """For each left row, the most recent right row with ``right.ts <=
    left.ts`` (``<`` when ``strict``) sharing the key — left-join
    semantics (no match -> nulls).

    Output: every left column, plus ``asof_ts`` and the requested
    ``right_cols``. If the right side can hold several rows at one
    (key, ts), pre-aggregate it — the carried row among exact ties is
    otherwise unspecified.
    """
    lpay_t = T.StructType([left.schema[c] for c in left.columns])
    rpay_t = T.StructType(
        [T.StructField("asof_ts", right.schema[ts].dataType)]
        + [right.schema[c] for c in right_cols]
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(rpay_t).alias("_r"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lpay_t).alias("_l"),
        F.struct(
            F.col(ts).alias("asof_ts"), *[F.col(c) for c in right_cols]
        ).alias("_r"),
    )
    # non-strict: right rows order BEFORE left at equal ts (visible);
    # strict: after (invisible to the window's preceding frame)
    side = F.asc("_side") if not strict else F.desc("_side")
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    return (
        l.unionByName(r)
        .withColumn("_asof", carried)
        .filter(F.col("_side") == 1)
        .select("_l.*", "_asof.*")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts_sec",
    lo: int = -3600,
    hi: int = 0,
    right_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """All (left, right) pairs sharing the key with ``right.ts - left.ts``
    in ``[lo, hi]`` — via bucket banding.

    The right side is bucketed by the window width; each left row joins
    only the buckets its window overlaps (ceil(width/bucket)+1 = 2 of
    them), so the join is a plain equi-shuffle on (key, bucket) and the
    exact inequality filters the small banded candidate set. Output:
    left columns + right_cols prefixed ``r_``.
    """
    if hi <= lo:
        raise ValueError("hi must be > lo")
    width = hi - lo
    rb = right.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_rt"),
        F.floor(F.col(ts) / width).alias("_b"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    lb = left.select(
        "*",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col(ts) + lo) / width),
                    F.floor((F.col(ts) + hi) / width),
                )
            )
        ).alias("_b"),
    ).withColumn("_k", F.col(on))
    delta = F.col("_rt") - F.col(ts)
    return (
        lb.join(rb, ["_k", "_b"])
        .filter((delta >= lo) & (delta <= hi))
        .drop("_k", "_b", "_rt")
    )
