"""Exact global ranking without a single-task window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
whole input through ONE task — the classic scale-killer Spark itself
warns about ("No Partition Defined for Window operation"). The exact
distributed alternative is the same shape Spark's own ``orderBy`` uses:

1. ``repartitionByRange`` on the order key (range-disjoint partitions,
   sampled boundaries, fully parallel),
2. per-partition counts -> cumulative offsets (one tiny driver-side
   list, <= numPartitions rows — a model artifact, not data),
3. per-partition ``row_number`` (window PARTITIONED by the range slice)
   + broadcast offset.

The result is the exact global rank on the total order: partition
boundaries are sampled (and thus not reproducible), but because the
slices are range-disjoint in the order key, the RANK each row receives
is independent of where the boundaries fell — the output is
deterministic even though the physical partitioning is not.

Used by the CCNet head/middle/tail bucketing (exact tertiles at scale)
and anywhere else a corpus-sized exact rank/ntile is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def ranked_with_total(
    df: DataFrame,
    order_cols: list,
    rank_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_slice", F.spark_partition_id()
    )
    # localCheckpoint: the ranged set is referenced twice (counts +
    # ranks) and the sampled range boundaries are nondeterministic —
    # checkpointing pins ONE partitioning for both references
    ranged = ranged.localCheckpoint(eager=False)
    counts = sorted(
        (r["_slice"], r["n"])
        for r in ranged.groupBy("_slice")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offsets = {}
    acc = 0
    for slice_id, n in counts:
        offsets[slice_id] = acc
        acc += n
    if offsets:
        off_expr = F.create_map(
            *[x for s, o in offsets.items() for x in (F.lit(s), F.lit(o))]
        )
        offset = F.coalesce(off_expr[F.col("_slice")], F.lit(0))
    else:  # empty input: no slices, no offsets
        offset = F.lit(0)
    w = Window.partitionBy("_slice").orderBy(*cols)
    ranked = ranged.withColumn(
        rank_col,
        (F.row_number().over(w) + offset).cast("bigint"),
    ).drop("_slice")
    return ranked, acc


def exact_global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + an exact 1-based global ``rank_col`` over ``order_cols``
    (ascending; pass a strict total order — include a unique id as the
    final tie-break or equal keys get an arbitrary but still exact,
    consecutive rank).

    Two exchanges (range + hash-on-slice), both parallel; the only
    driver data is the <= numPartitions cumulative-count list.
    """
    ranked, _ = ranked_with_total(df, order_cols, rank_col, num_partitions)
    return ranked


def exact_ntile(
    df: DataFrame,
    order_cols: list,
    n: int,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n)`` semantics (first ``total % n`` buckets get the
    extra row) over :func:`exact_global_rank` — no corpus-sized window.
    The total row count falls out of the rank computation's offsets, so
    bucketing adds zero extra corpus passes.
    """
    ranked, total = ranked_with_total(
        df, order_cols, "_egr", num_partitions
    )
    q, r = divmod(int(total), n)
    # cumulative bucket upper bounds: bucket b (1-based) ends at
    # b*q + min(b, r)
    bounds = [b * q + min(b, r) for b in range(1, n + 1)]
    expr: Column = F.lit(n)
    for b in range(n - 1, 0, -1):
        expr = F.when(
            F.col("_egr") <= F.lit(bounds[b - 1]), F.lit(b)
        ).otherwise(expr)
    return ranked.withColumn(bucket_col, expr.cast("int")).drop("_egr")


def exact_global_lead(
    df: DataFrame,
    order_col: str,
    lead_col: str = "nxt",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + ``lead_col`` = the next row's ``order_col`` in ascending
    ``order_col`` order (null for the global last row) — the distributed
    twin of ``lead() OVER (ORDER BY order_col)``.

    Shape: range-repartition on the key, per-slice lead (window
    PARTITIONED by the range slice), then stitch slice boundaries: each
    slice's last row takes the NEXT non-empty slice's minimum as its
    lead. The stitch table is <= numPartitions rows — a broadcast map,
    not data. No single-task window anywhere.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    key = F.col(order_col)
    ranged = df.repartitionByRange(num_partitions, key).withColumn(
        "_slice", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=False)
    firsts = sorted(
        (r["_slice"], r["m"])
        for r in ranged.groupBy("_slice").agg(F.min(key).alias("m")).collect()
    )
    # slice s's boundary lead = the first key of the next NON-EMPTY slice
    nxt_of_slice = {}
    for i, (s, _m) in enumerate(firsts):
        nxt_of_slice[s] = firsts[i + 1][1] if i + 1 < len(firsts) else None
    w = Window.partitionBy("_slice").orderBy(key)
    in_slice = F.lead(key).over(w)
    if nxt_of_slice:
        boundary = F.create_map(
            *[
                x
                for s, v in nxt_of_slice.items()
                for x in (F.lit(s), F.lit(v))
            ]
        )[F.col("_slice")]
    else:
        boundary = F.lit(None)
    return ranged.withColumn(
        lead_col, F.coalesce(in_slice, boundary)
    ).drop("_slice")
