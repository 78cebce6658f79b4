"""Canonical vector-index sink: partitioned Parquet (SURVEY §7.1).

The reference persists FAISS binaries / PGVector tables; our canonical
store is Parquet with the ``chunks`` schema (SURVEY §1.4) because it:
- scales to 100 TB (partitioned, splittable, zstd),
- supports metadata-only reads (column pruning skips the embedding
  column — the dominant bytes — for non-vector queries),
- feeds every export writer (FAISS/pgvector) from one artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_index(
    chunks: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: str | None = "chunk_id",
    mode: str = "overwrite",
) -> None:
    """Write the chunk index. ``sortWithinPartitions(chunk_id)`` gives
    point lookups (Q3) row-group min/max pruning for free."""
    out = chunks
    if sort_by and sort_by in chunks.columns:
        out = out.sortWithinPartitions(sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_index(
    chunks: DataFrame,
    table_name: str,
    bucket_col: str = "chunk_id",
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed variant of the canonical index (saveAsTable — bucketing
    metadata lives in the catalog). Joins and aggregations on
    ``bucket_col`` between tables bucketed the same way are CO-LOCATED:
    no exchange at query time — the decisive layout for repeated
    chunk/document joins at 100 TB."""
    (
        chunks.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def compact_index(
    spark: SparkSession,
    path: str,
    target_partition_bytes: int = 128 << 20,
    sort_by: str | None = "chunk_id",
) -> int:
    """Compact a parquet index in place: coalesce many small files into
    ~target-sized ones (the small-file problem — streaming appends and
    fine-grained upserts fragment an index; thousands of tiny files slow
    every scan's listing + footer reads at 100 TB).

    Returns the new file count. Rewrites via a temp dir + atomic-ish
    swap (rename) so readers never see a half-written index.
    """
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_partition_bytes))
    out = df.repartition(n_files)
    if sort_by and sort_by in df.columns:
        out = out.sortWithinPartitions(sort_by)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    shard_col: str | None = "shard",
    order_col: str | None = "seq_bucket",
    mode: str = "overwrite",
) -> None:
    """Training-data export: newline-delimited JSON, one directory per
    shard (the format most training loaders consume).

    When ``shard_col`` is set, output is partitioned by it and rows are
    sorted WITHIN each partition by ``order_col`` (sortWithinPartitions
    is a local sort — no extra shuffle beyond the partitioning), so a
    loader streaming one shard file reads sequences in packed order.
    """
    writer = df
    if shard_col is not None:
        writer = writer.repartition(F.col(shard_col))
        if order_col is not None:
            writer = writer.sortWithinPartitions(shard_col, order_col)
        writer.write.mode(mode).partitionBy(shard_col).json(path)
    else:
        writer.write.mode(mode).json(path)
