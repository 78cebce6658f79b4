"""Sequence packing: group documents into fixed token-budget buckets —
the batching step of a pretraining data pipeline (each bucket becomes
one training sequence / one shard file).

Scale design: a single global cumulative sum would serialize on one
partition, so documents are first sharded by a deterministic hash and
packed WITHIN each shard — the window partitions by shard, so N shards
give N-way parallel packing and shard boundaries are stable across runs
(restartable, engine-portable). At 100 TB, shards map 1:1 to output
files.

Size ``shards`` with the corpus: each shard's cumsum runs in ONE window
partition, so pick shards ≈ total_rows / (a few million) — e.g. 10k
shards for 10B documents. More shards only changes which bucket a doc
lands in, never correctness. The default (``shards=None``) derives the
count from the input's own partitioning — one shard per input split,
floored at 32 — so packing parallelism scales with the corpus instead of
capping at a literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.functions.text import tokens


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    shards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Assign each document a ``(shard, seq_bucket)`` packing slot.

    Documents are ordered by id within their hash-shard; the running
    token total places each doc in bucket ``floor(start_offset /
    budget)`` — contiguous greedy packing. Integer window arithmetic
    only, so the assignment is exactly reproducible for a given shard
    count. Pass ``shards`` explicitly when the layout must be stable
    across differently-partitioned reruns (e.g. oracle-pinned tests);
    the derived default tracks input splits (>=32) for parallelism.

    Output: ``id, shard, n_tokens, seq_bucket``.
    """
    if shards is None:
        shards = max(32, docs.rdd.getNumPartitions())
    shard = (
        stable_hash64(F.col(id_col).cast("string"), salt=salt) % shards
    ).alias("shard")
    with_counts = docs.select(
        F.col(id_col),
        shard,
        F.size(tokens(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return with_counts.withColumn(
        "seq_bucket", F.floor(start_offset / budget).cast("bigint")
    )
