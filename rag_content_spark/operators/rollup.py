"""Grouping / counter operators (SURVEY §2.4).

A1: group chunks by source document (reference document_processor.py:529-541
    builds dict[doc_id, list[chunk]] to stamp a per-document file_id on all
    its chunks) — here a groupBy + broadcast join back.
A2: corpus counters (reference document_processor.py:800-803,893-896).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def group_chunks_by_document(
    chunks: DataFrame,
    doc_col: str = "document_id",
    chunk_id_col: str = "chunk_id",
) -> DataFrame:
    """A1: per-document chunk rollup: count + sorted chunk-id list."""
    return chunks.groupBy(doc_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.array_sort(F.collect_list(chunk_id_col)).alias("chunk_ids"),
    )


def stamp_document_file_id(
    chunks: DataFrame, doc_col: str = "document_id"
) -> DataFrame:
    """A1 stamping step: derive one file_id per document and put it on every
    chunk (reference upload_file + per-chunk stamp,
    document_processor.py:497-526). Deterministic id = md5 of doc id; a
    narrow map, no shuffle (the reference's round-trip through an upload
    API becomes a pure column)."""
    return chunks.withColumn("file_id", F.md5(F.col(doc_col).cast("string")))


def corpus_counts(
    docs: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """A2: document counts (+ reachable/unreachable split when present)."""
    group_cols = group_cols or []
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if "url_reachable" in docs.columns:
        aggs.append(
            F.sum(F.when(F.col("url_reachable"), 1).otherwise(0)).alias(
                "n_reachable"
            )
        )
    if group_cols:
        return docs.groupBy(*group_cols).agg(*aggs)
    return docs.agg(*aggs)


def salted_aggregate(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant two-phase aggregation: count/sum per (key, salt)
    first (spreads a hot key over ``salt_buckets`` reducers), then merge
    per key. Same result as a direct groupBy — the point is the shuffle
    shape under skew (one key holding 50% of rows no longer lands on one
    reducer). Salt = stable row hash, so the plan stays deterministic.

    AQE's skew-join handling covers JOINS automatically; aggregation skew
    still needs explicit salting.
    """
    from rag_content_spark.functions.hashing import stable_hash64

    salt = (stable_hash64(F.col(value_col).cast("string")) % salt_buckets).alias(
        "_salt"
    )
    partial = (
        df.select(F.col(key_col), F.col(value_col), salt)
        .groupBy(key_col, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("_sum"),
        )
    )
    return partial.groupBy(key_col).agg(
        F.sum("_cnt").alias("n_rows"),
        F.sum("_sum").cast("double").alias("sum_value"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Change set between two corpus snapshots (what a recurring crawl
    logs per run): every id classified added / removed / changed /
    unchanged by CONTENT hash, not timestamps.

    One full-outer hash join on the id; content comparison is on the
    64-bit stable hash so the join carries (id, hash) pairs, never two
    copies of the text — at 100 TB the diff costs one co-partitioned
    join of two slim columns (and is free of shuffles entirely when
    both snapshots are bucketed by id, the layout write_bucketed_index
    produces).

    Output: ``id, status, old_hash, new_hash``.
    """
    from rag_content_spark.functions.hashing import stable_hash64

    o = old.select(
        F.col(id_col), stable_hash64(text_col).alias("old_hash")
    )
    n = new.select(
        F.col(id_col), stable_hash64(text_col).alias("new_hash")
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col(id_col), status.alias("status"), "old_hash", "new_hash"
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 5,
) -> DataFrame:
    """One-row key-skew diagnostic for a prospective shuffle key — the
    pre-flight check before a big groupBy/join at scale (a 100x key
    imbalance means salting or AQE skew-join, and this report is how
    you find out BEFORE the 4-hour stage): (n_keys, total_rows,
    max_count, skew_ratio, p50_count, p99_count, top_keys).

    skew_ratio = max_count / mean_count computed as an integer-ratio
    double (max * n_keys / total) rounded once; percentiles are EXACT
    rank-selected counts (no interpolation); top_keys serializes the
    ``top_n`` heaviest keys as 'key:count' descending (key ascending on
    ties). Two aggregations over the per-key count table — the count
    table itself is the only shuffle.
    """
    from rag_content_spark.operators.ranking import ranked_with_total

    counts = df.groupBy(F.col(key_col).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # the per-key count table can itself be corpus-sized (near-unique
    # keys), so BOTH rank passes avoid single-partition windows: exact
    # rank-selected percentiles via the distributed rank (operators/
    # ranking.py), top-n via TakeOrderedAndProject
    asc, n_keys = ranked_with_total(
        counts, ["c", "k"], "_ra", num_partitions=None
    )
    if n_keys == 0:
        raise ValueError("skew_report on empty input")
    p50_rank = max(1, -(-n_keys * 50 // 100))
    p99_rank = max(1, -(-n_keys * 99 // 100))
    pcts = (
        asc.filter(F.col("_ra").isin(p50_rank, p99_rank))
        .select("_ra", "c")
        .collect()
    )
    by_rank = {r["_ra"]: r["c"] for r in pcts}
    top = (
        counts.orderBy(F.desc("c"), "k")
        .limit(top_n)
        .select(F.concat_ws(":", "k", "c").alias("kc"))
    )
    top_str = "|".join(r["kc"] for r in top.collect())
    return counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("total_rows"),
        F.max("c").cast("bigint").alias("max_count"),
        F.round(
            F.max("c").cast("double")
            * F.count(F.lit(1)).cast("double")
            / F.sum("c").cast("double"),
            6,
        ).alias("skew_ratio"),
        F.lit(by_rank[p50_rank]).cast("bigint").alias("p50_count"),
        F.lit(by_rank[p99_rank]).cast("bigint").alias("p99_count"),
        F.lit(top_str).alias("top_keys"),
    )
