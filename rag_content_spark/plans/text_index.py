"""Persisted inverted text index: token-bucket-partitioned postings on
parquet + a lengths table + one-row corpus stats — keyword/BM25 lookup
that reads ONLY the buckets containing the queried terms instead of
re-scanning the corpus per query (the text twin of the cell-partitioned
ANN index in plans/ann_index.py).

Layout:

    index_dir/
      postings/bucket=NN/...parquet   (doc_id, token, tf)
      lengths/...parquet              (doc_id, dl)
      meta.json                       {n_docs, avgdl, n_buckets}

Scale shape: the build is one corpus scan -> explode -> groupBy
(doc, token) with map-side combine, then a single partitioned write;
a query computes its term buckets DRIVER-SIDE from the same stable
hash (no data touched), so the postings scan carries a
``bucket IN (...)`` partition filter — |terms| buckets read, not the
corpus. All of a term's postings live in exactly one bucket, so the
per-term df window over the pruned read is the true corpus df and
scores are bit-identical to the on-the-fly scorer
(operators/search.bm25_scores shares bm25_from_postings).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.functions.text import tokens

_SALT = "ti"


def _bucket_of(token: str, n_buckets: int) -> int:
    """Driver-side twin of the bucket expression (md5-based 60-bit
    hash mod n_buckets) — must match stable_hash64 exactly."""
    import hashlib

    h = int(hashlib.md5(f"{_SALT}:{token}".encode()).hexdigest()[:15], 16)
    return h % n_buckets


def build_text_index(
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Build + write; returns the meta dict."""
    from rag_content_spark.operators.search import postings

    post = postings(docs, id_col, text_col).withColumn(
        "bucket",
        (stable_hash64(F.col("token"), salt=_SALT) % n_buckets).cast("int"),
    )
    (
        post.repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, "postings"))
    )
    lengths = docs.select(
        F.col(id_col), F.size(tokens(text_col)).alias("dl")
    )
    lengths.write.mode("overwrite").parquet(os.path.join(out_dir, "lengths"))
    row = lengths.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    meta = {
        "format": "rag-spark-text/1",
        "n_docs": int(row["n"]),
        "sum_dl": int(row["s"]),
        "n_buckets": n_buckets,
        "id_col": id_col,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def query_text_index(
    spark: SparkSession,
    out_dir: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25) for the matching documents — partition-pruned read:
    only the buckets of ``terms`` are scanned."""
    from rag_content_spark.operators.search import bm25_from_postings

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    buckets = sorted({_bucket_of(t, meta["n_buckets"]) for t in terms})
    post = (
        spark.read.parquet(os.path.join(out_dir, "postings"))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("token").isin(terms))
        .drop("bucket")
    )
    lengths = spark.read.parquet(os.path.join(out_dir, "lengths"))
    # avgdl from exact integer sums recorded at build time — identical
    # to the on-the-fly corpus_stats aggregate
    stats = spark.createDataFrame(
        [(meta["n_docs"], float(meta["sum_dl"]) / meta["n_docs"])],
        "n_docs long, avgdl double",
    )
    return bm25_from_postings(
        post, lengths, stats, id_col=meta["id_col"], k1=k1, b=b
    )


def add_to_text_index(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
) -> dict:
    """Incremental add (sibling of ann_index.add_to_ann_index): new
    documents' postings append inside their token buckets, lengths
    append, and the exact-integer corpus stats advance — per-term df is
    a window over the postings at query time, so appends need no df
    rewrite. Id uniqueness across adds is the caller's contract."""
    from rag_content_spark.operators.search import postings

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    post = postings(docs, id_col, text_col).withColumn(
        "bucket",
        (stable_hash64(F.col("token"), salt=_SALT) % meta["n_buckets"]).cast(
            "int"
        ),
    )
    (
        post.repartition(meta["n_buckets"], "bucket")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, "postings"))
    )
    lengths = docs.select(
        F.col(id_col), F.size(tokens(text_col)).alias("dl")
    )
    lengths.write.mode("append").parquet(os.path.join(out_dir, "lengths"))
    row = lengths.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    meta["n_docs"] = int(meta["n_docs"]) + int(row["n"])
    meta["sum_dl"] = int(meta["sum_dl"]) + int(row["s"])
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def compact_text_index(spark: SparkSession, out_dir: str) -> dict:
    """Compact the postings after many :func:`add_to_text_index` appends:
    rewrite each token bucket's accumulated small files into one sorted
    file per bucket (the OPTIMIZE/small-files maintenance step every
    append-only lake table needs — query latency degrades with file
    count, not bytes).

    Safe shape: the rewrite stages into ``postings.compact`` and swaps
    via atomic rename, so a crash mid-compact leaves the live index
    untouched. Stats/meta are unchanged (compaction moves bytes, not
    rows). Returns {n_files_before, n_files_after, n_rows}.
    """
    import shutil

    post_dir = os.path.join(out_dir, "postings")
    staging = os.path.join(out_dir, "postings.compact")
    backup = os.path.join(out_dir, "postings.old")

    def _count_files(d: str) -> int:
        return sum(
            1
            for root, _dirs, files in os.walk(d)
            for fn in files
            if fn.endswith(".parquet")
        )

    before = _count_files(post_dir)
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    post = spark.read.parquet(post_dir)
    n_rows = post.count()
    (
        post.repartition(meta["n_buckets"], "bucket")
        .sortWithinPartitions("bucket", "token", meta["id_col"])
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging)
    )
    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.rename(post_dir, backup)
    os.rename(staging, post_dir)
    shutil.rmtree(backup)
    return {
        "n_files_before": before,
        "n_files_after": _count_files(post_dir),
        "n_rows": n_rows,
    }
