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


def _postings_of(
    docs: DataFrame, id_col: str, text_col: str, positions: bool
) -> DataFrame:
    """(id, token, tf[, positions]) — the positional variant stores each
    term's sorted in-document position array, enabling index-served
    phrase/proximity retrieval (operators/search.phrase_search /
    proximity_search run the same intersection algebra over these
    arrays instead of a corpus scan)."""
    from rag_content_spark.operators.search import postings

    if not positions:
        return postings(docs, id_col, text_col)
    return (
        docs.select(
            F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "token")
        )
        .groupBy(id_col, "token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def build_text_index(
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    positions: bool = False,
) -> dict:
    """Build + write; returns the meta dict. ``positions=True`` stores
    per-(doc, token) sorted position arrays alongside tf (meta records
    the flag; BM25 lookup ignores the extra column, phrase/proximity
    lookup requires it)."""
    post = _postings_of(docs, id_col, text_col, positions).withColumn(
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
        "positions": bool(positions),
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


def _pruned_positional_read(
    spark: SparkSession, out_dir: str, terms: list[str]
) -> tuple[DataFrame, dict]:
    """Partition-pruned positional postings for ``terms``; raises if the
    index was built without positions."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if not meta.get("positions"):
        raise ValueError(
            "index was built without positions=True — phrase/proximity "
            "lookup needs the positional postings"
        )
    buckets = sorted({_bucket_of(t, meta["n_buckets"]) for t in terms})
    post = (
        spark.read.parquet(os.path.join(out_dir, "postings"))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("token").isin(terms))
        .select(meta["id_col"], "token", "positions")
    )
    return post, meta


def phrase_query_text_index(
    spark: SparkSession, out_dir: str, phrase: str
) -> DataFrame:
    """Index-served exact phrase match: same offset-shifted
    position-set intersection as operators/search.phrase_search, but
    over the STORED per-(doc, token) position arrays — the read carries
    a ``bucket IN (...)`` partition filter, so only the phrase's token
    buckets are scanned, never the corpus. Results are bit-identical to
    the corpus-scan operator (pinned in tests)."""
    terms = [t for t in phrase.split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    post, meta = _pruned_positional_read(spark, out_dir, terms)
    id_col = meta["id_col"]
    # (doc, token) is unique in the postings, so per-term pickup is a
    # conditional first(); a term absent from a doc leaves NULL and the
    # intersection nulls out (size(NULL) = -1 fails the > 0 gate)
    aggs = [
        F.first(
            F.when(F.col("token") == t, F.col("positions")), ignorenulls=True
        ).alias(f"_p{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = post.groupBy(id_col).agg(*aggs)
    inter = F.col("_p0")
    for i in range(1, len(terms)):
        # the transform Column is built EAGERLY this iteration, so the
        # 1-arg lambda's closure over the loop variable is safe (the
        # 2-arg form would receive the array index — repo gotcha)
        off = F.lit(i)
        inter = F.array_intersect(
            inter, F.transform(F.col(f"_p{i}"), lambda p: p - off)
        )
    return (
        per_doc.select(
            F.col(id_col), F.size(inter).cast("bigint").alias("n_occurrences")
        )
        .filter(F.col("n_occurrences") > 0)
    )


def proximity_query_text_index(
    spark: SparkSession, out_dir: str, terms: list[str], window: int = 6
) -> DataFrame:
    """Index-served unordered proximity match (the slop-window sibling;
    operators/search.proximity_search semantics): valid-start interval
    expansion over the stored position arrays, doc length from the
    lengths table joined only against candidate docs."""
    terms = list(dict.fromkeys(t for t in terms if t))
    if not terms:
        raise ValueError("terms must contain at least one token")
    w = int(window)
    if w < 1:
        raise ValueError("window must be >= 1")
    post, meta = _pruned_positional_read(spark, out_dir, terms)
    id_col = meta["id_col"]
    aggs = [
        F.first(
            F.when(F.col("token") == t, F.col("positions")), ignorenulls=True
        ).alias(f"_p{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = post.groupBy(id_col).agg(*aggs)
    lengths = spark.read.parquet(os.path.join(out_dir, "lengths")).select(
        F.col(id_col), F.col("dl").alias("_len")
    )
    per_doc = per_doc.join(lengths, id_col).filter(F.col("_len") >= w)

    def _starts(col):
        return F.array_distinct(
            F.flatten(
                F.transform(
                    col,
                    lambda p: F.sequence(
                        F.greatest(p - F.lit(w - 1), F.lit(0)),
                        F.least(p, F.col("_len") - F.lit(w)),
                    ),
                )
            )
        )

    inter = _starts(F.col("_p0"))
    for i in range(1, len(terms)):
        inter = F.array_intersect(inter, _starts(F.col(f"_p{i}")))
    return (
        per_doc.select(
            F.col(id_col), F.size(inter).cast("bigint").alias("n_windows")
        )
        .filter(F.col("n_windows") > 0)
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
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    post = _postings_of(
        docs, id_col, text_col, bool(meta.get("positions"))
    ).withColumn(
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
