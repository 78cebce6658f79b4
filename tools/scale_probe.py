"""Scale probe: replicate the sf0.1 tables Nx (distinct ids, 32 output
files so all cores engage) and time selected queries against the
replicated dir. Evidence for the BASELINE.md scale table.

Usage: python tools/scale_probe.py [N] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "gopher_quality",
    "paragraph_dedup",
    "top_bigrams",
    "seq_packing",
    "rebalance_mix",
    "pq_topk",
    "ivf_pq_topk",
    "incremental_dedup",
]


def replicate(spark, src_dir: str, dst_dir: str, n: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst_dir, exist_ok=True)
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    reps = spark.range(n).select(F.col("id").alias("_rep"))
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_rep") * 100000).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/documents.parquet")
    )
    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_rep") * 100000).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/embeddings.parquet")
    )
    # relational tables: replicate the big three with shifted keys
    # (fact growth), copy the small dims verbatim
    ords = spark.read.parquet(f"{src_dir}/orders.parquet")
    (
        ords.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("_rep") * 10_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_rep") * 1_000_000).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/orders.parquet")
    )
    cust = spark.read.parquet(f"{src_dir}/customer.parquet")
    (
        cust.crossJoin(reps)
        .select(
            (F.col("c_custkey") + F.col("_rep") * 1_000_000).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/customer.parquet")
    )
    li = spark.read.parquet(f"{src_dir}/lineitem.parquet")
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("_rep") * 10_000_000).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/lineitem.parquet")
    )
    for small in ("part", "supplier", "nation", "region"):
        shutil.copy(f"{src_dir}/{small}.parquet", f"{dst_dir}/{small}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("_rep") * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_rep") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/events.parquet")
    )


def main() -> None:
    from rag_content_spark.session import get_spark

    import __spark_entry__ as entrymod

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = f"/tmp/scale_{n}x"

    spark = get_spark("scale-probe")
    replicate(spark, src, dst, n)
    queries = entrymod.queries()
    out = {}
    for name in names:
        fn = queries[name]
        t0 = time.time()
        cnt = fn(spark, dst).count()
        out[name] = (round(time.time() - t0, 2), cnt)
        print(f"{name}: {out[name][0]} s, {cnt} rows", flush=True)
    shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    main()
