"""Degenerate-corpus probe for the LSH bucket cap (round-8 verdict task 1)
and the exact-dup pre-collapse (task 2).

Part A — boilerplate blowup: k identical docs (k up to 100k) + 10k
distinct docs. Uncapped LSH emits C(k,2) pairs from ONE bucket per band
(the single-task blowup); the cap bounds it at C(cap,2); pre-collapse
reduces the cluster to one representative. Reports wall time + pair
counts + the overflow summary per k.

Part B — replicated-corpus densification: replicate sf0.01 documents Nx
(exact twins, the round-7 100x artifact) and run containment dedup WITH
pre-collapse: candidate/verify work runs on representatives only, so
pair growth stays ~flat with N instead of quadratic in twin-cluster
size.

Usage: python tools/probe_degenerate.py [a|b|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def part_a(spark):
    from pyspark.sql import functions as F

    from rag_content_spark.operators import dedup

    boiler = (
        "cookie notice we use cookies to improve your experience accept "
        "all cookies or manage preferences privacy policy terms of service"
    )
    results = []
    for k in (1_000, 10_000, 100_000):
        dup = spark.range(k).select(
            F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
        )
        distinct = spark.range(10_000).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.concat(
                F.lit("unique document number "),
                F.col("id").cast("string"),
                F.lit(" discussing spark catalyst optimizer rule "),
                (F.col("id") % 97).cast("string"),
            ).alias("text"),
        )
        corpus = dup.unionAll(distinct).repartition(32).localCheckpoint()

        row = {"k_identical": k}
        t0 = time.time()
        row["capped_pairs"] = dedup.minhash_lsh_candidates(
            corpus, max_bucket_size=32
        ).count()
        row["capped_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        summ = dedup.overflow_summary(
            dedup.minhash_lsh_overflow(corpus, 32)
        ).collect()[0]
        row["overflow"] = {
            "buckets": summ["n_overflow_buckets"],
            "max_seen": summ["max_bucket_size_seen"],
            "dropped": summ["n_dropped_ids"],
        }
        row["overflow_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        reps, _members = dedup.collapse_exact_before_lsh(corpus)
        row["precollapse_pairs"] = dedup.minhash_lsh_candidates(reps).count()
        row["precollapse_sec"] = round(time.time() - t0, 2)

        if k <= 10_000:  # C(100k,2) = 5e9 pairs — do not materialize
            t0 = time.time()
            row["uncapped_pairs"] = dedup.minhash_lsh_candidates(
                corpus, max_bucket_size=None  # explicit opt-out (default is capped since r9)
            ).count()
            row["uncapped_sec"] = round(time.time() - t0, 2)
        results.append(row)
        print(json.dumps(row))
    return results


def part_b(spark, sf_dir="/root/testdata/sf0.01"):
    from pyspark.sql import functions as F

    from rag_content_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    results = []
    for n in (1, 10, 100):
        reps_src = (
            docs.crossJoin(
                spark.range(n).select(F.col("id").alias("_rep"))
            )
            .select(
                (F.col("doc_id") + F.col("_rep") * 100_000).alias("doc_id"),
                "text",
            )
            .repartition(32)
            .localCheckpoint()
        )
        row = {"replication": n, "rows": reps_src.count()}
        t0 = time.time()
        reps, members = dedup.collapse_exact_before_lsh(reps_src)
        cand = dedup.minhash_lsh_candidates(reps, max_bucket_size=256)
        pairs = dedup.containment_pairs(reps, cand).filter(
            (F.col("contain_a") >= 0.9) | (F.col("contain_b") >= 0.9)
        )
        row["rep_pairs"] = pairs.count()
        row["sec"] = round(time.time() - t0, 2)
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    from rag_content_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("probe-degenerate", shuffle_partitions=32)
    out = {}
    if which in ("a", "all"):
        out["part_a"] = part_a(spark)
    if which in ("b", "all"):
        out["part_b"] = part_b(spark)
    print(json.dumps(out))
