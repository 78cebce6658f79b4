"""Power-law graph probe (round-8 verdict task 5): synthesize a
Zipf-degree edge set (>= 1e6 edges, max degree ~1e3), probe
triangle_counts (unsalted vs wedge-salted) and pagerank_fixed, and
report whether AQE's skew-join split fired (the executed plan marks
split joins with ``skew=true``).

Degree model: endpoint rank r is drawn with density ~ 1/r over
[m, N] via the inverse CDF r = floor(m * exp(u * ln(N/m))) with u a
uniform 60-bit hash — expected hub degree ~ 2E / (m ln(N/m)), so
m=300, N=1e5, E=1e6 gives max degree ~1.1e3.

Usage: python tools/probe_graph.py [n_edges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zipf_edges(spark, n_edges: int, n_nodes: int = 100_000, m: int = 300):
    from pyspark.sql import functions as F

    import math

    span = math.log(n_nodes / m)

    def rank(salt):
        u = (
            F.pmod(
                F.xxhash64(F.col("id").cast("string"), F.lit(salt)),
                F.lit(1 << 40),
            ).cast("double")
            / float(1 << 40)
        )
        return F.floor(F.lit(float(m)) * F.exp(u * F.lit(span))).cast("bigint")

    return (
        spark.range(n_edges)
        .repartition(32)
        .select(rank("src").alias("src"), rank("dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def main():
    from pyspark.sql import functions as F

    from rag_content_spark.operators.graph import (
        pagerank_fixed,
        triangle_counts,
    )
    from rag_content_spark.session import get_spark

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("probe-graph", shuffle_partitions=32)
    edges = zipf_edges(spark, n_edges).localCheckpoint(eager=True)

    deg = (
        edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .groupBy("n")
        .count()
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.max("count").alias("max_degree"),
        F.expr("percentile_approx(count, 0.99)").alias("p99_degree"),
    ).collect()[0]
    out = {
        "n_edges": edges.count(),
        "n_nodes": int(stats["nodes"]),
        "max_degree": int(stats["max_degree"]),
        "p99_degree": int(stats["p99_degree"]),
    }
    print(json.dumps(out))

    for label, salt in (("unsalted", None), ("salted16", 16)):
        t0 = time.time()
        df = triangle_counts(edges, wedge_salt=salt)
        total = df.agg(F.sum("n_triangles")).collect()[0][0]
        sec = round(time.time() - t0, 2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[label] = {
            "sec": sec,
            "sum_triangles": int(total or 0),
            "aqe_skew_split": "skew=true" in plan,
        }
        print(json.dumps({label: out[label]}))

    t0 = time.time()
    pr = pagerank_fixed(edges, iters=10)
    top = pr.orderBy(F.desc("rank6"), "node").limit(3).collect()
    out["pagerank10"] = {
        "sec": round(time.time() - t0, 2),
        "top3": [(int(r["node"]), r["rank6"]) for r in top],
    }
    print(json.dumps({"pagerank10": out["pagerank10"]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
