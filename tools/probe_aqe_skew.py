"""AQE skew-join probe (round-9 verdict task 7): does
spark.sql.adaptive.skewJoin actually FIRE on the Zipf-head token joins
(bigram LM: big JOIN c12 ON (w1,w2), JOIN c1 ON w1) at a big replica,
and what does it buy vs leaving the skew unsplit?

Input must be a KEEP-VOCAB replica (tools/sweep_sf1x.py --keep-vocab):
the decorrelated replica suffixes every token per replica, which
dilutes the Zipf head 100x and removes the very skew this probe
measures. Skew thresholds are scaled DOWN proportionally to the probe
corpus (the 100 TB defaults — 256MB/partition, factor 5 — assume
executor-scale partitions; at a tens-of-MB-per-partition probe the same
relative skew hides under the absolute threshold, so we hold the
FACTOR and lower the byte floor).

Usage: python tools/probe_aqe_skew.py [sf_dir] [shuffle_partitions]
Prints one JSON line per configuration:
  {"skew_join": true/false, "seconds": ..., "skewed_joins_in_plan": N,
   "rows": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def final_plan(df) -> str:
    """Post-execution adaptive plan (isFinalPlan=true after an action)."""
    return df._jdf.queryExecution().executedPlan().toString()


def run_once(spark, sf_dir: str, skew_enabled: bool) -> dict:
    from pyspark.sql import functions as F

    from rag_content_spark.operators.selection import bigram_logloss

    spark.conf.set(
        "spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower()
    )
    # emulate the 100 TB regime: at real web-corpus scale the token
    # count tables (c1/c12) are NOT broadcastable, so the hot-key join
    # is a sort-merge join. At probe scale AQE turns them into
    # broadcast joins (vocab-sized sides) — which is skew-IMMUNE and
    # the correct plan, but it would make this probe measure nothing.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # probe-scaled thresholds: keep factor 5 (a partition is "skewed"
    # when 5x the median), lower the absolute floor from 256MB to 4MB so
    # the probe corpus can cross it; advisory target 2MB keeps the
    # split count meaningful
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    agg = bigram_logloss(docs).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_bigrams")).alias("nb"),
    )
    t0 = time.time()
    row = agg.collect()[0]
    took = time.time() - t0
    plan = final_plan(agg)
    return {
        "skew_join": skew_enabled,
        "seconds": round(took, 1),
        "skewed_smj_in_plan": plan.count("skew=true"),
        "skewed_aqe_reads": plan.count("skewed"),
        "rows": int(row["n"]),
        "sum_bigrams": int(row["nb"]),
    }


def main() -> int:
    from rag_content_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_sf10v"
    n_shuffle = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spark = get_spark("aqe-skew-probe", shuffle_partitions=n_shuffle)
    run_once(spark, sf_dir, True)  # warmup: JVM + parquet footer cache
    for enabled in (True, False, True):
        print(json.dumps(run_once(spark, sf_dir, enabled)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
