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


def run_structural(spark, tmp_dir: str) -> None:
    """Isolate WHY the split never fires on the bigram-LM shape: AQE's
    OptimizeSkewedJoin only pattern-matches
    ``SMJ(Sort(ShuffleQueryStage), Sort(ShuffleQueryStage))`` — a
    post-shuffle HashAggregate child (exactly what an in-plan model
    table ``groupBy(token).count()`` is) falls outside the pattern, so
    NO join against an in-plan aggregate can ever be skew-split,
    however skewed the fact side. Control pair on identical data:

      A. fact(90% one key) JOIN dim read FROM PARQUET  -> raw shuffle
         both sides -> the split is ELIGIBLE and should fire;
      B. fact(90% one key) JOIN the same dim built via an IN-PLAN
         groupBy -> aggregate child -> structurally ineligible, 0.
    """
    import os as _os

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    # 4M rows, 90% key 'the' (a true Zipf head), 100k distinct tail keys
    fact = spark.range(4_000_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("the"))
        .otherwise(F.concat(F.lit("w"), (F.col("id") % 100_000).cast("string")))
        .alias("w1"),
        F.col("id").alias("doc_id"),
    )
    fact_path = _os.path.join(tmp_dir, "skew_fact.parquet")
    dim_path = _os.path.join(tmp_dir, "skew_dim.parquet")
    fact.write.mode("overwrite").parquet(fact_path)
    factp = spark.read.parquet(fact_path)
    factp.groupBy("w1").agg(F.count(F.lit(1)).alias("c1")).write.mode(
        "overwrite"
    ).parquet(dim_path)

    # the aggregate must keep doc_id flowing through the join: if only
    # w1 survives column pruning, the hot partition is 3.6M copies of
    # the SAME short string, lz4 in the shuffle compresses it ~100:1,
    # and MapStatus' COMPRESSED sizes fall under any byte threshold —
    # the skew rule keys on compressed bytes, a probe trap (and a real
    # 100 TB lesson: low-entropy hot keys partially self-mitigate)
    out = F.sum(F.col("c1") + F.col("doc_id")).alias("s")
    # A: dim from parquet — both SMJ children are raw shuffles
    dim_raw = spark.read.parquet(dim_path)
    join_a = factp.join(dim_raw, "w1").agg(out)
    join_a.collect()
    plan_a = final_plan(join_a)
    # B: dim as an in-plan aggregate over the SAME fact
    dim_agg = factp.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    join_b = factp.join(dim_agg, "w1").agg(out)
    join_b.collect()
    plan_b = final_plan(join_b)
    for name, plan in (("A_dim_from_parquet", plan_a),
                       ("B_dim_inplan_aggregate", plan_b)):
        print(json.dumps({
            "case": name,
            "skewed_smj_in_plan": plan.count("skew=true"),
            "skewed_aqe_reads": plan.count("skewed"),
        }), flush=True)


def main() -> int:
    from rag_content_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_sf10v"
    n_shuffle = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spark = get_spark("aqe-skew-probe", shuffle_partitions=n_shuffle)
    if sf_dir == "--structural":
        import tempfile

        with tempfile.TemporaryDirectory(prefix="sgraft_skewprobe_") as td:
            run_structural(spark, td)
        return 0
    run_once(spark, sf_dir, True)  # warmup: JVM + parquet footer cache
    for enabled in (True, False, True):
        print(json.dumps(run_once(spark, sf_dir, enabled)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
