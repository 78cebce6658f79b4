"""Targeted next-decade probe: run the boundary-prone, SMALL-RESULT,
linear-oracle query families against a 1000x type-exact replica
(~sf100: 6B-magnitude money sums, 600M lineitem / 5M docs / 2M
embeddings / 100M events).

This is deliberately NOT a full-registry sweep — the no-silent-caps
rule requires saying why: the scale ladder's per-decade job — catching
overflow, rounding-granularity, and partition-boundary bugs — lives in
the aggregate families the default PROBE list covers: exact-decimal
money sums at ~5e12 magnitudes, the 128-bit covariance rail at 2M
vectors, range-repartition boundary stitches at 14M gap rows, sketch
register saturation at 600M inserts. The two families the round-9
probe could NOT reach are covered in round 10 by passing an explicit
query list: corpus-linear results (sessionize/rolling/locf families,
95-150M rows) verify via the engine-side stream hash
(SPARK_GRAFT_STREAM_HASH, registry-tagged), and vocabulary-heavy
oracles (doremi/kn_bigram/bpe/top_bigrams) run against a KEEP-VOCAB
replica (sweep_sf1x --keep-vocab) where their oracle joins stay
vocab-sized while counts grow 1000x.

Usage:
  python tools/sweep_sf1x.py /tmp/sgraft_sf100 1000        # ~25 min
  python tools/probe_sf100.py [sf_dir] [out_prefix]        # per-query procs
Then merge:
  python tools/merge_verify_artifacts.py VERIFY_LOCAL_r09_sf100_probe.json \
      /tmp/part_sf100_*.json
"""

from __future__ import annotations

import os
import subprocess
import sys

# small-result, linear-oracle, boundary-prone — grouped by what the
# decade could break in each
PROBE = [
    # exact-decimal money aggregates (sums ~5e12: double rendering is
    # guaranteed-divergent; DECIMAL(38) headroom check one decade up)
    "pricing_summary", "disjunctive_revenue", "national_market_share",
    "product_type_profit", "small_quantity_revenue", "top_customers",
    "promo_revenue", "volume_shipping", "order_priority_check",
    "returnflag_priority", "large_volume_customers", "sales_cube",
    "sales_rollup", "forecast_revenue",
    # exact fixed-point math (the 100x decade found int64 overflow here)
    "embedding_covariance", "zscore_lengths", "score_drift",
    # range-repartition / boundary-stitch windows
    "id_gaps", "median_latency", "equi_depth_hist", "ccnet_buckets",
    "price_quantiles", "k_anonymity",
    # event-time windows at 100M events
    "events_windowed", "events_range", "hourly_profile", "weekly_growth",
    "conversion_funnel", "cohort_retention",
    # mergeable sketches (register saturation at 600M inserts)
    "hll_merge", "hll_distinct", "cms_merge", "cms_heavy_hitters",
    "quantile_sketch", "qsketch_merge",
    # grouped counts / sampling
    "corpus_counts", "distinct_counts", "domain_counts", "salted_counts",
    "skew_report", "group_sample",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_sf100"
    prefix = sys.argv[2] if len(sys.argv) > 2 else "/tmp/part_sf100"
    # optional explicit query list (comma-separated) — the round-10
    # decade runs reuse this per-query-process driver for the
    # corpus-linear stream-hash families, the keep-vocab vocabulary
    # families, and the money-magnitude probe
    queries = sys.argv[3].split(",") if len(sys.argv) > 3 else PROBE
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_VERIFY_SHUFFLE="128",
        SPARK_GRAFT_VERIFY_ARROW="1",
        SPARK_DRIVER_MEM="56g",
        SPARK_GRAFT_ORACLE_MEM="72GB",
        # stream-hash only changes behavior for registry-tagged
        # queries; scale-safe-only records tier skips in the artifact
        SPARK_GRAFT_STREAM_HASH="1",
        SPARK_GRAFT_SCALE_SAFE_ONLY="1",
    )
    failures = []
    for q in queries:
        out = f"{prefix}_{q}.json"
        if os.path.exists(out):
            print(f"skip {q} (artifact exists)")
            continue
        print(f"=== {q} ===", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(root, "tools", "verify_local.py"),
                 "--json", out, q],
                env=env, cwd=root, timeout=5400,
            )
        except subprocess.TimeoutExpired:
            # record and keep going — an uncaught raise here aborted the
            # whole probe loop and lost every remaining query (r9 advice)
            print(f"TIMEOUT {q} (5400s)", flush=True)
            failures.append(q)
            continue
        if r.returncode != 0:
            failures.append(q)
    print("done; nonzero exits:", failures or "none")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
