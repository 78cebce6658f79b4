"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with .count() (materializes the whole plan without
driver-side transfer overhead). First query pays JVM/session warmup; a
throwaway warmup action runs first so per-query numbers are comparable.

Usage: python bench.py [--materialize] [query ...]
  --materialize  force EVERY output column via a JVM-side row hash
                 (honest numbers for projection-only queries, where
                 .count() lets Catalyst prune the projected columns)
  query ...      subset of HEADLINE names (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "chunk_fixed",        # C1 explode throughput
    "chunk_sentences",    # C1 SentenceSplitter-packing parity path
    "markdown_split",     # C2
    "filter_valid_chunks",# P2/P3
    "mock_embed",         # E1 twin (column-expr embedding)
    "topk_cosine",        # Q2 single-query exact scan
    "topk_batch",         # Q2 batched
    "ann_ivf",            # ANN scale path
    "dedup_exact",
    "minhash_pairs",      # MinHash-LSH + Jaccard verify
    "simhash",
    "embedding_neardup",
    "lang_id",
    "quality_score",
    "fingerprint",
    "build_pipeline",      # end-to-end documents->chunks->embeddings
    "keyword_search",
    "bm25_search",
    "doc_keywords",
    "phrase_search",
    "proximity_search",
    "phrase_index_lookup",
    "proximity_index_lookup",
    "hybrid_search",
    "dedup_apply",
    "lsh_buckets",
    "json_props",
    "salted_counts",
    "distinct_counts",
    "price_quantiles",
    "zscore_lengths",
    "index_upsert",
    "pii_scrub",
    "repetition_stats",
    "contamination",
    "stratified_sample",
    "quantized_topk",
    "lang_id_trigram",
    "conversion_funnel",
    "pricing_summary",
    "top_customers",
    "events_windowed",
    "sessionize",
    "gopher_quality",     # Gopher rule gate (narrow map)
    "rebalance_mix",      # language-mix rebalancing
    "paragraph_dedup",    # boilerplate paragraph dedup
    "top_bigrams",        # corpus n-gram stats
    "seq_packing",        # token-budget sequence packing
    "pq_topk",            # product-quantization ADC scan
    "ivf_pq_topk",        # IVF coarse probe + PQ ADC (FAISS IVFPQ shape)
    "ann_recall",         # recall@10 of IVF probe vs exact scan
    "incremental_dedup",  # new batch vs stored corpus band table
    "curation_pipeline",  # gopher gate -> dedup -> rebalance -> pack
    "doc_entropy",        # unigram-LM cross-entropy (perplexity proxy)
    "dedup_recall",       # MinHash-LSH recall on planted near-dups
    "ann_multiprobe",     # multi-probe LSH search (partition-pruned read)
    "chunk_bpe",          # tokenizer-pluggable chunking (regex tokenizer)
    "cohort_retention",   # first-active-week cohorts x week offset
    "leakage_split",      # dup-cluster-keyed train/val split
    "chunk_llama",        # real-parity llama-index SentenceSplitter port
    "markdown_llama",     # real-parity MarkdownNodeParser port
    "dedup_clusters",     # connected components (iterative label prop)
    "pq_rerank",          # ADC shortlist -> exact refine (two-stage ANN)
    "dup_ngrams",         # Gopher dup-n-gram fraction family
    "url_normalize",      # URL canonicalization (parse_url exprs)
    "domain_counts",      # per-domain stats + blocklist
    "events_asof",        # as-of join (union + one window)
    "events_range",       # banded range join
    "hll_distinct",       # deterministic cross-engine HyperLogLog
    "temperature_mix",    # alpha=0.5 language-mix flattening
    "shipping_priority",  # TPC-H Q3 shape (date-filtered 3-way join)
    "local_supplier_volume",  # TPC-H Q5 shape (6-way, dims broadcast)
    "promo_revenue",      # TPC-H Q14 shape (part broadcast, ratio agg)
    "readability",        # Flesch-style scoring (narrow regexp counts)
    "late_shipment_priority",  # EXISTS -> left-semi with date condition
    "dormant_customers",  # NOT EXISTS -> left-anti
    "crossdoc_dup",       # cross-document duplicate-passage fraction
    "cms_heavy_hitters",  # count-min sketch + exact top-20 comparison
    "bloom_prune",        # bloom-filter semi-join pruning stats
    "srp_rerank",         # JL reduced-space shortlist -> exact re-rank
    "crossdoc_scrub",     # duplicate-passage removal transform
    "training_manifest",  # weighted-interleave data-mixing schedule
    "cdc_chunks",         # content-defined chunking (rolling-hash bounds)
    "snapshot_diff",      # crawl-to-crawl content change set
    "retrieval_metrics",  # MRR / NDCG@10 index evaluation
    "score_drift",        # PSI drift monitor between corpus halves
    "hard_negatives",     # contrastive-pair mining (pos + hard neg)
    "dsir_weights",       # DSIR hashed-ngram importance weights
    "dsir_select",        # Gumbel top-k importance resample
    "bigram_entropy",     # bigram-LM perplexity proxy
    "bpe_pairs",          # BPE merge-pair counting round
    "bpe_tokenize",       # BPE apply over the vocabulary + doc stats
    "selection_pipeline", # gate -> DSIR resample -> pack, one lazy plan
    "line_stats",         # Dolma-style per-line quality tagger
    "corpus_datasheet",   # one-row corpus datasheet summary
    "text_normalize",     # accent-fold + case + whitespace canonical keys
    "robots_filter",      # robots.txt politeness gate over a crawl frontier
    "c4_clean",           # C4 line-cleaning rules (terminal punct, junk markers)
    "bitext_margin",      # LASER margin-criterion bitext mining
    "bitext_margin_ivf",  # beyond-memory IVF-shortlist bitext path
    "pagerank",           # fixed-point power iteration, exact integer oracle
    "ccnet_buckets",      # CCNet head-middle-tail perplexity tertiles
    "bpe_fertility",      # tokenizer pieces-per-word by language
    "returned_items",     # TPC-H Q10 shape (returned-item revenue top-20)
    "zorder_layout",      # Morton z-order clustering codes
    "mmr_rerank",         # MMR diversity re-ranking (exact integer greedy)
    "rrf_hybrid",         # reciprocal-rank fusion of two rankings
    "sales_cube",         # CUBE with GROUPING() markers
    "events_pivot",       # long-to-wide pivot with explicit value list
    "events_unpivot",     # wide-to-long melt (unpivot)
    "session_window_native", # built-in session_window (merged-window gap rule)
    "rolling_30min",      # RANGE-frame trailing window (fixed-point sums)
    "small_quantity_revenue", # TPC-H Q17 shape (decorrelated scalar subquery)
    "conversion_latency", # first-signup to first-purchase seconds
    "md_plain",           # markdown -> plain training text
    "html_plain",         # crawl-scale HTML tag-strip to text
    "median_latency",     # exact rank-selected median (no interpolation)
    "weekly_growth",      # week-over-week growth (lag ratio)
    "locf_values",        # last-observation-carried-forward (IGNORE NULLS)
    "id_gaps",            # gaps-and-islands complement (missing id ranges)
    "hourly_profile",     # hour-of-day seasonality (integer epoch math)
    "customer_order_distribution",  # TPC-H Q13 shape (outer-join count dist)
    "disjunctive_revenue",          # TPC-H Q19 shape (OR-of-ANDs pushdown)
    "waiting_suppliers",            # TPC-H Q21 shape (EXISTS + NOT EXISTS)
    "sales_opportunity",            # TPC-H Q22 shape (decimal avg + anti join)
    "semdedup",                     # embedding-space semantic dedup (cells)
    "k_anonymity",        # privacy release gate (quasi-identifier classes)
    "running_revenue",    # ROWS-frame cumulative per-customer totals
    "forecast_revenue",   # TPC-H Q6 shape (tight-filter scan-and-sum)
    "balance_rank_profile",  # percent_rank / cume_dist / ntile trio
    "doc_embedding_pool", # chunk -> embed -> exact per-dim mean pooling
    "dup_spans",          # ExactSubstr duplicate-span profile (Lee et al. 2022)
    "dup_span_scrub",     # ExactSubstr-cut: remove duplicated spans
    "kn_bigram_xent",     # interpolated Kneser-Ney bigram cross-entropy
    "doremi_weights",     # DoReMi domain mixture reweighting (fixed-point MW)
    "order_priority_check",   # TPC-H Q4 shape (EXISTS -> semi join)
    "volume_shipping",        # TPC-H Q7 shape (two-role nation join)
    "national_market_share",  # TPC-H Q8 shape (conditional-sum share)
    "returnflag_priority",    # TPC-H Q12 shape (CASE dual count)
    "top_supplier",           # TPC-H Q15 shape (scalar-subquery max)
    "large_volume_customers", # TPC-H Q18 shape (HAVING then join)
    "embedding_covariance",   # exact fixed-point covariance (integer Gram)
    "pca_project",            # driver-side eigh + distributed projection
    "chat_turns",             # SFT transcript parsing (turn explode)
    "chat_valid",             # per-dialog SFT gate (violation triage)
    "fim_split",              # FIM PSM re-serialization (hash-driven cuts)
    "code_blocks",            # markdown fence extraction (code corpus)
    "script_profile",         # unicode script char profiling + argmax
    "skew_report",            # shuffle-key skew pre-flight diagnostic
    "hll_merge",              # sketch mergeability proof (per-batch HLLs)
    "chunk_semantic",         # similarity-boundary semantic chunking
    "streaming_chunk_parity", # streaming docs->chunks twin (upsert table)
    "cms_merge",              # CMS cell-wise-sum mergeability proof
    "group_sample",           # deterministic per-group inspection sample
    "text_index_build",       # persisted inverted index: one-time build
    "text_index_lookup",      # amortized partition-pruned index lookup
    "min_cost_supplier",      # TPC-H Q2 shape (correlated scalar MIN)
    "product_type_profit",    # TPC-H Q9 shape (5-way join, LIKE filter)
    "important_stock",        # TPC-H Q11 shape (HAVING vs scalar total)
    "supplier_part_types",    # TPC-H Q16 shape (NOT IN + count distinct)
    "part_promotion",         # TPC-H Q20 shape (nested IN, half-sum)
    "maxsim_search",          # ColBERT MaxSim late interaction (narrow)
    "quantile_sketch",        # log-linear mergeable quantile sketch
    "qsketch_merge",          # sketch mergeability proof (bucket sums)
    "streaming_qsketch",      # per-batch sketch appends, merge on read
    "triangle_count",         # per-node triangle enumeration (set algebra)
    "equi_depth_hist",        # ANALYZE-style equal-frequency histogram
    "novelty_scan",           # per-doc novel-shingle fraction (growth curve)
    "containment_dedup",      # asymmetric subset/quote duplication
    "lsh_bucket_cap",         # enforced max_bucket_size candidate path (r8)
    "lsh_overflow",           # the no-silent-caps overflow summary (r8)
    "dedup_precollapse",      # exact-dup pre-collapse + member expansion (r8)
    "keyword_fts5",           # FTS5-BM25 scorer (OGX keyword parity pin, r10)
    "hybrid_rrf",             # RRF k=60 fusion, TF-IDF keyword side (r10)
    "hybrid_rrf_fts5",        # RRF over FTS5-BM25 ranks (runtime-exact, r11)
]


# Queries whose honest compute the count-forced timing cannot see:
# their heavy work lives in projected output columns that Catalyst
# prunes under .count() (guide §1.4), and several additionally pay a
# fan-out exchange the pruned plan keeps. The default bench run times
# this list a SECOND way — every output column forced via the JVM-side
# row hash (--materialize semantics) — and reports it under the
# ADDITIVE `queries_materialize` key, leaving `queries`/`value` and
# their methodology untouched (round-11 verdict item 3: the 12.8→3.7 s
# sketch_saturation-class wins existed only in builder-side noop
# sweeps; now every driver bench run carries them).
MATERIALIZE_LEG = [
    "sketch_saturation",
    "dup_span_scrub",
    "crossdoc_scrub",
    "dup_spans",
    "simhash",
    "crossdoc_dup",
    "dup_ngrams",
    "fingerprint",
    "lang_id_trigram",
    "pii_scrub",
    "c4_clean",
]


def _force(df, materialize: bool) -> None:
    """Run the query to completion. Default: .count() — full plan, no
    driver transfer, but Catalyst may prune columns a pure projection
    never aggregates (fine for join/agg queries; understates scan+eval
    cost for projection-only ones). --materialize: hash every output
    column JVM-side (xxhash64 over the row struct, to_json fallback for
    unhashable types) so all columns are computed, like the correctness
    gate's value hash — the honest number for projection queries."""
    if not materialize:
        df.count()
        return
    from pyspark.sql import functions as F

    try:
        df.select(
            F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h")
        ).collect()
    except Exception:
        df.select(
            F.bit_xor(F.xxhash64(F.to_json(F.struct(*df.columns)))).alias("h")
        ).collect()


def main() -> None:
    from rag_content_spark.session import get_spark, warm_python_workers

    import __spark_entry__ as entrymod

    args = sys.argv[1:]
    materialize = "--materialize" in args
    names = [a for a in args if not a.startswith("--")] or HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("bench")
    # warmup: JVM + parquet footer caches
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # warmup: Python worker pool (r11). A long-lived cluster pays the
    # daemon fork + worker imports once per executor, not per job; the
    # session.warm_python_workers docstring documents the measured
    # ~4-6 s one-time cost this otherwise charges to whichever query
    # touches a Python stage first. Methodology is unchanged (same
    # queries, same .count() force, min-of-two) — this only moves the
    # session-bootstrap cost out of that one query's COLD number.
    warm_python_workers(spark)

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    # two runs per query, report the min: the first run carries one-off
    # plan-analysis/codegen cost (measured 40-100% run-to-run noise on
    # the suite total); the min is the stable steady-state number a
    # long-lived cluster session sees. cold_total_s preserves the
    # first-run total for transparency.
    for name in names:
        fn = queries.get(name)
        if fn is None:
            continue
        t0 = time.time()
        _force(fn(spark, sf_dir), materialize)
        cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        _force(fn(spark, sf_dir), materialize)
        timings[name] = round(min(cold[name], time.time() - t0), 3)

    # additive materialize leg (full default runs only): min-of-two
    # all-columns-forced timings for the queries .count() under-reports
    mat: dict[str, float] = {}
    if not materialize and names is HEADLINE:
        for name in MATERIALIZE_LEG:
            fn = queries.get(name)
            if fn is None:
                continue
            best = None
            for _ in range(2):
                t0 = time.time()
                _force(fn(spark, sf_dir), True)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            mat[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    cold_total = round(sum(cold.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total_s": cold_total,
                "queries_materialize": mat,
                "materialize_leg_total_s": round(sum(mat.values()), 3),
                "materialize": materialize,
                "sf": sf,
                # Measured 2026-08-15 by tools/baseline_ref/run_baseline.py
                # (reference document_processor.py runs unmodified over
                # shims; identical mock embedder both sides; symmetric
                # warm-runtime boundary — reference after module imports,
                # Spark after session + python-worker-pool bootstrap —
                # with nothing-excluded cold walls reported alongside;
                # see BASELINE.md "Round-7 protocol refinement"):
                "baseline": {
                    "protocol": "tools/baseline_ref/run_baseline.py",
                    "sf0.1": {"reference_s": 11.4, "spark_s": 8.9, "ratio": 1.28},
                    "sf0.1x10": {"reference_s": 125.8, "spark_s": 22.3, "ratio": 5.64},
                    "sf0.1_cold": {"reference_s": 11.9, "spark_s": 22.7, "ratio": 0.52},
                    "sf0.1x10_cold": {"reference_s": 126.3, "spark_s": 44.8, "ratio": 2.82},
                    "node_count_parity": True,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
