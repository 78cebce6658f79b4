"""Training-data curation example: quality gate → dedup (within-batch
AND against an existing corpus snapshot) → language-mix rebalance →
token-budget sequence packing → shard-partitioned output.

The library-API version of the oracle-checked ``curation_pipeline`` /
``incremental_dedup`` queries; each stage is one operator, the whole
flow is lazy until the final write.

Run: python examples/curation_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rag_content_spark.operators.dedup import (
    dedup_against_corpus,
    exact_dedup,
    minhash_band_table,
)
from rag_content_spark.operators.packing import pack_sequences
from rag_content_spark.operators.quality import gopher_rules, rebalance_to_mix
from rag_content_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("curation-example", master="local[4]", shuffle_partitions=4)
    workdir = tempfile.mkdtemp(prefix="curation_")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. quality gate (Gopher rules)
    gated = docs.filter(gopher_rules("text")["keep"])

    # 2a. within-batch exact dedup (min-id survivor per content hash)
    survivors = exact_dedup(gated).select(F.col("keep_id").alias("doc_id"))
    deduped = gated.join(survivors, "doc_id", "leftsemi")

    # 2b. incremental near-dup dedup against a prior corpus snapshot:
    # here the "snapshot" is the first half of the corpus, materialized
    # the way a daily pipeline would store it
    corpus = deduped.filter(F.col("doc_id") % 2 == 0)
    batch = deduped.filter(F.col("doc_id") % 2 == 1)
    bands_path = os.path.join(workdir, "corpus_bands")
    minhash_band_table(corpus).write.parquet(bands_path)
    fresh = dedup_against_corpus(
        batch,
        corpus,
        threshold=0.7,
        corpus_bands=spark.read.parquet(bands_path),
    )
    curated = corpus.unionByName(fresh)

    # 3. rebalance to a target language mix
    mix = {"en": 0.4, "es": 0.2, "fr": 0.2, "de": 0.1, "zh": 0.1}
    balanced = rebalance_to_mix(curated, mix)

    # 4. pack into token-budget training sequences, write by shard
    packed = pack_sequences(balanced, budget=2048, shards=4)
    out = os.path.join(workdir, "packed")
    (
        packed.join(balanced.select("doc_id", "lang", "text"), "doc_id")
        .write.partitionBy("shard")
        .parquet(out)
    )

    result = spark.read.parquet(out)
    print(f"input docs:        {n0}")
    print(f"after gate+dedup:  {curated.count()}")
    print(f"after rebalance:   {balanced.count()}")
    print(
        "packed buckets:    "
        f"{result.select('shard', 'seq_bucket').distinct().count()}"
    )
    print(f"output:            {out}")
    by_lang = {
        r["lang"]: r["count"]
        for r in result.groupBy("lang").count().collect()
    }
    print(f"language mix:      {by_lang}")


if __name__ == "__main__":
    main()
