"""Crawl-to-trains-ready example: WARC ingest → per-line + Gopher
quality gates → DSIR importance resampling toward a target corpus →
BPE tokenizer induction + encode → Megatron .bin/.idx shards.

The library-API version of `cli.py curate --input-format warc
--dsir-target ...` followed by `cli.py tokenize`; every stage is one
operator and the whole flow stays lazy until each write.

Run: python examples/pretrain_data_pipeline.py
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rag_content_spark.operators.quality import gopher_rules, line_stats
from rag_content_spark.operators.selection import (
    bpe_encode_corpus,
    bpe_pair_counts,
    bpe_vocab,
    dsir_select,
)
from rag_content_spark.session import get_spark
from rag_content_spark.sinks.megatron import write_megatron_shards
from rag_content_spark.sources.warc import (
    read_warc_records,
    warc_responses_to_documents,
)


def _fake_crawl(folder: str) -> None:
    """Synthesize a tiny .warc.gz crawl (same record layout a real one
    has) so the example runs hermetically."""
    goodish = (
        "the retrieval engine ranks documents by score and returns "
        "results to the query while the index keeps the vectors sorted "
    )
    junky = "click here menu login menu click here menu login menu "
    records = []
    for i in range(12):
        body = (
            "<html><body><p>"
            + ((goodish if i % 3 else junky) * 8)
            + f"page {i}</p></body></html>"
        ).encode()
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        ).encode() + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{i}>\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"WARC-Target-URI: http://crawl.example/{i}\r\n"
            f"Content-Type: application/http\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        records.append(gzip.compress(head + http + b"\r\n\r\n"))
    with open(os.path.join(folder, "crawl-00000.warc.gz"), "wb") as f:
        f.write(b"".join(records))


def main() -> None:
    spark = get_spark("pretrain-example", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="pretrain_example_")
    crawl = os.path.join(work, "crawl")
    os.makedirs(crawl)
    _fake_crawl(crawl)

    # 1. ingest: WARC records -> documents schema
    docs = warc_responses_to_documents(read_warc_records(spark, crawl))
    print("crawled:", docs.count())

    # 2. quality gates: line-level tagger + Gopher rules
    tagged = docs.join(line_stats(docs), "doc_id")
    gated = tagged.filter(
        (F.col("frac_dup_lines") <= 0.3) & gopher_rules("text")["keep"]
    )
    print("after gates:", gated.count())

    # 3. targeted selection: DSIR resample toward a trusted target set
    target = spark.createDataFrame(
        [(i, "retrieval index ranks documents by score for the query " * 6)
         for i in range(4)],
        ["doc_id", "text"],
    )
    kept = gated.join(
        dsir_select(gated, target, k=6).select("doc_id"), "doc_id", "leftsemi"
    )
    print("after DSIR:", kept.count())

    # 4. tokenizer induction + encode + trains-ready export
    merges = [
        (r["lhs"], r["rhs"]) for r in bpe_pair_counts(kept, top_n=64).collect()
    ]
    vocab = bpe_vocab(kept, merges)
    encoded = bpe_encode_corpus(kept, merges, vocab=vocab)
    manifest = write_megatron_shards(
        encoded, os.path.join(work, "shards"), tokens_col="token_ids", n_shards=2
    ).collect()
    print("vocab:", vocab.count(), "shards:", [
        (m["shard"], m["n_seqs"], m["n_tokens"]) for m in manifest
    ])
    print("artifacts under:", work)


if __name__ == "__main__":
    main()
