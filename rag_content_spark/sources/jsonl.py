"""JSONL document source — the release format of the open pretraining
corpora (Dolma, C4, RedPajama, FineWeb all ship newline-delimited JSON,
usually gzipped).

``spark.read.json`` with an EXPLICIT schema: schema inference would
scan every file twice and silently widen types per crawl snapshot;
pinning the Dolma field set (id, text, source, added, metadata) keeps
one pass and a stable contract. Gzip decompression is native to the
line reader (.jsonl.gz just works, splittable per file).
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, functions as F

# the Dolma document schema (allenai/dolma data format, public spec):
# id + text required; source/added provenance; free-form metadata kept
# as a raw JSON string so unknown keys survive round-trips
DOLMA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("added", T.StringType()),
        T.StructField("metadata", T.StringType()),
    ]
)


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    glob: str = "*.jsonl*",
    schema: T.StructType = DOLMA_SCHEMA,
) -> DataFrame:
    """Read a JSONL corpus into the ``documents`` shape:
    (doc_id, text, source, added, metadata). ``doc_id`` is the Dolma id
    when present, else md5 of the text (content-addressed fallback).

    Corrupt lines land in ``_corrupt`` (PERMISSIVE mode) instead of
    failing the job — count them, don't die on one bad crawl record.
    """
    df = (
        spark.read.schema(
            T.StructType(
                list(schema) + [T.StructField("_corrupt", T.StringType())]
            )
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .json(path)
    )
    return df.select(
        F.coalesce(F.col("id"), F.md5(F.col("text"))).alias("doc_id"),
        "text",
        "source",
        "added",
        "metadata",
        "_corrupt",
    )


def corrupt_line_stats(docs: DataFrame) -> DataFrame:
    """One row: (n_rows, n_parsed, n_corrupt) — the ingest health
    check. A data column (text) is referenced alongside ``_corrupt``
    because Spark refuses scans whose only referenced column is the
    internal corrupt-record column."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("text").alias("n_parsed"),
        F.count("_corrupt").alias("n_corrupt"),
    )
