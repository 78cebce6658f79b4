"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship RAG pipeline on sf0.001: documents → markdown
                 synthesis → chunk → filter → mock-embed → top-k retrieval.
``queries``    — one entry per implemented operator (SURVEY §2 + north-star
                 extensions), from rag_content_spark.queries.
``oracle_sql`` — exact DuckDB equivalents (same aliases, same values).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rag_content_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end RAG build + query on sf0.001.

    documents → chunk (C1) → validity filters (P2/P3) → mock embedding
    (E1 twin) → exact top-k cosine retrieval (Q2) for a fixed query text.
    """
    from pyspark.sql import functions as F

    from rag_content_spark.embedding.mock import mock_embedding_expr
    from rag_content_spark.operators.chunking import chunk_fixed
    from rag_content_spark.operators.filters import has_whitespace
    from rag_content_spark.operators.similarity import top_k

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = (
        chunk_fixed(docs.select("doc_id", "text"), size=32, overlap=0)
        .filter(has_whitespace("chunk_text"))
        .select(
            F.concat_ws("#", F.col("doc_id").cast("string"), F.col("chunk_index")).alias(
                "chunk_id"
            ),
            F.col("chunk_text"),
            mock_embedding_expr("chunk_text", dim=16, normalize=True).alias(
                "embedding"
            ),
        )
    )
    # embed the query with the same embedder (driver-side single "inference")
    qrow = (
        spark.createDataFrame([("spark table join merge sort",)], ["text"])
        .select(mock_embedding_expr("text", dim=16, normalize=True).alias("v"))
        .collect()[0]
    )
    return top_k(
        chunks, list(qrow["v"]), k=5, metric="ip", id_col="chunk_id"
    ).select("chunk_id", "chunk_text", "score")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible query. Lazy (callable)
    oracles — ones that embed data-derived model constants as literals —
    are materialized here."""
    return Q.resolve_oracles()
