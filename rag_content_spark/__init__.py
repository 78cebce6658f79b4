"""rag_content_spark — a PySpark-native re-expression of the
lightspeed-core/rag-content RAG vector-pipeline capabilities.

The reference (/root/reference, studied read-only) is a single-process,
eager, row-at-a-time Python pipeline: read documents -> enrich metadata ->
chunk -> filter degenerate chunks -> embed -> persist to a vector store,
plus an exact top-k query surface (scripts/query_rag.py).

This package re-expresses that capability as lazy, declarative Spark
DataFrame plans designed for 100 TB scale:

- ``sources``   : directory/document readers (reference document_processor.py:856-865)
- ``operators`` : chunking, filters, metadata, dedup, similarity, text analysis
- ``functions`` : shared column-expression library (hashing, vector math, text)
- ``embedding`` : Arrow-batched pandas-UDF embedders (mock + real, import-gated)
- ``sinks``     : canonical Parquet index + export writers (FAISS/pgvector/configs)
- ``plans``     : end-to-end build + query pipelines
- ``streaming`` : Structured Streaming ingest (extension; reference is batch-only)
"""

__version__ = "0.1.0"
