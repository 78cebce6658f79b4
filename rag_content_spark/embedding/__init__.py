"""Embedding UDFs (E1, SURVEY §2.9).

The reference embeds per-chunk sequentially (document_processor.py:548-554)
— its dominant cost. Here embedding is an Arrow-batched pandas UDF with a
per-executor lazy model singleton: the batching the reference lacks.
"""

from rag_content_spark.embedding.mock import mock_embed_udf, mock_embedding_expr

__all__ = ["mock_embed_udf", "mock_embedding_expr"]
