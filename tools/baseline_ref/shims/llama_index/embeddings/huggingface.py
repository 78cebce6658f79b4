"""Deterministic embedder with the exact per-text cost of the Spark
side's mock UDF — both call rag_content_spark.embedding.mock._mock_embed_one,
so the wall-clock comparison isolates pipeline overhead, not model FLOPs.
"""

from __future__ import annotations

from rag_content_spark.embedding.mock import DEFAULT_DIM, _mock_embed_one


class HuggingFaceEmbedding:
    def __init__(self, model_name: str = "", dim: int = DEFAULT_DIM):
        self.model_name = model_name
        self.dim = dim

    def get_text_embedding(self, text: str):
        return _mock_embed_one(text, self.dim, True).tolist()

    def get_text_embedding_batch(self, texts, show_progress: bool = False):
        return [self.get_text_embedding(t) for t in texts]
