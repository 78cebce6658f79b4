"""Real sentence-transformers embedding UDF (E1).

The model (sentence-transformers/all-mpnet-base-v2: 768-d, max 384 tokens,
mean-pool + L2-normalize — reference embeddings_model/*) is NOT installed
in this container, so the UDF is import-gated; the plan shape (Arrow
batches, per-executor lazy singleton, normalize on) is real and tested
via the mock twin in ``mock.py``.

Scale design vs the reference's per-chunk sequential ``embeddings.create``
loop (document_processor.py:548-554):
- one model load per Python worker (module-level lazy singleton; enable
  ``spark.python.worker.reuse``)
- Arrow-batched ``model.encode(list_of_texts, batch_size=...)``
- ship the model DIRECTORY via SparkFiles / shared FS, never weights in
  closures (reference downloads per-process, scripts/download_embeddings_model.py)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.functions import pandas_udf

_MODEL = None  # per-Python-worker singleton


def _get_model(model_path: str):
    global _MODEL
    if _MODEL is None:
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as exc:  # container has no model libs
            raise NotImplementedError(
                "sentence-transformers not installed; use "
                "rag_content_spark.embedding.mock for deterministic tests"
            ) from exc
        _MODEL = SentenceTransformer(model_path, device="cpu")
    return _MODEL


def sentence_transformer_udf(model_path: str, batch_size: int = 64):
    """Iterator-of-series pandas UDF: the model loads once per worker and
    amortizes across ALL Arrow batches of the task, not per batch."""

    @pandas_udf("array<float>")
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = _get_model(model_path)
        for texts in batches:
            vecs = model.encode(
                texts.fillna("").tolist(),
                batch_size=batch_size,
                normalize_embeddings=True,  # the 2_Normalize module
            )
            yield pd.Series([v.tolist() for v in vecs])

    return _embed
