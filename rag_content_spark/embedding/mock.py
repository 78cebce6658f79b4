"""Deterministic mock embedder (FIXTURES.md §6; reference tests use a
768-d mock, tests/conftest.py:17-27).

Two implementations with IDENTICAL output:

- ``mock_embedding_expr``: pure Column expression (JVM-side, used in
  oracle-checked queries — DuckDB renders the same formula).
- ``mock_embed_udf``: Arrow-batched pandas UDF (numpy-vectorized) — the
  same plan shape as the real model UDF, so pipelines can swap
  mock <-> real without changing the plan.

Formula: dim i of text t = (stable_hash64(t || ':' || i) % 1000000)
/ 1000000 * 2 - 1  — deterministic, distinct per text, in [-1, 1).
Optionally L2-normalized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.functions.vector import l2_normalize

DEFAULT_DIM = 768  # all-mpnet-base-v2 hidden size (reference embeddings_model/config.json)


def mock_embedding_expr(
    text_col: Column | str = "text", dim: int = 16, normalize: bool = False
) -> Column:
    """Column-expression mock embedding (ARRAY<DOUBLE> length ``dim``).

    DuckDB: list_transform(generate_series(0, dim-1),
              i -> (h60(x || ':' || i) % 1000000) / 1000000.0 * 2 - 1)
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    vec = F.array(
        *[
            (
                stable_hash64(F.concat(c, F.lit(f":{i}"))) % 1000000
            ).cast("double")
            / 1000000.0
            * 2.0
            - 1.0
            for i in range(dim)
        ]
    )
    if normalize:
        vec = F.transform(l2_normalize(vec), lambda x: F.round(x, 6))
    return vec


def _mock_embed_one(text: str, dim: int, normalize: bool) -> np.ndarray:
    # md5 prefix-state reuse: hash the text ONCE, then fork the running
    # state per dimension with .copy() — bit-identical to hashing
    # f"{text}:{i}" from scratch (incremental md5 == one-shot md5), ~6x
    # faster at dim=768 since the text bytes are no longer re-hashed
    # per dimension. Both engines of the baseline protocol share this
    # function, so the speedup is side-neutral.
    base = hashlib.md5(text.encode() + b":")
    vals = np.empty(dim, dtype=np.float64)
    for i in range(dim):
        h = base.copy()
        h.update(str(i).encode())
        vals[i] = (int(h.hexdigest()[:15], 16) % 1000000) / 1000000.0 * 2.0 - 1.0
    if normalize:
        n = np.linalg.norm(vals)
        if n > 0:
            vals = vals / n
        # mock_embedding_expr rounds after normalizing — keep the two
        # paths bit-identical (near-tie top-k order depends on it)
        vals = np.round(vals, 6)
    return vals


def mock_embed_udf(dim: int = DEFAULT_DIM, normalize: bool = True):
    """Arrow-batched pandas UDF producing the same vectors as
    :func:`mock_embedding_expr` (same md5-derived formula)."""

    @pandas_udf("array<double>")
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: _mock_embed_one("" if t is None else t, dim, normalize).tolist()
        )

    return _embed
