"""Minimal faiss stand-in for the baseline measurement (BASELINE.md step 2).

Only what the reference's faiss path touches (document_processor.py:239):
``IndexFlatIP(d)`` + ``add`` + ``ntotal``. Vectors are held as a numpy
matrix; persistence is handled by the FaissVectorStore shim.
"""

from __future__ import annotations

import numpy as np


class IndexFlatIP:
    def __init__(self, d: int):
        self.d = int(d)
        self._blocks: list[np.ndarray] = []
        self.ntotal = 0

    def add(self, x) -> None:
        arr = np.ascontiguousarray(np.asarray(x, dtype=np.float32))
        if arr.ndim != 2 or arr.shape[1] != self.d:
            raise ValueError(f"expected (n, {self.d}) matrix, got {arr.shape}")
        self._blocks.append(arr)
        self.ntotal += arr.shape[0]

    def matrix(self) -> np.ndarray:
        if not self._blocks:
            return np.empty((0, self.d), dtype=np.float32)
        return np.vstack(self._blocks)
