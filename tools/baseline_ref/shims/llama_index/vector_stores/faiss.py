from __future__ import annotations

import os

import numpy as np


class FaissVectorStore:
    def __init__(self, faiss_index):
        self.faiss_index = faiss_index

    def add_embeddings(self, matrix) -> None:
        self.faiss_index.add(matrix)

    def persist(self, persist_dir: str) -> None:
        np.save(
            os.path.join(persist_dir, "vector_store.npy"),
            self.faiss_index.matrix(),
        )
