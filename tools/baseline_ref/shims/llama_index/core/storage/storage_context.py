from __future__ import annotations

import json
import os


class StorageContext:
    def __init__(self, vector_store=None):
        self.vector_store = vector_store
        self._index = None

    @classmethod
    def from_defaults(cls, vector_store=None) -> "StorageContext":
        return cls(vector_store=vector_store)

    def persist(self, persist_dir: str) -> None:
        """Write docstore + index-store JSON and the vector-store payload —
        the same artifact set llama-index persists for the reference
        (document_processor.py:279)."""
        os.makedirs(persist_dir, exist_ok=True)
        index = self._index
        docstore = {
            node.id_: {"text": node.text, "metadata": node.metadata}
            for node in (index.nodes if index else [])
        }
        with open(
            os.path.join(persist_dir, "docstore.json"), "w", encoding="utf-8"
        ) as f:
            json.dump(docstore, f)
        with open(
            os.path.join(persist_dir, "index_store.json"), "w", encoding="utf-8"
        ) as f:
            json.dump(
                {
                    "index_id": index.index_id if index else None,
                    "nodes": list(docstore.keys()),
                },
                f,
            )
        if self.vector_store is not None:
            self.vector_store.persist(persist_dir)
