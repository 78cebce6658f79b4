from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from llama_index.core.node_parser import SentenceSplitter
from llama_index.core.schema import Document


class _SettingsMeta(type):
    @property
    def text_splitter(cls):
        # llama-index aliases text_splitter to the configured node_parser,
        # falling back to a SentenceSplitter built from chunk_size/overlap.
        if cls.node_parser is None:
            cls.node_parser = SentenceSplitter(
                chunk_size=cls.chunk_size, chunk_overlap=cls.chunk_overlap
            )
        return cls.node_parser


class Settings(metaclass=_SettingsMeta):
    chunk_size: int = 1024
    chunk_overlap: int = 200
    node_parser = None
    embed_model = None
    llm = None


class SimpleDirectoryReader:
    """Recursive directory walk -> one Document per file, metadata from the
    file_metadata callback (the reference wires MetadataProcessor.populate
    here, document_processor.py:856-862)."""

    def __init__(
        self,
        input_dir: str,
        recursive: bool = False,
        file_metadata=None,
        required_exts=None,
        file_extractor=None,
    ):
        self.input_dir = input_dir
        self.recursive = recursive
        self.file_metadata = file_metadata
        self.required_exts = required_exts
        self.file_extractor = file_extractor or {}

    def _iter_files(self):
        pattern = "**/*" if self.recursive else "*"
        for p in sorted(Path(self.input_dir).glob(pattern)):
            if not p.is_file():
                continue
            if self.required_exts and p.suffix not in self.required_exts:
                continue
            yield p

    def load_data(self, num_workers: int = 0) -> list[Document]:
        docs: list[Document] = []
        for p in self._iter_files():
            metadata = self.file_metadata(str(p)) if self.file_metadata else {}
            reader = self.file_extractor.get(p.suffix)
            if reader is not None:
                for doc in reader.load_data(p, extra_info=metadata):
                    docs.append(doc)
                continue
            text = p.read_text(encoding="utf-8", errors="replace")
            docs.append(Document(text=text, metadata=metadata))
        return docs


class VectorStoreIndex:
    """Embeds every node through Settings.embed_model and adds the vectors
    to the vector store (the cost the reference pays at save time,
    document_processor.py:271-279)."""

    def __init__(self, nodes, storage_context=None, show_progress: bool = False):
        self.nodes = list(nodes)
        self.storage_context = storage_context
        self.index_id = "index"
        texts = [n.text for n in self.nodes]
        embeddings = Settings.embed_model.get_text_embedding_batch(texts)
        self.embeddings = np.asarray(embeddings, dtype=np.float32)
        vs = getattr(storage_context, "vector_store", None)
        if vs is not None:
            vs.add_embeddings(self.embeddings)
        if storage_context is not None:
            storage_context._index = self

    def set_index_id(self, index_id: str) -> None:
        self.index_id = index_id
