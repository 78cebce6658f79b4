from __future__ import annotations

import re

from llama_index.core.schema import Document, TextNode

_ATX = re.compile(r"^#{1,6}\s")


class MarkdownNodeParser:
    """Heading-delimited section split, fence-aware (the behavior the
    reference relies on for markdown/html/pdf doc types,
    document_processor.py:115-129)."""

    def get_nodes_from_documents(self, docs: list[Document]) -> list[TextNode]:
        nodes: list[TextNode] = []
        for doc in docs:
            for section in self._split(doc.text):
                nodes.append(TextNode(text=section, metadata=dict(doc.metadata)))
        return nodes

    @staticmethod
    def _split(text: str) -> list[str]:
        sections: list[str] = []
        current: list[str] = []
        in_fence = False
        for line in text.split("\n"):
            if line.lstrip().startswith("```"):
                in_fence = not in_fence
            if not in_fence and _ATX.match(line):
                if current:
                    sections.append("\n".join(current).strip("\n"))
                current = [line]
            else:
                current.append(line)
        if current:
            sections.append("\n".join(current).strip("\n"))
        return [s for s in sections if s.strip()]


class SentenceSplitter:
    """Token-window packer used for non-markdown doc types (the default
    node parser Settings falls back to)."""

    def __init__(self, chunk_size: int = 1024, chunk_overlap: int = 200):
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap

    def get_nodes_from_documents(self, docs: list[Document]) -> list[TextNode]:
        nodes: list[TextNode] = []
        step = max(1, self.chunk_size - self.chunk_overlap)
        for doc in docs:
            toks = doc.text.split()
            for start in range(0, max(len(toks), 1), step):
                window = toks[start : start + self.chunk_size]
                if window:
                    nodes.append(
                        TextNode(text=" ".join(window), metadata=dict(doc.metadata))
                    )
                if start + self.chunk_size >= len(toks):
                    break
        return nodes
