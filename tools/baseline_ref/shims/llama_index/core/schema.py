from __future__ import annotations

import itertools

_ids = itertools.count()


class Document:
    def __init__(self, text: str = "", metadata: dict | None = None, id_=None):
        self.text = text
        self.metadata = metadata or {}
        self.id_ = id_ if id_ is not None else f"doc-{next(_ids)}"


class TextNode:
    def __init__(self, text: str = "", metadata: dict | None = None, id_=None):
        self.text = text
        self.metadata = metadata or {}
        self.id_ = id_ if id_ is not None else f"node-{next(_ids)}"

    def __repr__(self) -> str:
        return f"TextNode(id={self.id_!r}, text={self.text[:40]!r}...)"
