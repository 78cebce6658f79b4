"""Minimal python-frontmatter stand-in (reference metadata_processor.py:22).

Parses a leading ``---`` YAML block with flat ``key: value`` lines — the
shape of the rendered baseline corpus. Not a YAML parser.
"""

from __future__ import annotations


class _Post:
    def __init__(self, meta: dict, content: str):
        self._meta = meta
        self.content = content

    def get(self, key, default=None):
        return self._meta.get(key, default)


def load(path) -> _Post:
    with open(path, "r", encoding="utf-8") as f:
        text = f.read()
    meta: dict = {}
    content = text
    if text.startswith("---"):
        end = text.find("\n---", 3)
        if end != -1:
            for line in text[3:end].strip().splitlines():
                if ":" in line:
                    k, _, v = line.partition(":")
                    meta[k.strip()] = v.strip().strip("\"'")
            content = text[end + 4 :].lstrip("\n")
    return _Post(meta, content)
