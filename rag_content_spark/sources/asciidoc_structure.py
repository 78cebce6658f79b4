"""AsciiDoc structure dumper — the reference's diagnostic tree print.

Reference: ``asciidoc/ruby_asciidoc/asciidoc_structure_dumper.rb:7-42``
(recursive node walk printing ``#<ClassName {context: ..., title: ...,
level: ..., text: ..., blocks: N}>`` lines, two-space indent per depth)
behind the CLI subcommand ``get_structure`` (``asciidoc/__main__.py:56-75``,
which shells out to ruby). Here the walk is a pure function over the same
line-level parse the S6 text converter uses (asciidoc_text.py) — no ruby
subprocess — emitting the dumper's exact line format:

- attribute ordering fixed at context, title, level, text, blocks (the
  Ruby hash insertion order);
- Ruby ``inspect`` value rendering: symbols ``:paragraph``, strings
  double-quoted with escapes, integers bare;
- a node only carries the attributes its class responds to (document /
  section: no text; paragraphs and list items: text; list containers:
  their items as child blocks).

Divergence (documented): block granularity is our structural parser's,
not asciidoctor's full model — tables/includes/conditionals surface as
paragraphs, matching the converter contract in asciidoc_text.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from rag_content_spark.sources.asciidoc_text import (
    _ADMONITION,
    _ATTR,
    _DLIST,
    _HEADING,
    _IMAGE,
    _OLIST,
    _SOURCE_ATTR,
    _ULIST,
)


@dataclass
class AdocNode:
    klass: str
    context: str
    level: int
    title: str | None = None
    text: str | None = None
    has_text_attr: bool = False
    blocks: list["AdocNode"] | None = field(default_factory=list)


def _ruby_inspect(value) -> str:
    if value is None:
        return "nil"
    if isinstance(value, str):
        body = (
            value.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
        )
        return f'"{body}"'
    return str(value)


def parse_structure(src: str) -> AdocNode:
    """Parse AsciiDoc source into the dumper's node tree: a document
    node, one section node per heading, leaf blocks in between."""
    doc = AdocNode("Asciidoctor::Document", "document", 0, title=None)
    stack: list[AdocNode] = [doc]

    def container() -> AdocNode:
        return stack[-1]

    lines = src.split("\n")
    i, n = 0, len(lines)
    para: list[str] = []

    def flush() -> None:
        if para:
            container().blocks.append(
                AdocNode(
                    "Asciidoctor::Block",
                    "paragraph",
                    container().level,
                    text="\n".join(para),
                    has_text_attr=True,
                )
            )
            para.clear()

    def fenced(idx: int, fence: str) -> tuple[list[str], int]:
        body: list[str] = []
        while idx < n and lines[idx].rstrip() != fence:
            body.append(lines[idx])
            idx += 1
        return body, idx + 1

    while i < n:
        stripped = lines[i].rstrip()
        if stripped.startswith("//") or _ATTR.match(stripped) or _SOURCE_ATTR.match(stripped):
            i += 1
            continue
        if stripped in ("----", "....", "____"):
            flush()
            ctx = {"----": "listing", "....": "literal", "____": "quote"}[stripped]
            body, i = fenced(i + 1, stripped)
            container().blocks.append(
                AdocNode(
                    "Asciidoctor::Block",
                    ctx,
                    container().level,
                    text="\n".join(body),
                    has_text_attr=True,
                )
            )
            continue
        if not stripped:
            flush()
            i += 1
            continue
        m = _HEADING.match(stripped)
        if m:
            flush()
            eqs, title = len(m.group(1)), m.group(2)
            if eqs == 1 and doc.title is None and len(stack) == 1:
                doc.title = title
                i += 1
                continue
            level = max(eqs - 1, 1)
            while len(stack) > 1 and stack[-1].level >= level:
                stack.pop()
            sec = AdocNode(
                "Asciidoctor::Section", "section", level, title=title
            )
            stack[-1].blocks.append(sec)
            stack.append(sec)
            i += 1
            continue
        m = _IMAGE.match(stripped)
        if m:
            flush()
            container().blocks.append(
                AdocNode(
                    "Asciidoctor::Block",
                    "image",
                    container().level,
                    title=m.group(2) or None,
                )
            )
            i += 1
            continue
        m = _ADMONITION.match(stripped)
        if m:
            flush()
            container().blocks.append(
                AdocNode(
                    "Asciidoctor::Block",
                    "admonition",
                    container().level,
                    text=m.group(2),
                    has_text_attr=True,
                )
            )
            i += 1
            continue
        if _ULIST.match(stripped) or _OLIST.match(stripped):
            flush()
            pat = _ULIST if _ULIST.match(stripped) else _OLIST
            ctx = "ulist" if pat is _ULIST else "olist"
            lst = AdocNode(
                "Asciidoctor::List", ctx, container().level
            )
            while i < n and (m := pat.match(lines[i].rstrip())):
                lst.blocks.append(
                    AdocNode(
                        "Asciidoctor::ListItem",
                        "list_item",
                        lst.level,
                        text=m.group(1),
                        has_text_attr=True,
                    )
                )
                i += 1
            container().blocks.append(lst)
            continue
        m = _DLIST.match(stripped)
        if m and not stripped.startswith("http"):
            flush()
            container().blocks.append(
                AdocNode(
                    "Asciidoctor::Block",
                    "dlist",
                    container().level,
                    text=stripped,
                    has_text_attr=True,
                )
            )
            i += 1
            continue
        para.append(stripped)
        i += 1
    flush()
    return doc


def dump_node(node: AdocNode, indent: int = 0) -> list[str]:
    """One node -> its dumper lines (asciidoc_structure_dumper.rb:7-42):
    ``'  ' * depth + #<Class {attrs}>`` then children at indent + 2."""
    attrs: list[str] = [f"context: :{node.context}"]
    if node.context in ("document", "section") or node.title is not None:
        attrs.append(f"title: {_ruby_inspect(node.title)}")
    attrs.append(f"level: {node.level}")
    if node.has_text_attr:
        attrs.append(f"text: {_ruby_inspect(node.text)}")
    attrs.append(f"blocks: {len(node.blocks)}")
    line = f"{' ' * indent}#<{node.klass} {{{', '.join(attrs)}}}>"
    out = [line]
    for child in node.blocks:
        out.extend(dump_node(child, indent + 2))
    return out


def dump_structure(src: str) -> str:
    """The CLI-facing dump: parse + walk, newline-joined (the Ruby script
    ``puts`` one line per node)."""
    return "\n".join(dump_node(parse_structure(src)))
