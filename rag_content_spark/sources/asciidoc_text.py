"""S6 fallback: AsciiDoc → text implementing the reference Ruby text
converter's OUTPUT CONTRACT (asciidoc/ruby_asciidoc/asciidoc_text_converter.rb):

- document title ``= T`` → ``# T``; a ``==`` section is asciidoctor
  level 1 → ``# T`` (every heading demotes one level: ``#`` * level);
- ulist ``* item`` → ``* item``; olist ``. item`` → ``1. item`` …;
  dlist ``term:: desc`` → ``term:: desc``;
- listing ``[source,lang]`` + ``----`` → ```` ```lang\\n…\\n``` ````;
  literal ``....`` → decoded content; quote blocks → ``> …``;
- admonition ``NOTE: x`` → ``[NOTE]\\n----\\nx\\n----``;
- image ``image::target[alt]`` → ``![alt]``;
- the converter's exact entity-decode table (``&amp;`` replaced last).

Block separator is a blank line (``\\n\\n`` join), matching the Ruby
converter's ``join("\\n\\n")``. This is a line-level structural parser,
not a full asciidoctor: tables/includes/conditionals pass through as
paragraphs — when the real asciidoctor binary is present,
``convert_asciidoc`` uses it instead (sources/converters.py).
"""

from __future__ import annotations

import re

# asciidoc_text_converter.rb `decode` — same pairs, same order
# (&amp; must be LAST so it doesn't half-decode other entities).
ASCIIDOC_ENTITY_TABLE: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&#43;", "+"),
    ("&#160;", " "),
    ("&#174;", "(R)"),
    ("&#8201;", " "),
    ("&#8211;", "-"),
    ("&#8212;", "-"),
    ("&#8216;", "'"),
    ("&#8217;", "'"),
    ("&#8220;", '"'),
    ("&#8221;", '""'),
    ("&#8592;", "<-"),
    ("&#8594;", "->"),
    ("&#8656;", "->"),
    ("&#8658;", "<-"),
    ("&amp;", "&"),
    ("\\'", "'"),
)


def asciidoc_entity_decode(s: str) -> str:
    for ent, rep in ASCIIDOC_ENTITY_TABLE:
        s = s.replace(ent, rep)
    return s.rstrip()


_HEADING = re.compile(r"^(=+)\s+(.*)$")
_ULIST = re.compile(r"^\*+\s+(.*)$")
_OLIST = re.compile(r"^\.+\s+(.*)$")
_DLIST = re.compile(r"^(\S.*?)::(\s+(.*))?$")
_IMAGE = re.compile(r"^image::([^\[]+)\[([^\]]*)\]\s*$")
_ADMONITION = re.compile(r"^(NOTE|TIP|IMPORTANT|WARNING|CAUTION):\s+(.*)$")
_ATTR = re.compile(r"^:[-\w]+:.*$")
_SOURCE_ATTR = re.compile(r"^\[source(?:\s*,\s*([-\w]+))?[^\]]*\]\s*$")


def asciidoc_to_text(src: str) -> str:
    """Convert AsciiDoc source to the reference converter's text form."""
    blocks: list[str] = []
    para: list[str] = []
    lines = src.split("\n")
    i = 0
    n = len(lines)
    seen_heading = False
    pending_lang: str | None = None

    def flush() -> None:
        if para:
            blocks.append(asciidoc_entity_decode("\n".join(para)))
            para.clear()

    def collect_until(idx: int, fence: str) -> tuple[list[str], int]:
        body: list[str] = []
        while idx < n and lines[idx].rstrip() != fence:
            body.append(lines[idx])
            idx += 1
        return body, idx + 1  # skip the closing fence

    while i < n:
        line = lines[i]
        stripped = line.rstrip()

        if stripped.startswith("//") or _ATTR.match(stripped):
            i += 1
            continue

        m = _SOURCE_ATTR.match(stripped)
        if m:
            pending_lang = m.group(1) or ""
            i += 1
            continue

        if stripped == "----":
            flush()
            body, i = collect_until(i + 1, "----")
            lang = pending_lang or ""
            pending_lang = None
            blocks.append(
                "\n```" + asciidoc_entity_decode(lang)
                + "\n" + asciidoc_entity_decode("\n".join(body)) + "\n```\n"
            )
            continue

        if stripped == "....":
            flush()
            body, i = collect_until(i + 1, "....")
            blocks.append(asciidoc_entity_decode("\n".join(body)))
            continue

        if stripped == "____":
            flush()
            body, i = collect_until(i + 1, "____")
            blocks.append("> " + asciidoc_entity_decode("\n".join(body)))
            continue

        if not stripped:
            flush()
            pending_lang = None
            i += 1
            continue

        m = _HEADING.match(stripped)
        if m:
            flush()
            eqs, title = len(m.group(1)), m.group(2)
            if eqs == 1 and not seen_heading:
                # document title: convert_document's "# " + doctitle
                blocks.append("# " + asciidoc_entity_decode(title))
            else:
                # section level = eqs - 1; converter emits '#' * level
                blocks.append("#" * max(eqs - 1, 1) + " " + asciidoc_entity_decode(title))
            seen_heading = True
            i += 1
            continue

        m = _IMAGE.match(stripped)
        if m:
            flush()
            blocks.append(f"![{m.group(2)}]")
            i += 1
            continue

        m = _ADMONITION.match(stripped)
        if m:
            flush()
            blocks.append(
                asciidoc_entity_decode(
                    f"\n[{m.group(1)}]\n----\n{m.group(2)}\n----\n"
                )
            )
            i += 1
            continue

        m = _ULIST.match(stripped)
        if m:
            flush()
            items = []
            while i < n and (m := _ULIST.match(lines[i].rstrip())):
                items.append("* " + asciidoc_entity_decode(m.group(1)))
                i += 1
            blocks.append("\n".join(items))
            continue

        m = _OLIST.match(stripped)
        if m:
            flush()
            items = []
            idx = 1
            while i < n and (m := _OLIST.match(lines[i].rstrip())):
                items.append(f"{idx}. " + asciidoc_entity_decode(m.group(1)))
                idx += 1
                i += 1
            blocks.append("\n".join(items))
            continue

        m = _DLIST.match(stripped)
        if m and not stripped.startswith("http"):
            flush()
            items = []
            while i < n and (m := _DLIST.match(lines[i].rstrip())):
                term = asciidoc_entity_decode(m.group(1))
                desc = asciidoc_entity_decode(m.group(3) or "")
                items.append(f"{term}:: {desc}")
                i += 1
            blocks.append("\n".join(items))
            continue

        para.append(stripped)
        i += 1

    flush()
    return "\n\n".join(b for b in blocks if b != "")
