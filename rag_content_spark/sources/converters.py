"""Binary document converters: HTML (S4), PDF (S5), AsciiDoc (S6).

The reference converts HTML/PDF to markdown with docling
(html/html_reader.py:49-109, pdf/pdf_reader.py:83-149; OCR off, table
structure ACCURATE, warn when output < 50 chars) and AsciiDoc via an
``asciidoctor`` subprocess with a custom Ruby converter
(asciidoc/asciidoctor_converter.py:64-189).

docling/asciidoctor are NOT in this container, so the converter bodies are
import/binary-gated with a deterministic fallback; the Spark plumbing —
binaryFile input, size-balanced partitions, Arrow-batched mapInPandas, one
converter instance per worker — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.types as T
from pyspark.sql import DataFrame

CONVERTED_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("conversion_warning", T.StringType()),
    ]
)

SCANNED_PDF_MIN_CHARS = 50  # reference pdf/pdf_reader.py:67

_CONVERTER = None  # per-worker docling singleton


def _get_docling(fmt: str):
    global _CONVERTER
    if _CONVERTER is None:
        from docling.document_converter import DocumentConverter  # import-gated

        _CONVERTER = DocumentConverter()
    return _CONVERTER


def _html_to_markdown(txt: str) -> str:
    """Deterministic HTML → markdown downgrade matching the reference's
    *output contract* (html_reader.py:92-108: docling export_to_markdown —
    headings/paragraphs/lists survive as markdown) so downstream C2
    heading-split and P3 content-filter behave the same on the fallback
    path. Not a full HTML parser: regex block mapping, good enough for
    structure preservation."""
    import html as htmllib
    import re

    txt = re.sub(r"(?is)<head\b.*?</head>", " ", txt)
    txt = re.sub(r"(?is)<(script|style)\b.*?</\1>", " ", txt)
    txt = re.sub(r"(?s)<!--.*?-->", " ", txt)

    def _heading(m: "re.Match[str]") -> str:
        level = int(m.group(1))
        inner = re.sub(r"<[^>]+>", " ", m.group(2))
        inner = re.sub(r"\s+", " ", inner).strip()
        return "\n\n" + "#" * level + " " + inner + "\n\n"

    txt = re.sub(r"(?is)<h([1-6])[^>]*>(.*?)</h\1>", _heading, txt)

    def _li(m: "re.Match[str]") -> str:
        inner = re.sub(r"<[^>]+>", " ", m.group(1))
        return "\n- " + re.sub(r"\s+", " ", inner).strip()

    txt = re.sub(r"(?is)<li[^>]*>(.*?)</li>", _li, txt)
    txt = re.sub(
        r"(?i)</(p|div|section|article|table|ul|ol|blockquote|pre)>",
        "\n\n",
        txt,
    )
    txt = re.sub(r"(?i)<br[^>]*/?>|</tr>", "\n", txt)
    txt = re.sub(r"<[^>]+>", " ", txt)
    txt = htmllib.unescape(txt)
    txt = "\n".join(
        re.sub(r"[ \t]+", " ", line).strip() for line in txt.split("\n")
    )
    return re.sub(r"\n{3,}", "\n\n", txt).strip()


def _fallback_decode(content: bytes, doc_type: str) -> str:
    """Deterministic no-docling fallback: HTML → markdown-shaped downgrade
    (:func:`_html_to_markdown`); PDF → empty (triggers the scanned-PDF
    warning path, like the reference's < 50 chars branch,
    pdf/pdf_reader.py:133-141)."""
    if doc_type == "html":
        return _html_to_markdown(content.decode("utf-8", errors="replace"))
    return ""


def convert_html_string_to_markdown(
    html_content: str, document_name: str | None = None
) -> str:
    """String-in/string-out HTML → markdown convenience API (reference
    html_reader.py:132-160): the real path uses docling's string
    converter when importable; otherwise the same deterministic
    markdown-shaped downgrade the binary path uses, so both entry
    points produce identical structure for downstream C2/P3.

    Empty input returns "" (reference parity); a docling failure raises
    RuntimeError like the reference."""
    if not html_content:
        return ""
    try:
        converter = _get_docling("html")
    except Exception:
        return _html_to_markdown(html_content)
    try:  # pragma: no cover - docling not importable in this container
        result = converter.convert_string(
            content=html_content, format="html", name=document_name
        )
        return result.document.export_to_markdown()
    except Exception as exc:
        raise RuntimeError(f"Failed to convert HTML string: {exc}") from exc


def convert_binary_documents(binary_df: DataFrame) -> DataFrame:
    """S4/S5: binary (path, content) rows → markdown text rows.

    mapInPandas so the (heavy) converter loads once per worker and each
    task streams Arrow batches; upstream should be
    ``rebalance_by_bytes`` (sources/directory.py) because conversion cost
    follows file size.
    """

    def _convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            _get_docling("any")
            have_docling = True
        except Exception:
            have_docling = False
        for pdf in batches:
            texts, warns = [], []
            for content, doc_type in zip(pdf["content"], pdf["doc_type"]):
                raw = bytes(content) if content is not None else b""
                if have_docling:
                    # Real path: docling convert to markdown (reference
                    # html_reader.py:92-108 / pdf_reader.py:120-132).
                    import io  # pragma: no cover - not reachable in container

                    result = _CONVERTER.convert(io.BytesIO(raw))
                    text = result.document.export_to_markdown()
                else:
                    text = _fallback_decode(raw, doc_type)
                warn = None
                if doc_type == "pdf" and len(text) < SCANNED_PDF_MIN_CHARS:
                    warn = "possible scanned PDF: almost no text extracted"
                texts.append(text)
                warns.append(warn)
            yield pd.DataFrame(
                {
                    "file_path": pdf["file_path"],
                    "doc_type": pdf["doc_type"],
                    "doc_id": pdf["doc_id"],
                    "text": texts,
                    "conversion_warning": warns,
                }
            )

    return binary_df.mapInPandas(_convert, schema=CONVERTED_SCHEMA)


def convert_asciidoc(df: DataFrame, target_format: str = "text") -> DataFrame:
    """S6: AsciiDoc → text via the ``asciidoctor`` binary, as a
    mapPartitions subprocess stage (reference asciidoctor_converter.py:64-189
    shells out per file; we amortize one process check per partition).

    Binary-gated: without asciidoctor installed, the structural
    fallback :mod:`rag_content_spark.sources.asciidoc_text` runs — it
    implements the reference Ruby text converter's output contract
    (heading demotion, list/dlist/listing/admonition forms, the exact
    entity-decode table).
    """
    import shutil
    import subprocess

    from rag_content_spark.sources.asciidoc_text import asciidoc_to_text

    def _convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        have_bin = shutil.which("asciidoctor") is not None
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                src = text or ""
                if have_bin:
                    proc = subprocess.run(  # pragma: no cover - needs ruby
                        ["asciidoctor", "-b", target_format, "-o", "-", "-"],
                        input=src.encode(),
                        capture_output=True,
                        timeout=60,
                    )
                    out.append(proc.stdout.decode("utf-8", errors="replace"))
                else:
                    out.append(asciidoc_to_text(src))
            pdf = pdf.copy()
            pdf["text"] = out
            yield pdf

    return df.mapInPandas(_convert, schema=df.schema)
