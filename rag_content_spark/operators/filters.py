"""Chunk/document validity filters (SURVEY §2.2).

P2 whitespace filter   — reference document_processor.py:131-137
P3 markdown content    — reference document_processor.py:139-202
P4 node-type filter    — subsumed (chunks DF rows are always text nodes)
P5 unreachable policy  — reference document_processor.py:828-896
P6 score threshold     — reference scripts/query_rag.py:81-94

All are pure Column predicates, so Catalyst can push them below anything
opaque (and we place them before the embedding UDF ourselves — Catalyst
won't reorder across Python UDFs, SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

MARKDOWN_LIKE_DOC_TYPES = ("markdown", "html", "pdf")  # reference document_processor.py:51


def has_whitespace(col: Column | str = "text") -> Column:
    """P2: a chunk with no whitespace at all is invalid
    (reference _got_whitespace, document_processor.py:131-137).

    DuckDB: regexp_matches(x, '\\s')
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"\s")


# Per-line classifiers (reference document_processor.py:151-196):
_ATX_HEADER = r"^\s{0,3}#{1,6}(\s.*)?$"  # '# ...' or bare '#'
_SETEXT_OR_HR = r"^\s{0,3}(=+|-+|\*{3,}|_{3,})\s*$"  # underline / horizontal rule
_FENCE = r"^\s{0,3}(```+|~~~+).*$"  # code-fence marker line


def _is_content_line(line: Column) -> Column:
    """A line carries content iff it is non-blank and is not a header,
    setext underline / horizontal rule, or fence marker.

    Fence *markers* never count; lines inside a fence count like any other
    line, so an empty fenced block contributes nothing (matching the
    reference's invalid 'empty code block' cases,
    tests/test_document_processor_llama_index.py:136-155).
    """
    blank = ~line.rlike(r"\S")  # trim() strips only spaces, not tabs
    return ~(
        blank
        | line.rlike(_ATX_HEADER)
        | line.rlike(_SETEXT_OR_HR)
        | line.rlike(_FENCE)
    )


def markdown_has_content(col: Column | str = "text") -> Column:
    """P3: True iff at least one line carries real content
    (reference _got_content, document_processor.py:139-202).

    DuckDB mirror: EXISTS over regexp_split_to_array(x, chr(10)) with the
    same three line regexes.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.exists(F.split(c, "\n"), _is_content_line)


def valid_chunk(text_col: str = "text", doc_type_col: str = "doc_type") -> Column:
    """Combined P2+P3 gate, P3 applied only to markdown-like doc types
    (reference document_processor.py:204-208)."""
    markdown_like = F.col(doc_type_col).isin(*MARKDOWN_LIKE_DOC_TYPES)
    return has_whitespace(text_col) & (
        ~markdown_like | markdown_has_content(text_col)
    )


def apply_unreachable_policy(
    df: DataFrame,
    action: str = "warn",
    ignore_list: list[str] | None = None,
    url_col: str = "url_reachable",
    title_col: str = "title",
) -> DataFrame:
    """P5 (reference document_processor.py:867-891):

    - ``warn``: keep everything (logging is an observability concern)
    - ``fail``: raise if any unreachable doc exists
    - ``drop``: remove unreachable docs unless their title is ignored
    """
    ignore_list = ignore_list or []
    unreachable = ~F.col(url_col)
    ignored = F.col(title_col).isin(ignore_list) if ignore_list else F.lit(False)
    if action == "warn":
        return df
    if action == "fail":
        # LIMIT 1 scan — cheap existence probe, no full count at scale
        if df.filter(unreachable & ~ignored).limit(1).count() > 0:
            raise RuntimeError("unreachable URLs present and action='fail'")
        return df
    if action == "drop":
        return df.filter(~unreachable | ignored)
    raise ValueError(f"unknown unreachable_action: {action}")


def score_threshold_gate(
    df: DataFrame,
    threshold: float,
    score_col: str = "score",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """P6 (reference query_rag.py:81-94): all-or-nothing gate — if the TOP
    score is below the threshold the whole result set is dropped (the
    reference checks ``nodes[0].score`` only).

    Implemented as a window max so it works for batch-of-queries too.
    """
    w = Window.partitionBy(*(partition_cols or []))
    return (
        df.withColumn("_max_score", F.max(score_col).over(w))
        .filter(F.col("_max_score") >= F.lit(threshold))
        .drop("_max_score")
    )
