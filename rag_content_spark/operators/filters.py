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

    DuckDB: regexp_matches(x, queries._PY_WS_SQL) — the same explicit
    Python-whitespace class on both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(f"[{_PY_WS}]")


# Exact _got_content semantics (reference document_processor.py:139-199).
# The walk is stateful — a ``` fence toggles, any line inside a fence is
# content, a setext underline CONSUMES the line above it (skip two), a
# 4-space-indented raw line is content, any '#'-prefixed stripped line is
# a header (no space required), and horizontal rules are all-=/- strings
# only. Expressed as one JVM-side F.aggregate fold over the lines (no
# Python UDF in the hot path); tests port every parametrized case from
# reference tests/test_document_processor_llama_index.py:118-155.

_EQ_DASH_RE = r"^[=\-]+$"
# Python's whitespace set (re \s == str.strip() == str.isspace(), exact
# enumeration): Java's default \s is ASCII-only and misses 1C-1F, NEL,
# NBSP and the Zs block — the reference strips/matches the full set
_PY_WS = (
    "\\s\\u001C-\\u001F\\u0085\\u00A0\\u1680"
    "\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000"
)
_PYSTRIP_RE = f"(^[{_PY_WS}]+)|([{_PY_WS}]+$)"  # Python str.strip()
# str.splitlines() separators beyond \n (CRLF first so it counts as ONE)
_LINEBREAK_RE = "\\r\\n|[\\r\\u000B\\f\\u001C\\u001D\\u001E\\u0085\\u2028\\u2029]"


def got_content_py(text: str) -> bool:
    """Plain-Python twin of :func:`markdown_has_content` (driver-side /
    test oracle). Same state walk as the Spark fold below."""
    lines = text.splitlines()
    in_fence = False
    i = 0
    while i < len(lines):
        raw = lines[i]
        line = raw.strip()
        if not line:
            i += 1
            continue
        if raw.startswith("    "):  # indented code block with content
            return True
        if line.startswith("```"):
            in_fence = not in_fence
            i += 1
            continue
        if in_fence:
            return True
        if line.startswith("#"):  # ATX header (space not required)
            i += 1
            continue
        if line and all(ch in "=-" for ch in line):  # horizontal rule
            i += 1
            continue
        nxt = lines[i + 1].strip() if i + 1 < len(lines) else ""
        if nxt and all(ch in "=-" for ch in nxt):  # setext: consume both
            i += 2
            continue
        return True
    return False


def markdown_has_content(col: Column | str = "text") -> Column:
    """P3: True iff at least one line carries real content
    (reference _got_content, document_processor.py:139-199) — exact
    state-machine semantics as a single aggregate fold.

    DuckDB mirror: list_reduce over the same per-line CASE (see
    queries._HAS_CONTENT_SQL).
    """
    c = F.col(col) if isinstance(col, str) else col
    # normalize the full str.splitlines() separator set to \n BEFORE
    # splitting — the reference walks splitlines() output, so a CRLF (or
    # NEL/VT/FF/FS/GS/RS/LS/PS) corpus must see the same lines with no
    # stray \r surviving into the raw-prefix checks
    c = F.regexp_replace(c, _LINEBREAK_RE, "\n")
    lines = F.split(c, "\n")
    # Pair each raw line with its successor for the setext lookahead.
    # zip_with pads the shorter side with NULL, so the last line gets
    # nxt = NULL. (slice-based tail: one extra eval of the split, not a
    # per-element F.get re-eval of it.)
    tail = F.slice(lines, 2, F.greatest(F.size(lines), F.lit(1)))
    items = F.zip_with(
        lines, tail, lambda a, b: F.struct(a.alias("raw"), b.alias("nxt"))
    )

    def _st(fence: Column, skip: Column, found: Column) -> Column:
        return F.struct(
            fence.alias("fence"), skip.alias("skip"), found.alias("found")
        )

    def _step(acc: Column, x: Column) -> Column:
        raw, nxt = x["raw"], x["nxt"]
        line = F.regexp_replace(raw, _PYSTRIP_RE, "")
        t, f = F.lit(True), F.lit(False)
        return (
            # found is terminal; skip consumes exactly this line
            F.when(acc["found"] | acc["skip"], _st(acc["fence"], f, acc["found"]))
            .when(line == "", acc)
            .when(raw.startswith("    "), _st(acc["fence"], f, t))
            .when(line.startswith("```"), _st(~acc["fence"], f, f))
            .when(acc["fence"], _st(acc["fence"], f, t))
            .when(line.startswith("#"), acc)
            .when(line.rlike(_EQ_DASH_RE), acc)
            .when(
                nxt.isNotNull()
                & F.regexp_replace(nxt, _PYSTRIP_RE, "").rlike(_EQ_DASH_RE),
                _st(acc["fence"], t, f),
            )
            .otherwise(_st(acc["fence"], f, t))
        )

    init = _st(F.lit(False), F.lit(False), F.lit(False))
    return F.aggregate(items, init, _step, lambda a: a["found"])


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
