"""Text scalar functions (reference SURVEY §2.8).

All pure Column expressions with exact DuckDB equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty tokens dropped.

    DuckDB: list_filter(regexp_split_to_array(x, '\\s+'), t -> t <> '')
    """
    return F.filter(F.split(_c(col), r"\s+"), lambda t: t != "")


TOKENS_SQL = "list_filter(regexp_split_to_array({x}, '\\s+'), t -> t <> '')"


def first_line_title(col: Column | str) -> Column:
    """Title = first line with leading '#'/' ' characters stripped — the
    reference does ``first_line.lstrip("# ")``, i.e. strips any leading
    run of '#' and ' ' in any order (metadata_processor.py:43-56).

    DuckDB: regexp_replace(split_part(x, chr(10), 1), '^[# ]*', '')
    """
    return F.regexp_replace(
        F.split_part(_c(col), F.lit("\n"), F.lit(1)), r"^[# ]*", ""
    )


def frontmatter_field(col: Column | str, field: str) -> Column:
    """Extract a YAML-frontmatter scalar from a leading ``---`` block
    (reference metadata_processor.py:44-69; README.md:215-241).

    Handles the common forms ``field: value`` / ``field: "value"``.
    Returns '' when absent (use nullif at call sites if NULL is wanted).

    DuckDB: regexp_extract(x, '(?s)^---\\n(.*?)\\n---', 1) then
            regexp_extract(block, '(?m)^{field}:\\s*"?([^"\\n]*)"?', 1)
    """
    block = F.regexp_extract(_c(col), r"(?s)^---\n(.*?)\n---", 1)
    return F.regexp_extract(block, r"(?m)^" + field + r':\s*"?([^"\n]*?)"?\s*$', 1)


def basename(col: Column | str) -> Column:
    """Path basename — the reference's fallback docs_url
    (reference metadata_processor.py:133-135).

    DuckDB: regexp_extract(x, '([^/]*)$', 1)
    """
    return F.regexp_extract(_c(col), r"([^/]*)$", 1)


def toml_block(col: Column | str) -> Column:
    """Extract the OKP ``+++ ... +++`` TOML metadata block
    (reference okp.py:126-135: re.match('\\+{3,}\\n(.*?)\\n\\+{3,}', DOTALL)).

    DuckDB: regexp_extract(x, '(?s)^\\+\\+\\+\\n(.*?)\\n\\+\\+\\+', 1)
    """
    return F.regexp_extract(_c(col), r"(?s)^\+\+\+\n(.*?)\n\+\+\+", 1)


def toml_scalar(block: Column | str, key: str) -> Column:
    """Pull ``key = "value"`` out of a TOML block (reference okp.py:28-52)."""
    return F.regexp_extract(_c(block), r'(?m)^' + key + r'\s*=\s*"([^"]*)"', 1)


def toml_string_array(block: Column | str, key: str) -> Column:
    """Pull ``key = ["a", "b"]`` out of a TOML block as ARRAY<STRING>
    (reference okp.py:48-52 portal_product_names).

    DuckDB: list_filter(list_transform(regexp_split_to_array(
              regexp_extract(block, ...), ','), s -> trim(s, ' "')), s -> s <> '')
    """
    raw = F.regexp_extract(_c(block), r"(?m)^" + key + r"\s*=\s*\[([^\]]*)\]", 1)
    return F.filter(
        F.transform(F.split(raw, ","), lambda s: F.trim(s, F.lit(' "'))),
        lambda s: s != "",
    )


# Common HTML entities → ASCII (F2; the reference's AsciiDoc text
# converter normalizes entities the same way, asciidoc_text_converter.rb:
# 132-156 — mapping reimplemented from standard entity semantics).
HTML_ENTITIES: dict[str, str] = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&apos;": "'",
    "&nbsp;": " ",
    "&#8201;": " ",
    "&#8212;": "--",
    "&#8216;": "'",
    "&#8217;": "'",
    "&#8220;": '"',
    "&#8221;": '"',
    "&#8230;": "...",
    "&#8594;": "->",
    "&#8592;": "<-",
    "&#8658;": "=>",
    "&#8656;": "<=",
    "&#43;": "+",
    "&#174;": "(R)",
    "&#169;": "(C)",
    "&#8482;": "(TM)",
}


def html_entity_decode(col: Column | str) -> Column:
    """Replace the common HTML entities with ASCII equivalents (F2).

    Chained literal replaces — stays in codegen; &amp; is decoded LAST so
    double-encoded text doesn't over-decode.
    """
    c = _c(col)
    for ent, rep in HTML_ENTITIES.items():
        if ent == "&amp;":
            continue
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


# accent-fold table shared VERBATIM by the Spark and DuckDB translate()
# calls — folding is defined by this table, not by an ICU call, so both
# engines normalize identically (an ICU strip_accents would cover more
# codepoints but could never be hash-matched cross-engine).
ACCENT_FROM = "áàâäãåéèêëíìîïóòôöõúùûüýÿçñÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÝÇÑ"
ACCENT_TO = "aaaaaaeeeeiiiiooooouuuuyycnAAAAAAEEEEIIIIOOOOOUUUUYCN"


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization for matching/dedup keys: lowercase,
    accent fold (shared table), whitespace collapse, trim. Narrow
    expressions only."""
    from pyspark.sql import functions as F

    folded = F.translate(F.lower(_c(col)), ACCENT_FROM.lower(), ACCENT_TO.lower())
    return F.trim(F.regexp_replace(folded, r"\s+", " "))


def normalize_text_sql(expr: str) -> str:
    """DuckDB rendering of :func:`normalize_text` over ``expr``."""
    return (
        f"trim(regexp_replace(translate(lower({expr}), "
        f"'{ACCENT_FROM.lower()}', '{ACCENT_TO.lower()}'), '\\s+', ' ', 'g'))"
    )


def markdown_to_text(col: Column | str) -> Column:
    """Markdown -> plain text for LM training corpora: images to alt
    text, links to anchor text, inline code and bold/italic unwrapped,
    ATX heading markers stripped. Regex subset chosen to render
    identically under Java regex and RE2 (no lookarounds, non-greedy
    quantifiers only), so the DuckDB twin is exact.
    """
    from pyspark.sql import functions as F

    c = _c(col)
    # images BEFORE links (an image is a '!' + link)
    c = F.regexp_replace(c, r"!\[([^\]]*)\]\([^)]*\)", r"$1")
    c = F.regexp_replace(c, r"\[([^\]]*)\]\([^)]*\)", r"$1")
    c = F.regexp_replace(c, r"`([^`]*)`", r"$1")
    c = F.regexp_replace(c, r"\*\*([^*]+)\*\*", r"$1")
    c = F.regexp_replace(c, r"\*([^*]+)\*", r"$1")
    c = F.regexp_replace(c, r"(?m)^#{1,6}[ \t]+", "")
    return c


def markdown_to_text_sql(expr: str) -> str:
    """DuckDB rendering of :func:`markdown_to_text` (same passes, same
    order; DuckDB backreferences use \\1 and the 'm' flag argument)."""
    e = expr
    e = f"regexp_replace({e}, '!\\[([^\\]]*)\\]\\([^)]*\\)', '\\1', 'g')"
    e = f"regexp_replace({e}, '\\[([^\\]]*)\\]\\([^)]*\\)', '\\1', 'g')"
    e = f"regexp_replace({e}, '`([^`]*)`', '\\1', 'g')"
    e = f"regexp_replace({e}, '\\*\\*([^*]+)\\*\\*', '\\1', 'g')"
    e = f"regexp_replace({e}, '\\*([^*]+)\\*', '\\1', 'g')"
    e = f"regexp_replace({e}, '(?m)^#{{1,6}}[ \\t]+', '', 'g')"
    return e
