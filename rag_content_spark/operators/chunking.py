"""Chunking operators — the reference's one "explode" (SURVEY §2.3).

The reference delegates to llama-index's ``SentenceSplitter`` (token-based,
chunk_size=380 / overlap=0 defaults, reference document_processor.py:113-121,
utils.py:94-95) and ``MarkdownNodeParser`` (heading-structure split,
reference document_processor.py:115-117,128-129). Those implementations are
model-tokenizer-coupled and single-process; here chunking is a deterministic,
fully declarative Spark plan:

- tokenizer   = whitespace tokens (deterministic; swap in a Pandas-UDF BPE
  tokenizer for model-exact packing without changing the plan shape)
- chunk i     = tokens[i*stride : i*stride + size], stride = size - overlap
- chunk_id    = "<doc_id>#<i>" (the reference derives chunk ids from node
  ids the same parent-child way, document_processor.py:445-457)

Scale: ``explode`` over a per-row generated index array is a narrow
transformation — no shuffle; each input partition chunks independently.
100 TB of documents chunk in one map stage.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from rag_content_spark.functions.text import tokens

DEFAULT_CHUNK_SIZE = 380  # reference utils.py:94
DEFAULT_CHUNK_OVERLAP = 0  # reference utils.py:95


def chunk_count(tok: Column, size: int, overlap: int) -> Column:
    """ceil(max(n - overlap, 1) / stride) — at least one chunk per doc."""
    stride = size - overlap
    n = F.size(tok)
    return F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride)).cast(
        "int"
    )


def chunk_fixed(
    df: DataFrame,
    text_col: str = "text",
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """Token-window chunker (C1). Adds ``chunk_index``, ``chunk_text``,
    ``chunk_tokens``; keeps all other columns.

    Equivalent DuckDB shape (for oracles): generate per-row ``i`` via a
    range cross-join bounded by the same chunk count, then
    ``array_to_string(tk[i*stride+1 : i*stride+size], ' ')``.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    tok = tokens(F.col(text_col))
    out = (
        df.withColumn("_tok", tok)
        .withColumn("_n_chunks", chunk_count(F.col("_tok"), size, overlap))
        .select(
            "*",
            F.posexplode(F.sequence(F.lit(0), F.col("_n_chunks") - 1)).alias(
                "chunk_index", "_i"
            ),
        )
        .withColumn(
            "_slice", F.slice(F.col("_tok"), F.col("chunk_index") * stride + 1, size)
        )
        .withColumn("chunk_text", F.array_join(F.col("_slice"), " "))
        .withColumn("chunk_tokens", F.size(F.col("_slice")))
        .drop("_tok", "_n_chunks", "_i", "_slice")
    )
    return out


# Sentinel used to mark heading starts before splitting; chr(1) cannot occur
# in real text and both engines can produce it (chr(1)).
_SENTINEL = ""


def split_markdown(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Markdown heading splitter (C2, reference MarkdownNodeParser usage at
    document_processor.py:128-129): one chunk per heading-delimited section;
    a leading section without a heading is kept.

    Adds ``section_index``, ``section_text`` (trimmed), drops empty sections.
    Implementation: tag ``^#{1,6} `` heading lines with a sentinel, split on
    it — pure narrow ops, no shuffle, no lookahead regex (DuckDB RE2-safe).
    """
    tagged = F.regexp_replace(F.col(text_col), r"(?m)^(#{1,6} )", _SENTINEL + "$1")
    # trim(col) strips only spaces in both Spark and DuckDB; pass the full
    # whitespace set explicitly so sections don't keep trailing newlines.
    sections = F.filter(
        F.transform(F.split(tagged, _SENTINEL), lambda s: F.trim(s, F.lit(" \t\r\n"))),
        lambda s: s != "",
    )
    return (
        df.withColumn("_sections", sections)
        .select(
            "*",
            F.posexplode(F.col("_sections")).alias("section_index", "section_text"),
        )
        .drop("_sections")
    )


def section_title(section_col: Column | str = "section_text") -> Column:
    """Heading text of a markdown section ('' for preamble sections)."""
    c = F.col(section_col) if isinstance(section_col, str) else section_col
    return F.regexp_replace(
        F.regexp_extract(c, r"^(#{1,6} [^\n]*)", 1), r"^#{1,6} ", ""
    )


def chunk_with_tokenizer(
    df: DataFrame,
    tokenizer,
    text_col: str = "text",
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """Chunker with a pluggable Python tokenizer (Arrow-batched pandas
    UDF) — the swap point for model-exact token packing (the reference
    packs by the embedding model's tokenizer, max 384 tokens,
    sentence_bert_config.json). ``tokenizer(text) -> list[str]`` runs
    once per document inside the UDF; chunk assembly stays declarative
    (same explode plan as chunk_fixed, still no shuffle).

    With ``tokenizer=str.split`` this produces exactly chunk_fixed's
    output (tested) — plug a BPE/sentencepiece callable for model parity
    without changing the plan shape.
    """
    from pyspark.sql.functions import pandas_udf

    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap

    @pandas_udf("array<string>")
    def _tokenize(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: list(tokenizer(t or "")))

    out = (
        df.withColumn("_tok", _tokenize(F.col(text_col)))
        .withColumn("_n_chunks", chunk_count(F.col("_tok"), size, overlap))
        .select(
            "*",
            F.posexplode(F.sequence(F.lit(0), F.col("_n_chunks") - 1)).alias(
                "chunk_index", "_i"
            ),
        )
        .withColumn(
            "_slice", F.slice(F.col("_tok"), F.col("chunk_index") * stride + 1, size)
        )
        .withColumn("chunk_text", F.array_join(F.col("_slice"), " "))
        .withColumn("chunk_tokens", F.size(F.col("_slice")))
        .drop("_tok", "_n_chunks", "_i", "_slice")
    )
    return out
