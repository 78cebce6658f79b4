"""The build pipeline: documents → metadata → chunks → filter → embed →
index (the reference's DocumentProcessor.process + save,
document_processor.py:828-901, re-expressed as one lazy Spark plan).

Stage order is deliberate (SURVEY §4): cheap declarative filters run
BEFORE the embedding UDF — Catalyst will not reorder across an opaque
Python UDF, so placement is on us. Everything before the embedder is pure
Column expressions; the single UDF boundary is the embedder itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from rag_content_spark.operators.chunking import (
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
    chunk_fixed,
    split_markdown,
)
from rag_content_spark.operators.filters import (
    apply_unreachable_policy,
    has_whitespace,
    valid_chunk,
)
from rag_content_spark.operators.metadata import populate_metadata


@dataclass(frozen=True)
class BuildConfig:
    """Immutable job config — replaces the reference's process-global
    llama-index Settings mutation (document_processor.py:107-129)."""

    chunk_size: int = DEFAULT_CHUNK_SIZE
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP
    embedding_model: str = "sentence-transformers/all-mpnet-base-v2"
    embedding_dimension: int = 768
    unreachable_action: str = "warn"
    ignore_list: list[str] = field(default_factory=list)
    hermetic: bool = True
    markdown_aware: bool = True
    # "fixed" = declarative token-window chunker (oracle-pinned default);
    # "llama" = the real-parity llama-index SentenceSplitter port
    # (operators/llama_chunking.py, golden-tested) for users who need
    # node-for-node agreement with the reference's chunk boundaries
    chunker: str = "fixed"


def build_chunks(
    documents: DataFrame, cfg: BuildConfig, embedder=None
) -> DataFrame:
    """documents(file_path, doc_type, doc_id, text, ...) → embedded chunks
    with the SURVEY §1.4 ``chunks`` schema."""
    docs = populate_metadata(documents, hermetic=cfg.hermetic)
    docs = apply_unreachable_policy(
        docs, cfg.unreachable_action, cfg.ignore_list
    )

    if cfg.markdown_aware:
        # C2 then C1: split on headings, then token-window each section
        # (the reference applies MarkdownNodeParser + SentenceSplitter for
        # markdown-like types, document_processor.py:115-129).
        md = split_markdown(docs).withColumnRenamed("section_text", "unit_text")
        units = md.withColumn("unit_index", F.col("section_index")).drop(
            "section_index"
        )
    else:
        units = docs.withColumn("unit_text", F.col("text")).withColumn(
            "unit_index", F.lit(0)
        )

    # P2+P3 validity runs on the UNIT text (line structure intact); the
    # token chunker collapses whitespace, so a post-chunk markdown filter
    # would see every section as one '# ...' line and drop it.
    units = units.filter(valid_chunk("unit_text", "doc_type"))

    unit_docs = units.withColumn("_orig_text", F.col("text")).withColumn(
        "text", F.col("unit_text")
    )
    if cfg.chunker == "llama":
        from rag_content_spark.operators.llama_chunking import chunk_llama

        chunked = chunk_llama(
            unit_docs,
            text_col="text",
            chunk_size=cfg.chunk_size,
            chunk_overlap=cfg.chunk_overlap,
        )
    else:
        chunked = chunk_fixed(
            unit_docs,
            text_col="text",
            size=cfg.chunk_size,
            overlap=cfg.chunk_overlap,
        )

    chunks = (
        chunked.filter(has_whitespace("chunk_text"))
        .select(
            F.concat_ws(
                "#",
                F.col("doc_id"),
                F.col("unit_index").cast("string"),
                F.col("chunk_index").cast("string"),
            ).alias("chunk_id"),
            F.col("doc_id").alias("document_id"),
            # source = docs_url else title (reference document_processor.py:448)
            F.coalesce(F.col("docs_url"), F.col("title")).alias("source"),
            F.col("title"),
            F.col("docs_url"),
            F.col("url_reachable"),
            F.col("chunk_text").alias("text"),
        )
    )

    if embedder is not None:
        chunks = chunks.withColumn("embedding", embedder(F.col("text")))
        chunks = chunks.withColumn(
            "embedding_model", F.lit(cfg.embedding_model)
        ).withColumn("embedding_dimension", F.lit(cfg.embedding_dimension))
    return chunks
