"""OKP source operators (S7, reference okp.py).

OKP files carry a ``+++ ... +++`` TOML metadata block (reference
okp.py:109-135). The reference yields only files whose
``portal_product_names`` case-insensitively contain one of the requested
project names AND that have both url and title (okp.py:28-64).

Spark-first: the TOML block and its scalars/arrays are regex Column
expressions (functions/text.py); the project filter is a pure
``exists x exists`` predicate — fully pushdown-able, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_content_spark.functions.text import toml_block, toml_scalar, toml_string_array


def parse_okp_metadata(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Extract title / reference_url / portal_product_names columns."""
    block = toml_block(F.col(text_col))
    return (
        df.withColumn("okp_title", F.nullif(toml_scalar(block, "title"), F.lit("")))
        .withColumn(
            "okp_url", F.nullif(toml_scalar(block, "reference_url"), F.lit(""))
        )
        .withColumn(
            "portal_product_names", toml_string_array(block, "portal_product_names")
        )
    )


def related_to_projects(projects: list[str]) -> Column:
    """Reference okp.py:28-52: case-insensitive substring match of any
    project name inside any portal product name, plus url+title present."""
    plist = F.array(*[F.lit(p.lower()) for p in projects])
    match = F.exists(
        F.col("portal_product_names"),
        lambda pn: F.exists(plist, lambda p: F.lower(pn).contains(p)),
    )
    return (
        match & F.col("okp_url").isNotNull() & F.col("okp_title").isNotNull()
    )


def filter_okp_documents(
    df: DataFrame, projects: list[str], text_col: str = "text"
) -> DataFrame:
    """Full S7: parse metadata, keep only project-related documents."""
    return parse_okp_metadata(df, text_col).filter(related_to_projects(projects))
