"""Shared column-expression library.

Everything here is a pure ``pyspark.sql.functions`` Column expression —
JVM-side, whole-stage-codegen friendly, no Python UDFs — and every
primitive has a documented exact DuckDB-SQL equivalent so operators built
on them can be oracle-checked value-for-value.
"""

from rag_content_spark.functions.hashing import stable_hash64, stable_hash64_sql
from rag_content_spark.functions.vector import (
    cosine,
    dot,
    euclidean,
    l2_norm,
    l2_normalize,
)
from rag_content_spark.functions.text import (
    basename,
    first_line_title,
    frontmatter_field,
    tokens,
    toml_block,
)

__all__ = [
    "stable_hash64",
    "stable_hash64_sql",
    "dot",
    "cosine",
    "euclidean",
    "l2_norm",
    "l2_normalize",
    "tokens",
    "first_line_title",
    "frontmatter_field",
    "basename",
    "toml_block",
]
