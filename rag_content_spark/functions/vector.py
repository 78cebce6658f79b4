"""Vector math as pure Column expressions (no UDFs).

Re-expresses the reference's query-time scoring — FAISS ``IndexFlatIP``
(inner product over L2-normalized vectors = cosine,
reference document_processor.py:238-240 + embeddings_model/modules.json
module 2) and ``IndexFlatL2`` (reference document_processor.py:304) and
the pairwise distance script (reference scripts/distance.py:17-38) — as
``aggregate``/``zip_with``/``transform`` expressions that stay inside
whole-stage codegen. On a cluster this is a scan + map, no shuffle; the
top-k on top of it is Spark's TakeOrderedAndProject.

Math is done in DOUBLE regardless of the array element type so results
are reproducible across engines (accumulate left-to-right).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product of two ARRAY<FLOAT/DOUBLE> columns, in double."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: (x.cast("double") * y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of a vector column."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (reference scripts/distance.py:23)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def euclidean(a: Column | str, b: Column | str) -> Column:
    """Euclidean (L2) distance (reference scripts/distance.py:24)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                _c(a),
                _c(b),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """L2-normalize a vector column (the model's ``2_Normalize`` module,
    reference embeddings_model/modules.json)."""
    av = _c(a)
    n = l2_norm(av)
    return F.transform(av, lambda x: x.cast("double") / n)


# ---- DuckDB-SQL renderings (for oracle construction) ----------------------


def dot_sql(a: str, b: str) -> str:
    """DuckDB rendering of :func:`dot` — identical left-to-right double sum."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def euclidean_sql(a: str, b: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))))"
    )


def cosine_sql(a: str, b: str) -> str:
    return (
        f"({dot_sql(a, b)} / "
        f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"
    )


def length_penalty(len_a: Column | str, len_b: Column | str) -> Column:
    """Naive length-difference penalty (reference scripts/distance.py:29-30):
    |len_a - len_b| / (len_a + len_b) * 0.1."""
    a = (F.col(len_a) if isinstance(len_a, str) else len_a).cast("double")
    b = (F.col(len_b) if isinstance(len_b, str) else len_b).cast("double")
    return F.abs(a - b) / (a + b) * 0.1


def response_distance_score(
    vec_a: Column | str,
    vec_b: Column | str,
    len_a: Column | str,
    len_b: Column | str,
) -> Column:
    """The reference's combined response-validation score
    (scripts/distance.py:22-33): length penalty + mean of cosine DISTANCE
    (1 - similarity) and euclidean distance."""
    cos_dist = F.lit(1.0) - cosine(vec_a, vec_b)
    return length_penalty(len_a, len_b) + (cos_dist + euclidean(vec_a, vec_b)) / 2.0
