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


# Spark evaluates higher-order-function lambdas (aggregate/zip_with)
# INTERPRETED — they never enter whole-stage codegen. For SMALL known
# dimensions (<= _UNROLL_MAX) unrolling to plain arithmetic wins
# (measured ~2x on 8-d mock embeddings). For large dims the unrolled
# expression blows past codegen method limits and the WHOLE stage falls
# back to interpreted — worse than an interpreted fold island inside a
# codegen'd stage (measured: 64-d near-dup join 7.2 s unrolled vs 3.9 s
# fold). The helpers pick automatically from ``dim``; the unrolled sum
# keeps the fold's left-to-right IEEE association (leading 0.0 included)
# so both forms and the DuckDB oracle agree bit-for-bit.

_UNROLL_MAX = 16


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Inner product of two ARRAY<FLOAT/DOUBLE> columns, in double.

    ``dim`` (when known) lets the helper choose the faster physical form;
    the result is identical either way.
    """
    av, bv = _c(a), _c(b)
    if dim is not None and dim <= _UNROLL_MAX:
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + F.get(av, i).cast("double") * F.get(bv, i).cast("double")
        return acc
    return F.aggregate(
        F.zip_with(av, bv, lambda x, y: (x.cast("double") * y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    """Euclidean norm of a vector column."""
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Cosine similarity (reference scripts/distance.py:23)."""
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def euclidean(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Euclidean (L2) distance (reference scripts/distance.py:24)."""
    av, bv = _c(a), _c(b)
    if dim is not None and dim <= _UNROLL_MAX:
        acc = F.lit(0.0)
        for i in range(dim):
            diff = F.get(av, i).cast("double") - F.get(bv, i).cast("double")
            acc = acc + diff * diff
        return F.sqrt(acc)
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                av,
                bv,
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
    dim: int | None = None,
) -> Column:
    """The reference's combined response-validation score
    (scripts/distance.py:22-33): length penalty + mean of cosine DISTANCE
    (1 - similarity) and euclidean distance."""
    cos_dist = F.lit(1.0) - cosine(vec_a, vec_b, dim)
    return length_penalty(len_a, len_b) + (cos_dist + euclidean(vec_a, vec_b, dim)) / 2.0


def quantize_int8(a: Column | str, dim: int | None = None) -> Column:
    """Scalar int8 quantization of a vector column: STRUCT(scale DOUBLE,
    q ARRAY<TINYINT>) with q_i = round(x_i / scale) and scale =
    max_abs / 127. A 4x storage/scan reduction for the 100 TB index; the
    canonical Parquet index can store q and keep full-precision vectors
    in a cold partition.

    DuckDB mirror: greatest over list_transform(abs) for max_abs, then
    the same round/cast.
    """
    av = _c(a)
    max_abs = F.array_max(F.transform(av, lambda x: F.abs(x.cast("double"))))
    scale = max_abs / 127.0
    q = F.transform(
        av,
        lambda x: F.round(x.cast("double") / scale, 0).cast("tinyint"),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qcol: Column | str) -> Column:
    """Approximate reconstruction: x_i ~= q_i * scale (ARRAY<DOUBLE>)."""
    qc = _c(qcol)
    return F.transform(
        qc["q"], lambda v: v.cast("double") * qc["scale"]
    )
