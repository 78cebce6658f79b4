"""Keyword and hybrid retrieval (reference query_rag.py:190: the OGX
vector_io query modes ``vector`` / ``keyword`` / ``hybrid``; the keyword
and hybrid implementations live server-side in the OGX runtime, so this
is a from-scratch Spark-first design, not a port).

Design (scale-first):
- keyword: inverted-index shape — explode documents into (doc, token)
  postings, aggregate TF per (doc, term), join per-term IDF (computed
  from the same postings), sum TF·IDF. Every step is a hash aggregate
  or broadcast join; no per-document array scans at query time. At
  100 TB the postings table is the materialized artifact (partitioned
  by term bucket) and query terms prune it.
- hybrid: convex fusion of the keyword score (max-normalized per query)
  with vector cosine — the standard score-fusion the OGX runtime offers.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from rag_content_spark.functions.text import tokens


def postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token, tf) postings — the inverted-index building block."""
    return (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def keyword_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """TF·IDF keyword score per document for a bag of query terms.

    idf(t) = ln(N / df_t); documents matching no term are absent (the
    inverted index never touches them — unlike a per-doc scan).
    """
    from pyspark.sql import Window

    post = postings(docs, id_col, text_col).filter(F.col("token").isin(terms))
    n_docs = docs.count()  # corpus stat; at scale: precomputed metadata
    # df_t via a window over the postings themselves — one corpus scan
    # (a separate idf aggregation + join re-reads the corpus)
    df_t = F.count(F.lit(1)).over(Window.partitionBy("token"))
    return (
        post.withColumn("idf", F.log(F.lit(float(n_docs)) / df_t))
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), round_to).alias("kw_score"))
    )


def hybrid_scores(
    docs_with_vectors: DataFrame,
    terms: list[str],
    query_vec: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    embedding_col: str = "embedding",
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Hybrid = alpha * keyword (max-normalized) + (1-alpha) * cosine.

    Keyword side covers only keyword-matching docs; vector side covers
    all docs; the fusion is a left join from the vector side (missing
    keyword score = 0), matching the OGX hybrid shape.
    """
    from rag_content_spark.functions.vector import dot

    kw = keyword_scores(docs_with_vectors, terms, id_col, text_col, round_to=9)
    kw_max = kw.agg(F.max("kw_score")).collect()[0][0] or 1.0
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = docs_with_vectors.select(
        F.col(id_col),
        F.round(dot(F.col(embedding_col), qv, len(query_vec)), 9).alias("cos_score"),
    )
    return (
        vec.join(kw, id_col, "left")
        .select(
            F.col(id_col),
            F.round(
                F.lit(alpha) * F.coalesce(F.col("kw_score"), F.lit(0.0)) / kw_max
                + F.lit(1.0 - alpha) * F.col("cos_score"),
                round_to,
            ).alias("hybrid_score"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Okapi BM25 (Robertson & Walker's classic formula with the
    standard k1/b defaults) over the same inverted-index shape as
    keyword_scores.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); tf normalization uses the
    document length in whitespace tokens against the corpus average.
    Corpus stats (N, avgdl) are exact-integer aggregates, so the score is
    engine-reproducible.
    """
    from pyspark.sql import Window

    lengths = docs.select(
        F.col(id_col), F.size(tokens(text_col)).alias("dl")
    )
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total_dl")
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["total_dl"] / stats["n"]

    post = postings(docs, id_col, text_col).filter(F.col("token").isin(terms))
    df_t = F.count(F.lit(1)).over(Window.partitionBy("token"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = tf * (k1 + 1) / (
        tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    return (
        post.join(lengths, id_col)
        .withColumn("_term_score", idf * norm)
        .groupBy(id_col)
        .agg(F.round(F.sum("_term_score"), round_to).alias("bm25"))
    )
