"""Vector similarity / top-k retrieval (SURVEY §2.6) + ANN extensions.

Reference query surface: exact FAISS IndexFlatIP top-k over every vector
(scripts/query_rag.py:66-67), IndexFlatL2 for the llama-stack store
(document_processor.py:304), score-threshold gating (query_rag.py:81-94),
node lookup by id (query_rag.py:37-64).

Spark-first design:
- single query  : broadcast the query vector as a literal, score with a
  codegen'd expression, TakeOrderedAndProject for the limit. One scan, no
  shuffle — this is the plan you want at 100 TB.
- batch queries : crossJoin(broadcast(queries)) + per-query window top-k.
- IVF           : assign vectors to nearest centroid once (a narrow map),
  partition-prune the scan to the probed centroid's cluster at query time.
- LSH           : sign-random-projection bucket key; candidates = bucket
  join (shuffle on the 64-bit key, not O(n^2)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.functions.vector import cosine, dot, euclidean


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def top_k(
    index: DataFrame,
    query_vec: list[float],
    k: int = 1,
    metric: str = "ip",
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k retrieval for one query (Q2).

    metric='ip' (inner product == cosine on normalized vectors — the FAISS
    IndexFlatIP path) or 'l2' (IndexFlatL2: smaller distance is better).
    Deterministic total order: (score desc|asc, id) so ties are stable.
    """
    q = _vec_lit(query_vec)
    if metric == "ip":
        score = dot(F.col(embedding_col), q)
        order = [F.desc("score"), F.asc(id_col)]
    elif metric == "cosine":
        score = cosine(F.col(embedding_col), q)
        order = [F.desc("score"), F.asc(id_col)]
    elif metric == "l2":
        score = euclidean(F.col(embedding_col), q)
        order = [F.asc("score"), F.asc(id_col)]
    else:
        raise ValueError(f"unknown metric {metric}")
    if round_to is not None:
        score = F.round(score, round_to)
    return index.withColumn("score", score).orderBy(*order).limit(k)


def top_k_batch(
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    metric: str = "ip",
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_to: int | None = 6,
) -> DataFrame:
    """Top-k for a batch of queries: broadcast the (small) query set
    against the (huge) index, rank per query with a window.

    The shuffle is on query_id only (k rows per query survive the window);
    the index is scanned exactly once regardless of query count.
    """
    score = dot(F.col(embedding_col), F.col(query_vec_col))
    if metric == "l2":
        score = euclidean(F.col(embedding_col), F.col(query_vec_col))
        order = [F.asc("score"), F.asc(id_col)]
    else:
        order = [F.desc("score"), F.asc(id_col)]
    if round_to is not None:
        score = F.round(score, round_to)
    w = Window.partitionBy(query_id_col).orderBy(*order)
    return (
        index.crossJoin(F.broadcast(queries))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop(query_vec_col)
    )


def node_lookup(index: DataFrame, node_id, id_col: str = "chunk_id") -> DataFrame:
    """Q3: point lookup by id (reference query_rag.py:37-64). With the
    canonical Parquet index sorted/bucketed by id this becomes a
    partition-pruned scan."""
    return index.filter(F.col(id_col) == F.lit(node_id))


# ---- ANN extensions (north-star scale path) --------------------------------


def assign_ivf_cells(
    index: DataFrame,
    centroids: DataFrame,
    embedding_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
) -> DataFrame:
    """IVF build step: tag each vector with its nearest centroid.

    centroids is small (k-means output or sampled seeds) → broadcast
    crossJoin + per-vector argmin window. At scale, write the result
    partitioned by cell so query-time probes prune to ~1/nlist of data.
    """
    d = euclidean(F.col(embedding_col), F.col(centroid_vec_col))
    w = Window.partitionBy("vec_id").orderBy(F.asc("_cdist"), F.asc(centroid_id_col))
    return (
        index.crossJoin(F.broadcast(centroids))
        .withColumn("_cdist", F.round(d, 6))
        .withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") == 1)
        .drop("_cdist", "_crank", centroid_vec_col)
    )


def srp_plane(seed: str, j: int, dim: int) -> list[float]:
    """Hyperplane j: component i is a deterministic pseudo-random value in
    [-1, 1) derived from md5(f"{seed}{j}:{i}") — the same value
    ``stable_hash64`` produces, computed driver-side so the plan carries
    plain float literals instead of 512 md5 expression nodes (which blew
    past codegen limits: 9.4 s -> sub-second at sf0.1)."""
    import hashlib

    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"{seed}{j}:{i}".encode()).hexdigest()[:15], 16)
        out.append((h % 2000001) / 1000000.0 - 1.0)
    return out


def lsh_signature(
    embedding_col: Column | str = "embedding",
    bits: int = 16,
    dim: int = 64,
    seed: str = "srp",
) -> Column:
    """Sign-random-projection LSH bucket key (for cosine).

    Deterministic hyperplanes (see :func:`srp_plane`) — reproducible in
    any engine, no stored model. Returns a ``bits``-bit integer bucket id.
    """
    c = F.col(embedding_col) if isinstance(embedding_col, str) else embedding_col
    sig = F.lit(0).cast("bigint")
    for j in range(bits):
        plane = F.array(*[F.lit(v) for v in srp_plane(seed, j, dim)])
        proj = F.aggregate(
            F.zip_with(c, plane, lambda x, r: x.cast("double") * r),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << j).cast("bigint")).otherwise(0)
    return sig
