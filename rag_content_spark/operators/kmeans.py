"""Distributed Lloyd's k-means over an embedding column (north-star:
trains real IVF centroids; also the engine's iterative-algorithm shape).

Each iteration is one Spark job: assign (broadcast crossJoin + map-side
min_by, shuffle = n rows) then re-center (per-dimension avg after
posexplode, shuffle = n x dim rows keyed by (cluster, dim) — fine because
dim is small and fixed). Centroids live on the driver between iterations
(k x dim floats — tiny by definition), which is the standard Spark
k-means shape: the ITERATION state is small, only the data is big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rag_content_spark.operators.similarity import assign_ivf_cells


def recenter(
    assigned: DataFrame,
    embedding_col: str = "embedding",
    cluster_col: str = "centroid_id",
) -> list[tuple[int, list[float]]]:
    """New centroid per cluster: element-wise mean of member vectors."""
    dims = (
        assigned.select(
            F.col(cluster_col),
            F.posexplode(F.col(embedding_col)).alias("dim", "val"),
        )
        .groupBy(cluster_col, "dim")
        .agg(F.avg("val").alias("mean"))
    )
    rows = dims.collect()
    by_cluster: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cluster.setdefault(r[cluster_col], {})[r["dim"]] = r["mean"]
    return [
        (cid, [vals[d] for d in sorted(vals)])
        for cid, vals in sorted(by_cluster.items())
    ]


def kmeans(
    index: DataFrame,
    initial_centroids: list[tuple[int, list[float]]],
    iterations: int = 5,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Run ``iterations`` Lloyd steps; returns (centroids, assignment DF).

    Deterministic given deterministic seeds (ties in assignment resolve
    to the lower centroid id). Empty clusters keep their previous center.
    """
    centroids = [(int(c), [float(x) for x in v]) for c, v in initial_centroids]
    assigned = None
    for _ in range(iterations):
        assigned = assign_ivf_cells(
            index, centroids, embedding_col=embedding_col, id_col=id_col
        )
        new = dict(
            (cid, vec) for cid, vec in recenter(assigned, embedding_col)
        )
        centroids = [(cid, new.get(cid, vec)) for cid, vec in centroids]
    assigned = assign_ivf_cells(
        index, centroids, embedding_col=embedding_col, id_col=id_col
    )
    return centroids, assigned


def inertia(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    embedding_col: str = "embedding",
) -> float:
    """Sum of squared distances to assigned centers (monotonically
    non-increasing across Lloyd iterations — the convergence check)."""
    from rag_content_spark.functions.vector import euclidean

    cent = assigned.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        ["centroid_id", "_cv"],
    )
    d = euclidean(F.col(embedding_col), F.col("_cv"))
    return (
        assigned.join(F.broadcast(cent), "centroid_id")
        .agg(F.sum(d * d).alias("inertia"))
        .collect()[0]["inertia"]
    )
