"""Persisted ANN index: the parquet-native FAISS-IVFPQ equivalent.

The reference persists FAISS binaries that only FAISS can read; the
100 TB-native alternative is an index that IS a data lake table:

- ``build_ann_index``   — train IVF centroids (Lloyd's) + a PQ codebook
  (per-subspace Lloyd's) on the corpus, assign every vector to its
  cell, PQ-encode it, and write the index parquet PARTITIONED BY cell.
  Sidecars: ``centroids.parquet``, ``codebook.json``, ``meta.json``.
- ``query_ann_index``   — pick the ``n_probe`` nearest cells
  driver-side (tiny centroid table), read ONLY those partitions
  (partition pruning on the cell directory), ADC-score the codes, and
  optionally exact-refine the shortlist against the full vectors kept
  in the same rows (column pruning keeps them out of the ADC scan).

Why this shape at 100 TB: the index is splittable, schema-evolvable,
queryable by any engine, and cells map to directories — a probe reads
``n_probe / nlist`` of the bytes. Training uses the vectorized numpy
twins (one matmul per Arrow batch); every decode/score step at query
time is a Column expression over literals.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_ann_index(
    emb: DataFrame,
    out_dir: str,
    nlist: int = 16,
    m: int = 4,
    k: int = 16,
    kmeans_iterations: int = 3,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> dict:
    """Train + encode + write. Returns the meta dict.

    Seeding is deterministic (the nlist lowest (xxhash64(id), id) keys),
    so the same corpus always builds the same index.
    """
    from rag_content_spark.functions.vector import train_pq_codebook
    from rag_content_spark.operators.kmeans import kmeans
    from rag_content_spark.operators.similarity import assign_ivf_cells_np
    from rag_content_spark.functions.vector import pq_encode_np

    emb = emb.select(id_col, embedding_col)
    n = emb.count()
    # Deterministic hash sampling for the nlist seeds: order by a stable
    # per-id hash and take the first nlist. orderBy().limit() compiles to
    # TakeOrderedAndProject — per-partition top-nlist merged on the
    # driver, so NO corpus-sized single-partition window/sort (the old
    # row_number() over an unpartitioned Window pushed every vector
    # through one task). The hash spreads seeds pseudo-uniformly over
    # the id space, and the (hash, id) key makes the pick total-ordered
    # hence reproducible on any partitioning.
    seeds = [
        (i, list(r[embedding_col]))
        for i, r in enumerate(
            emb.orderBy(
                F.xxhash64(F.col(id_col).cast("string"), F.lit("ann-seed")),
                id_col,
            )
            .limit(nlist)
            .collect()
        )
    ]
    centroids, _ = kmeans(
        emb, seeds, iterations=kmeans_iterations,
        embedding_col=embedding_col, id_col=id_col,
    )
    codebook = train_pq_codebook(
        emb, m=m, k=k, embedding_col=embedding_col, id_col=id_col
    )
    dim = len(centroids[0][1])

    assigned = assign_ivf_cells_np(
        emb, centroids, embedding_col=embedding_col, id_col=id_col
    )
    encoded = pq_encode_np(assigned, codebook, embedding_col=embedding_col)
    (
        encoded.select(
            id_col, embedding_col, F.col("centroid_id").alias("cell"), "codes"
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(out_dir, "index"))
    )
    spark = emb.sparkSession
    spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        "centroid_id int, centroid_vec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "centroids.parquet")
    )
    meta = {
        "format": "rag-spark-ann/1",
        "metric": "l2",
        "dim": dim,
        "nlist": nlist,
        "m": m,
        "k": k,
        "n_vectors": n,
    }
    with open(os.path.join(out_dir, "codebook.json"), "w") as f:
        json.dump(codebook, f)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_ann_meta(out_dir: str) -> tuple[dict, list, list]:
    """(meta, centroids [(id, vec)...], codebook)."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(out_dir, "codebook.json")) as f:
        codebook = json.load(f)
    return meta, codebook


def query_ann_index(
    spark: SparkSession,
    out_dir: str,
    query_vec: list[float],
    topk: int = 10,
    n_probe: int = 2,
    refine: bool = True,
) -> DataFrame:
    """Probe -> pruned scan -> ADC -> (optional) exact refine.

    The returned plan's scan carries a ``cell IN (...)`` partition
    filter; with ``refine`` the full vectors are read ONLY for the
    ``4 * topk`` ADC shortlist (broadcast self-join on vec_id).
    """
    from rag_content_spark.functions.vector import (
        euclidean,
        pq_adc_score,
        pq_adc_table,
    )

    meta, codebook = load_ann_meta(out_dir)
    cents = spark.read.parquet(
        os.path.join(out_dir, "centroids.parquet")
    ).collect()
    import math

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probes = sorted(
        ((round(math.sqrt(d2(query_vec, r["centroid_vec"])), 6), r["centroid_id"]) for r in cents)
    )[:n_probe]
    cells = [int(c) for _, c in probes]

    index = spark.read.parquet(os.path.join(out_dir, "index")).filter(
        F.col("cell").isin(cells)
    )
    table = pq_adc_table([float(x) for x in query_vec], codebook)
    adc = F.round(pq_adc_score("codes", table), 6)
    shortlist = (
        index.select("vec_id", adc.alias("adc"))
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(4 * topk if refine else topk)
    )
    if not refine:
        return shortlist
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    exact = (
        index.select("vec_id", "embedding")
        .join(F.broadcast(shortlist), "vec_id")
        .select(
            "vec_id",
            "adc",
            F.round(euclidean(F.col("embedding"), qlit), 6).alias("exact"),
        )
        .orderBy(F.asc("exact"), F.asc("vec_id"))
        .limit(topk)
    )
    return exact


def add_to_ann_index(
    new_emb: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> dict:
    """Incremental add — the FAISS ``index.add()`` shape: the trained
    model (centroids + PQ codebook) is FROZEN; new vectors are assigned
    to their existing cells, PQ-encoded with the existing codebook, and
    APPENDED to the partitioned index (new parquet files inside the
    matching ``cell=`` directories — readers and the partition-pruned
    query path pick them up with no rebuild and no rewrite of existing
    postings). Returns the updated meta.

    Quantization drift is the documented trade (same as FAISS): adds
    do not move centroids, so after heavy growth rebuild with
    :func:`build_ann_index`. Id uniqueness across adds is the caller's
    contract (use ``incremental_dedup``/``index_upsert`` upstream when
    re-adds are possible).
    """
    from rag_content_spark.functions.vector import pq_encode_np
    from rag_content_spark.operators.similarity import assign_ivf_cells_np

    meta, codebook = load_ann_meta(out_dir)
    spark = new_emb.sparkSession
    centroids = [
        (r["centroid_id"], list(r["centroid_vec"]))
        for r in spark.read.parquet(os.path.join(out_dir, "centroids.parquet"))
        .orderBy("centroid_id")
        .collect()
    ]
    emb = new_emb.select(id_col, embedding_col)
    n_new = emb.count()
    assigned = assign_ivf_cells_np(
        emb, centroids, embedding_col=embedding_col, id_col=id_col
    )
    encoded = pq_encode_np(assigned, codebook, embedding_col=embedding_col)
    (
        encoded.select(
            id_col, embedding_col, F.col("centroid_id").alias("cell"), "codes"
        )
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(out_dir, "index"))
    )
    meta["n_vectors"] = int(meta["n_vectors"]) + n_new
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def compact_ann_index(spark: SparkSession, out_dir: str) -> dict:
    """Compact the cell-partitioned postings after many
    :func:`add_to_ann_index` appends — one sorted file per cell instead
    of one file per (cell, append batch). Same safe shape as the text
    sibling (plans/text_index.compact_text_index): stage into
    ``index.compact``, atomic-rename swap, so a crash leaves the live
    index untouched. Model sidecars (centroids/codebook/meta) are
    untouched — compaction moves bytes, not rows."""
    import shutil

    idx_dir = os.path.join(out_dir, "index")
    staging = os.path.join(out_dir, "index.compact")
    backup = os.path.join(out_dir, "index.old")

    def _count_files(d: str) -> int:
        return sum(
            1
            for root, _dirs, files in os.walk(d)
            for fn in files
            if fn.endswith(".parquet")
        )

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    before = _count_files(idx_dir)
    rows = spark.read.parquet(idx_dir)
    n_rows = rows.count()
    id_col = next(c for c in rows.columns if c not in ("embedding", "cell", "codes"))
    (
        rows.repartition(int(meta["nlist"]), "cell")
        .sortWithinPartitions("cell", id_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(staging)
    )
    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.rename(idx_dir, backup)
    os.rename(staging, idx_dir)
    shutil.rmtree(backup)
    return {
        "n_files_before": before,
        "n_files_after": _count_files(idx_dir),
        "n_rows": n_rows,
    }
