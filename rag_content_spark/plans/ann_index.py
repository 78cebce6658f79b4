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

Layout (commit-logged since round 8, same protocol as text_index):

    out_dir/
      meta.json                   static config {format, metric, dim,
                                  nlist, m, k, id_col, embedding_col}
      centroids.parquet           frozen IVF model
      codebook.json               frozen PQ model
      data/i-<uuid>/cell=NN/...   index segments (one per writer)
      commits/snap-NNNNN.json     hard-link-claimed manifests
                                  {kind, dirs, stats: {n_vectors}}

Maintenance is CONCURRENCY-SAFE via plans/index_commit.py: adds write
unique staging segments and claim commits (no shared-dir appends, no
meta.json read-modify-write — concurrent adds never lose an
``n_vectors`` update), compaction absorbs the live view into one
segment under a single ``compact`` commit with ``base_version``
snapshot isolation, and a crash at any point leaves the old view
intact (no renames). Pre-log indexes (bare ``index/`` + stats in
meta.json) read transparently and upgrade on their first logged write.

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

from rag_content_spark.plans import index_commit as ic


def _legacy_root(meta: dict) -> dict:
    return {
        "kind": "base",
        "version": 0,
        "base_version": 0,
        "dirs": {"index": "index"},
        "stats": {"n_vectors": int(meta["n_vectors"])},
    }


def _live(out_dir: str, meta: dict) -> tuple[dict, list[dict], dict]:
    legacy = _legacy_root(meta) if "n_vectors" in meta else None
    root, adds = ic.live_view(out_dir, legacy_root=legacy)
    return root, adds, ic.view_stats(root, adds)


def _read_live_index(spark: SparkSession, out_dir: str, meta: dict) -> DataFrame:
    root, adds, _stats = _live(out_dir, meta)
    df = ic.read_union(spark, out_dir, ic.view_dirs(root, adds, "index"))
    dels = _tombstones(spark, out_dir, root, adds, meta["id_col"])
    return df if dels is None else df.join(dels, meta["id_col"], "left_anti")


def _tombstones(
    spark: SparkSession, out_dir: str, root: dict, adds: list[dict], id_col: str
) -> DataFrame | None:
    dirs = ic.view_dirs(root, adds, "deletes")
    if not dirs:
        return None
    return ic.read_union(spark, out_dir, dirs).select(id_col).distinct()


def delete_from_ann_index(spark: SparkSession, out_dir: str, ids) -> dict:
    """Delete vectors by id (the text sibling's contract,
    plans/text_index.delete_from_text_index): one tombstone segment +
    one ``delete`` commit with an exact negative ``n_vectors`` delta
    computed against the live view; the pruned query path anti-joins
    live tombstones and :func:`compact_ann_index` drops the masked rows
    physically. Returns the meta view after the delete."""
    meta, _cb = load_ann_meta(out_dir)
    with open(os.path.join(out_dir, "meta.json")) as fh:
        raw_meta = json.load(fh)
    if "n_vectors" in raw_meta:
        ic.ensure_base(
            out_dir, _legacy_root({"n_vectors": raw_meta["n_vectors"]})
        )
    id_col = meta["id_col"]
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(i,) for i in ids], [id_col])
    ids = ids.select(F.col(ids.columns[0]).alias(id_col)).distinct()
    live = _read_live_index(spark, out_dir, meta).select(id_col)
    n_hit = live.join(ids, id_col, "leftsemi").count()
    d_dir = ic.staging_dir(out_dir, "d")
    ids.write.mode("errorifexists").parquet(os.path.join(out_dir, d_dir))
    ic.claim(
        out_dir,
        {
            "kind": "delete",
            "dirs": {"deletes": d_dir},
            "stats": {"n_vectors": -int(n_hit)},
        },
    )
    _root, _adds, stats = _live(out_dir, meta)
    meta["n_vectors"] = stats["n_vectors"]
    return meta


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
    """Train + encode + write. Returns the meta dict (config +
    n_vectors).

    Seeding is deterministic (the nlist lowest (xxhash64(id), id) keys),
    so the same corpus always builds the same index. ``id_col`` and
    ``embedding_col`` are recorded in meta.json so maintenance never
    has to infer column roles (round-7 ADVICE: compact guessed the id
    column and a custom embedding column name silently broke the
    per-cell sort).
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
    os.makedirs(out_dir, exist_ok=True)
    i_dir = ic.staging_dir(out_dir, "i")
    (
        encoded.select(
            id_col, embedding_col, F.col("centroid_id").alias("cell"), "codes"
        )
        .write.mode("errorifexists")
        .partitionBy("cell")
        .parquet(os.path.join(out_dir, i_dir))
    )
    spark = emb.sparkSession
    spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        "centroid_id int, centroid_vec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "centroids.parquet")
    )
    meta = {
        "format": "rag-spark-ann/2",
        "metric": "l2",
        "dim": dim,
        "nlist": nlist,
        "m": m,
        "k": k,
        "id_col": id_col,
        "embedding_col": embedding_col,
    }
    with open(os.path.join(out_dir, "codebook.json"), "w") as f:
        json.dump(codebook, f)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    ic.claim(
        out_dir,
        {"kind": "base", "dirs": {"index": i_dir}, "stats": {"n_vectors": n}},
    )
    return meta | {"n_vectors": n}


def load_ann_meta(out_dir: str) -> tuple[dict, list]:
    """(meta, codebook); meta includes live n_vectors and defaults
    id_col/embedding_col for pre-round-8 indexes."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(out_dir, "codebook.json")) as f:
        codebook = json.load(f)
    meta.setdefault("id_col", "vec_id")
    meta.setdefault("embedding_col", "embedding")
    _root, _adds, stats = _live(out_dir, meta)
    meta["n_vectors"] = stats["n_vectors"]
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

    The returned plan's scans carry a ``cell IN (...)`` partition
    filter (every live segment's scan — per-segment reads keep the
    filter); with ``refine`` the full vectors are read ONLY for the
    ``4 * topk`` ADC shortlist (broadcast self-join on the id)."""
    from rag_content_spark.functions.vector import (
        euclidean,
        pq_adc_score,
        pq_adc_table,
    )

    meta, codebook = load_ann_meta(out_dir)
    id_col, embedding_col = meta["id_col"], meta["embedding_col"]
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

    index = _read_live_index(spark, out_dir, meta).filter(
        F.col("cell").isin(cells)
    )
    table = pq_adc_table([float(x) for x in query_vec], codebook)
    adc = F.round(pq_adc_score("codes", table), 6)
    shortlist = (
        index.select(id_col, adc.alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(4 * topk if refine else topk)
    )
    if not refine:
        return shortlist
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    exact = (
        index.select(id_col, embedding_col)
        .join(F.broadcast(shortlist), id_col)
        .select(
            id_col,
            "adc",
            F.round(euclidean(F.col(embedding_col), qlit), 6).alias("exact"),
        )
        .orderBy(F.asc("exact"), F.asc(id_col))
        .limit(topk)
    )
    return exact


def add_to_ann_index(
    new_emb: DataFrame,
    out_dir: str,
) -> dict:
    """Incremental add — the FAISS ``index.add()`` shape: the trained
    model (centroids + PQ codebook) is FROZEN; new vectors are assigned
    to their existing cells, PQ-encoded with the existing codebook, and
    committed as a new cell-partitioned segment (unique staging dir +
    hard-link commit claim — concurrent adds never collide or lose an
    ``n_vectors`` update; pinned by the threaded race test). Readers
    and the partition-pruned query path pick segments up with no
    rebuild. Column roles come from meta.json (id_col/embedding_col
    recorded at build). Returns the meta view after this add.

    Quantization drift is the documented trade (same as FAISS): adds
    do not move centroids, so after heavy growth rebuild with
    :func:`build_ann_index`. Id uniqueness across adds is the caller's
    contract (use ``incremental_dedup``/``index_upsert`` upstream when
    re-adds are possible).
    """
    from rag_content_spark.functions.vector import pq_encode_np
    from rag_content_spark.operators.similarity import assign_ivf_cells_np

    meta, codebook = load_ann_meta(out_dir)
    id_col, embedding_col = meta["id_col"], meta["embedding_col"]
    with open(os.path.join(out_dir, "meta.json")) as fh:
        raw_meta = json.load(fh)
    if "n_vectors" in raw_meta:  # pre-log index: upgrade first
        ic.ensure_base(
            out_dir, _legacy_root({"n_vectors": raw_meta["n_vectors"]})
        )
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
    i_dir = ic.staging_dir(out_dir, "i")
    (
        encoded.select(
            id_col, embedding_col, F.col("centroid_id").alias("cell"), "codes"
        )
        .write.mode("errorifexists")
        .partitionBy("cell")
        .parquet(os.path.join(out_dir, i_dir))
    )
    ic.claim(
        out_dir,
        {
            "kind": "add",
            "dirs": {"index": i_dir},
            "stats": {"n_vectors": n_new},
        },
    )
    _root, _adds, stats = _live(out_dir, meta)
    meta["n_vectors"] = stats["n_vectors"]
    return meta


def compact_ann_index(spark: SparkSession, out_dir: str) -> dict:
    """Compact the cell-partitioned segments after many
    :func:`add_to_ann_index` commits — one sorted file per cell instead
    of one file per (cell, add batch). Same protocol as the text
    sibling (plans/text_index.compact_text_index): stage a fresh
    segment, claim ONE ``compact`` commit recording ``base_version`` —
    an add racing the compaction stays live, a crash leaves the old
    view intact (no renames), and superseded segments are reclaimed by
    :func:`vacuum_ann_index`. Model sidecars (centroids/codebook/meta)
    are untouched — compaction moves bytes, not rows. The per-cell sort
    key is the RECORDED id column (round-7 ADVICE: no more inference)."""
    meta, _codebook = load_ann_meta(out_dir)
    with open(os.path.join(out_dir, "meta.json")) as fh:
        raw_meta = json.load(fh)
    if "n_vectors" in raw_meta:
        ic.ensure_base(
            out_dir, _legacy_root({"n_vectors": raw_meta["n_vectors"]})
        )
    root, adds, live = _live(out_dir, meta)
    base_version = max([root["version"]] + [a["version"] for a in adds])
    i_dirs = ic.view_dirs(root, adds, "index")
    before = _count_files(out_dir, i_dirs)
    rows = ic.read_union(spark, out_dir, i_dirs)
    dels = _tombstones(spark, out_dir, root, adds, meta["id_col"])
    if dels is not None:  # apply tombstones physically
        rows = rows.join(dels, meta["id_col"], "left_anti")
    n_rows = rows.count()
    i_dir = ic.staging_dir(out_dir, "i")
    (
        rows.repartition(int(meta["nlist"]), "cell")
        .sortWithinPartitions("cell", meta["id_col"])
        .write.mode("errorifexists")
        .partitionBy("cell")
        .parquet(os.path.join(out_dir, i_dir))
    )
    ic.claim(
        out_dir,
        {
            "kind": "compact",
            "base_version": base_version,
            "dirs": {"index": i_dir},
            # EXACT recount of the materialized survivors, not the
            # accumulated live total: concurrent overlapping deletes
            # (or a delete racing an add of the same ids) can skew the
            # delta-summed stats (write-skew — see index_commit
            # docstring); recomputing here makes the drift self-heal
            # at every compaction.
            "stats": {"n_vectors": int(n_rows)},
        },
    )
    new_root, new_adds, _s = _live(out_dir, meta)
    return {
        "n_files_before": before,
        "n_files_after": _count_files(
            out_dir, ic.view_dirs(new_root, new_adds, "index")
        ),
        "n_rows": n_rows,
    }


def vacuum_ann_index(out_dir: str) -> int:
    """Reclaim segments superseded by compaction; see
    index_commit.vacuum_index. Returns directories removed."""
    return ic.vacuum_index(out_dir)


def _count_files(out_dir: str, rel_dirs: list[str]) -> int:
    n = 0
    for rel in rel_dirs:
        for _root, _dirs, files in os.walk(os.path.join(out_dir, rel)):
            n += sum(1 for fn in files if fn.endswith(".parquet"))
    return n
