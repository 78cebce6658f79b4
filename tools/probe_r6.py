"""Round-6 scale probes (BASELINE.md evidence).

1. semdedup + bitext_margin_ivf on a NON-replicated scaled corpus:
   sf0.1 embeddings replicated Nx with a deterministic per-replica
   perturbation (distinct vectors, planted cross-replica near-dups), so
   the IVF paths produce nonzero output and recall is measurable —
   byte-replication makes bitext margins exactly 1.0 by construction
   (the r5 caveat this probe closes). Both run the REGISTERED
   (vectorized-assignment) path.
2. pagerank_fixed at 10x with 50 iterations and checkpoint_every=5:
   flat per-iteration cost evidence for the lineage cut.
3. Megatron .bin/.idx and WebDataset tar sink throughput at 10x.

Usage: python tools/probe_r6.py [probe ...]   (default: all)
  probes: semdedup bitext pagerank sinks
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def perturbed_embeddings(spark, n: int):
    """sf0.1 embeddings replicated n-x: replica r of vector v keeps the
    direction but adds a small deterministic per-dim offset
    sin(vec_id*31 + r*17 + i) * 0.03 — distinct vectors, cross-replica
    cosine ~0.995 (planted near-dups), no two replicas byte-equal."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    reps = spark.range(n).select(F.col("id").alias("_rep"))
    return (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + F.sin(F.col("vec_id") * 31 + F.col("_rep") * 17 + i) * 0.03,
            ).cast("array<float>").alias("embedding"),
        )
        .repartition(32)
    )


def probe_semdedup(spark, n: int) -> None:
    from pyspark.sql import functions as F

    from rag_content_spark.operators.dedup import semdedup, semdedup_dropped_np
    from rag_content_spark.operators.similarity import assign_ivf_cells_np
    from rag_content_spark.queries import _SEMDEDUP_T6

    emb = perturbed_embeddings(spark, n).localCheckpoint(eager=True)
    total = emb.count()
    # ~sqrt(N) centroids, sampled across base ids AND replicas (the
    # modulus is coprime-ish to the replica shift so the sample is
    # diverse — the paper's cell sizing)
    m = max(1, int(total**0.5))
    cents = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") % m == 0).orderBy("vec_id").collect()
    ]
    t0 = time.time()
    out = semdedup(
        emb,
        cents,
        threshold6=_SEMDEDUP_T6,
        assign_fn=assign_ivf_cells_np,
        pairwise_fn=semdedup_dropped_np,
    )
    dropped = out.filter(~F.col("keep")).count()
    print(
        f"semdedup {n}x (np pairwise): {time.time()-t0:.1f} s, {total} vectors, "
        f"{len(cents)} cells, {dropped} dropped / {total - dropped} kept",
        flush=True,
    )


def probe_bitext(spark, n: int, with_recall: bool = True) -> None:
    from pyspark.sql import functions as F

    from rag_content_spark.operators.search import mine_bitext_ivf, mine_bitext_np

    emb = perturbed_embeddings(spark, n).localCheckpoint(eager=True)
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    cents = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") % (50 * n) == 1)
        .orderBy("vec_id")
        .collect()
    ]
    t0 = time.time()
    ivf = mine_bitext_ivf(
        src, tgt, cents, k=4, nprobe=3, margin_threshold=1.05
    ).localCheckpoint(eager=True)
    ivf_rows = ivf.count()
    t_ivf = time.time() - t0
    line = (
        f"bitext_margin_ivf {n}x: {t_ivf:.1f} s, "
        f"{len(cents)} cells nprobe=3, {ivf_rows} pairs"
    )
    if with_recall:
        t0 = time.time()
        exact = mine_bitext_np(
            src, tgt, k=4, margin_threshold=1.05
        ).localCheckpoint(eager=True)
        t_np = time.time() - t0
        ex_rows = exact.count()
        hit = ivf.join(exact, ["id_a", "id_b"], "left_semi").count()
        line += (
            f"; exact(np) {t_np:.1f} s {ex_rows} pairs, "
            f"pair-recall {hit}/{ex_rows} = {hit / max(ex_rows, 1):.3f}"
        )
    print(line, flush=True)


def probe_pagerank(spark, n: int) -> None:
    from pyspark.sql import functions as F

    from rag_content_spark.operators.graph import pagerank_fixed

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(n).select(F.col("id").alias("_rep"))
    nodes = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("_rep") * 100_000).alias("src")
    )
    # 3 pseudo-random out-edges per node (Knuth multiplicative hash)
    edges = None
    m = nodes.count()
    for salt in (2654435761, 40503, 2246822519):
        e = nodes.select(
            "src", ((F.col("src") * salt) % m).alias("dst")
        )
        edges = e if edges is None else edges.unionAll(e)
    edges = edges.repartition(32).localCheckpoint(eager=True)
    n_edges = edges.count()
    for iters in (10, 50):
        t0 = time.time()
        rows = pagerank_fixed(edges, iters=iters, checkpoint_every=5).count()
        print(
            f"pagerank {n}x ({n_edges} edges, {iters} iters, cut@5): "
            f"{time.time()-t0:.1f} s ({(time.time()-t0)/iters:.2f} s/iter), "
            f"{rows} nodes",
            flush=True,
        )


def probe_sinks(spark, n: int) -> None:
    from pyspark.sql import functions as F

    from rag_content_spark.sinks.megatron import write_megatron_shards
    from rag_content_spark.sinks.webdataset import write_webdataset_shards

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(n).select(F.col("id").alias("_rep"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_rep") * 100_000).alias("doc_id"),
            "text",
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n_docs = big.count()

    toks = big.select(
        "doc_id",
        F.expr(
            "transform(filter(split(text, '\\\\s+'), x -> x <> ''),"
            " w -> cast(abs(hash(w)) % 50000 as int))"
        ).alias("tokens"),
    )
    out = "/tmp/probe_r6_megatron"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    manifest = write_megatron_shards(toks, out, n_shards=32).collect()
    dt = time.time() - t0
    nbytes = sum(r["bin_bytes"] for r in manifest)
    ntok = sum(r["n_tokens"] for r in manifest)
    print(
        f"megatron sink {n}x: {dt:.1f} s, {n_docs} docs, {ntok} tokens, "
        f"{nbytes/1e6:.0f} MB bin -> {nbytes/1e6/dt:.0f} MB/s (32 shards)",
        flush=True,
    )
    shutil.rmtree(out, ignore_errors=True)

    out = "/tmp/probe_r6_wds"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    manifest = write_webdataset_shards(
        big, out, key_col="doc_id", payload_cols={"txt": "text"}, n_shards=32
    ).collect()
    dt = time.time() - t0
    nbytes = sum(r["bytes"] for r in manifest)
    print(
        f"webdataset sink {n}x: {dt:.1f} s, {n_docs} samples, "
        f"{nbytes/1e6:.0f} MB tar -> {nbytes/1e6/dt:.0f} MB/s (32 shards)",
        flush=True,
    )
    shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    from rag_content_spark.session import get_spark

    which = sys.argv[1:] or ["semdedup", "bitext", "pagerank", "sinks"]
    spark = get_spark("probe-r6")
    if "semdedup" in which:
        probe_semdedup(spark, 10)
        probe_semdedup(spark, 100)
    if "bitext" in which:
        probe_bitext(spark, 10, with_recall=True)
        probe_bitext(spark, 100, with_recall=False)
    if "pagerank" in which:
        probe_pagerank(spark, 10)
    if "sinks" in which:
        probe_sinks(spark, 10)


if __name__ == "__main__":
    main()
