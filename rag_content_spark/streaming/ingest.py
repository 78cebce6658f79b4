"""Streaming document ingest (north-star extension; SURVEY §7.2 M5).

The reference rebuilds its index from scratch every run. Spark-first
incremental alternative: a file-source stream over the docs folder, the
same build_chunks plan (it is lazy and stream-safe: narrow ops + one
embedding UDF), exactly-once append into the canonical Parquet index.

``availableNow`` gives catch-up-then-stop batch semantics — the natural
"re-run the nightly build" mode; leave trigger unset for continuous tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rag_content_spark.plans.build_pipeline import BuildConfig, build_chunks


def stream_text_documents(
    spark: SparkSession, folder: str, glob: str = "*.md"
) -> DataFrame:
    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
    )
    df = reader.load(folder)
    path = F.input_file_name()
    return df.select(
        path.alias("file_path"),
        F.element_at(F.split(path, "/"), -1).alias("file_name"),
        F.lit("markdown").alias("doc_type"),
        F.md5(path).alias("doc_id"),
        F.col("value").alias("text"),
    )


def start_index_stream(
    spark: SparkSession,
    folder: str,
    output_path: str,
    checkpoint_path: str,
    cfg: BuildConfig | None = None,
    embedder=None,
    available_now: bool = True,
):
    """Stream folder → embedded chunks → Parquet append, exactly-once via
    the checkpoint. Returns the StreamingQuery."""
    cfg = cfg or BuildConfig()
    docs = stream_text_documents(spark, folder)
    chunks = build_chunks(docs, cfg, embedder=embedder)
    writer = (
        chunks.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_table_stream(
    stream: DataFrame,
    table_dir: str,
    checkpoint_path: str,
    key_col: str = "doc_id",
    available_now: bool = True,
):
    """Stream -> versioned-table upserts: each micro-batch lands as one
    snapshot (sinks/versioned_table), so re-crawled documents shadow
    their old versions latest-wins while readers keep time travel.

    Exactly-once: the pair (streaming query id, ``batch_id``) is
    recorded in the snapshot manifest and ``write_snapshot`` skips a
    pair that already has a committed manifest — so a replayed batch
    (manifest committed but the streaming checkpoint crashed before
    advancing) is a no-op instead of a phantom duplicate snapshot. The
    query id scopes the dedup to THIS checkpoint's run: deleting and
    recreating the checkpoint restarts batch ids at 0, but the fresh
    checkpoint mints a fresh query id, so restarted batches land as new
    snapshots instead of silently no-op'ing against historical
    manifests. Empty batches are skipped (no empty snapshots).
    """
    import json
    import os

    from rag_content_spark.sinks.versioned_table import write_snapshot

    def _query_id() -> str | None:
        # the stable UUID Structured Streaming writes to
        # <checkpoint>/metadata at query start — regenerated iff the
        # checkpoint is recreated, which is exactly the scope we want
        try:
            with open(os.path.join(checkpoint_path, "metadata")) as f:
                return json.load(f)["id"]
        except Exception:
            return None

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_snapshot(
            batch_df, table_dir, mode="upsert", key_col=key_col,
            batch_id=batch_id, txn_app_id=_query_id(),
        )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
