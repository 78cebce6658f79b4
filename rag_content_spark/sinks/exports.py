"""Export writers: FAISS (W1), PGVector (W2), metadata.json (W3),
llama-stack / lightspeed-stack YAML configs (W6).

These reproduce the reference's *artifacts* for drop-in compatibility;
they are deliberately driver-side single-node steps (a FAISS file IS a
single binary artifact — same as the reference's output). At 100 TB the
canonical Parquet index (parquet_sink.py) is the real store and these
exports run on filtered subsets.
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import DataFrame


def export_faiss(
    chunks: DataFrame,
    output_path: str,
    metric: str = "ip",
    embedding_col: str = "embedding",
    id_col: str = "chunk_id",
    index_factory=None,
    index_writer=None,
    batch_rows: int = 4096,
) -> dict[str, Any]:
    """W1 (reference document_processor.py:238-240,266-279): build a FAISS
    IndexFlatIP/-L2 from the embedded chunks and persist it, plus the
    position→id sidecar (``<output_path>.ids.json``) that mirrors
    llama-index FaissVectorStore's index_to_id map: vector i in the file
    is chunk ``ids[i]``.

    Rows stream via ``orderBy(id_col).toLocalIterator()`` — the global
    sort makes the vector order deterministic (the reference adds nodes
    in list order; a distributed source has no inherent order), and
    toLocalIterator keeps one partition resident on the driver. Vectors
    are added in ``batch_rows`` batches (faiss add() is vectorized;
    per-row add was ~50× slower).

    ``index_factory(dim) -> index`` and ``index_writer(index, path)``
    default to real faiss when installed and otherwise to the
    pure-Python flat-format writer (sinks/faiss_io.py — the public
    faiss on-disk layout, loadable by ``faiss.read_index``), so this
    export works end-to-end in containers without the faiss binary;
    both stay injectable for other backends.
    """
    import numpy as np

    if index_factory is None or index_writer is None:
        try:
            import faiss

            index_factory = index_factory or (
                lambda dim: faiss.IndexFlatIP(dim)
                if metric == "ip"
                else faiss.IndexFlatL2(dim)
            )
            index_writer = index_writer or faiss.write_index
        except ImportError:
            from rag_content_spark.sinks.faiss_io import PyFlatIndex

            index_factory = index_factory or (
                lambda dim: PyFlatIndex(dim, metric)
            )
            index_writer = index_writer or (
                lambda index, path: index.write(path)
            )

    ordered = chunks.select(id_col, embedding_col).orderBy(id_col)
    index = None
    ids: list[Any] = []
    buf: list[Any] = []

    def _flush():
        nonlocal index
        if not buf:
            return
        mat = np.asarray(buf, dtype="float32")
        if index is None:
            index = index_factory(mat.shape[1])
        index.add(mat)
        buf.clear()

    for row in ordered.toLocalIterator():
        ids.append(row[0])
        buf.append(row[1])
        if len(buf) >= batch_rows:
            _flush()
    _flush()

    dim = 0
    if index is not None:
        index_writer(index, output_path)
        dim = int(getattr(index, "d", 0))
        with open(output_path + ".ids.json", "w") as fh:
            json.dump({str(i): str(v) for i, v in enumerate(ids)}, fh)
    return {"count": len(ids), "dim": dim, "ids": ids}


def pgvector_insert_sql(
    table_name: str, row: dict[str, Any], embedding_col: str = "embedding"
) -> tuple[str, list[Any]]:
    """W2 SQL builder (reference document_processor.py:242-256 uses
    PGVectorStore): one parameterized INSERT with a pgvector literal
    cast. The actual write is ``foreachPartition`` with one psycopg
    connection per partition (connection code import-gated)."""
    cols = [c for c in row if c != embedding_col]
    vec = "[" + ",".join(str(float(x)) for x in row[embedding_col]) + "]"
    placeholders = ", ".join(["%s"] * len(cols)) + ", %s::vector"
    sql = (
        f"INSERT INTO {table_name} ({', '.join(cols)}, {embedding_col}) "
        f"VALUES ({placeholders})"
    )
    return sql, [row[c] for c in cols] + [vec]


def write_pgvector(chunks: DataFrame, table_name: str, dsn: str) -> None:
    """W2: distributed pgvector write — one connection per partition."""

    def _write_partition(rows):
        import psycopg2  # import-gated; not in this container

        conn = psycopg2.connect(dsn)
        with conn, conn.cursor() as cur:
            for row in rows:
                sql, params = pgvector_insert_sql(table_name, row.asDict())
                cur.execute(sql, params)
        conn.close()

    chunks.foreachPartition(_write_partition)


def build_metadata_json(
    *,
    execution_time_s: int,
    embedding_model: str,
    index_id: str,
    vector_db: str,
    embedding_dimension: int,
    chunk: int,
    overlap: int,
    total_embedded_files: int,
) -> dict[str, Any]:
    """W3 (reference document_processor.py:281-300): exact key set of the
    reference's metadata.json."""
    return {
        "execution-time": execution_time_s,
        "llm": "None",
        "embedding-model": embedding_model,
        "index-id": index_id,
        "vector-db": vector_db,
        "embedding-dimension": embedding_dimension,
        "chunk": chunk,
        "overlap": overlap,
        "total-embedded-files": total_embedded_files,
    }


def write_metadata_json(path: str, meta: dict[str, Any]) -> None:
    with open(path, "w") as fh:
        json.dump(meta, fh, indent=2)


LLAMA_STACK_YAML = """\
version: '2'
image_name: rag-content-spark
apis:
- vector_io
- inference
providers:
  vector_io:
  - provider_id: faiss
    provider_type: inline::faiss
    config:
      kvstore:
        type: sqlite
        db_path: {db_path}
  inference:
  - provider_id: sentence-transformers
    provider_type: inline::sentence-transformers
    config: {{}}
models:
- model_id: {embedding_model}
  provider_id: sentence-transformers
  model_type: embedding
  metadata:
    embedding_dimension: {embedding_dimension}
vector_store_id: {vector_store_id}
"""

LIGHTSPEED_STACK_YAML = """\
name: rag-content-spark
service:
  host: 0.0.0.0
  port: 8080
llama_stack:
  use_as_library_client: true
  library_client_config_path: {llama_stack_config}
"""


def render_llama_stack_yaml(
    db_path: str,
    embedding_model: str,
    embedding_dimension: int,
    vector_store_id: str = "",
) -> str:
    """W6 (reference config_templates.py:20-125 + vector_store_id patch at
    document_processor.py:725-737)."""
    return LLAMA_STACK_YAML.format(
        db_path=db_path,
        embedding_model=embedding_model,
        embedding_dimension=embedding_dimension,
        vector_store_id=vector_store_id,
    )


def render_lightspeed_stack_yaml(llama_stack_config: str) -> str:
    """W6 (reference config_templates.py:126-196)."""
    return LIGHTSPEED_STACK_YAML.format(llama_stack_config=llama_stack_config)


class Timer:
    """Wall-clock capture for metadata.json execution-time (the reference
    records int seconds, document_processor.py:288-290)."""

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.seconds = int(time.time() - self._t0)
        return False
