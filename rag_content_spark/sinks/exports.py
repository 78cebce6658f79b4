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
) -> int:
    """W1 (reference document_processor.py:238-240,266-279): build a FAISS
    IndexFlatIP/-L2 from the embedded chunks and persist it.

    Uses toLocalIterator so only one partition is resident on the driver
    at a time. Import-gated: faiss is optional in this container.
    """
    try:
        import faiss
        import numpy as np
    except ImportError as exc:
        raise NotImplementedError("faiss not installed in this container") from exc

    index = None
    n = 0
    for row in chunks.select(embedding_col).toLocalIterator():
        vec = np.asarray(row[0], dtype="float32")[None, :]
        if index is None:
            index = (
                faiss.IndexFlatIP(vec.shape[1])
                if metric == "ip"
                else faiss.IndexFlatL2(vec.shape[1])
            )
        index.add(vec)
        n += 1
    if index is not None:
        faiss.write_index(index, output_path)
    return n


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
