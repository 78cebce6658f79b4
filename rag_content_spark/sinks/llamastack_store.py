"""W4: the llama-stack ``faiss_store.db`` artifact — the reference CLI's
DEFAULT store.

Reference flow: ``scripts/generate_embeddings.py:28`` defaults
``--vector-store-type llamastack-faiss``; ``document_processor.py:360-361``
derives the filename (``faiss_store.db``), ``:739-761`` (``save``) writes
the llama-stack YAML pointing the ``kv_rag`` storage backend at that file
(``config_templates.py:68-70,112-114``) and lets the llama-stack ("OGX")
inline faiss vector_io provider persist into it during
``_insert_prechunked_documents`` (``document_processor.py:470-573``). The
query path reads the same artifact (``scripts/query_rag.py:159-255``, store
detection ``:306-316``).

The artifact itself is the PUBLIC llama-stack (0.3.x) sqlite KV layout:

- one table ``kvstore (key TEXT PRIMARY KEY, value TEXT, expiration
  TIMESTAMP)`` (llama_stack providers/utils/kvstore/sqlite),
- keys namespaced ``vector_io::faiss:`` (the ``persistence.namespace`` in
  config_templates.py:112-114),
- the index record ``faiss_index:v3::<store_id>`` whose JSON value holds
  ``chunk_by_index`` (position -> Chunk JSON) and ``faiss_index``
  (base64 of the serialized FAISS IndexFlatL2 — document_processor's
  llama-stack path is L2, SURVEY §2.1),
- the store-metadata record ``openai_vector_stores:v3::<store_id>``
  (llama-stack's OpenAIVectorStoreMixin registry entry).

Chunk JSON mirrors the reference's insert payload
(document_processor.py:446-457,556-566): content / chunk_id / metadata
(with ``source``) / chunk_metadata{document_id, chunk_id, source} /
embedding_model / embedding_dimension. Embeddings live in the serialized
index, not the chunk records.

Like W1 (exports.export_faiss), this is a deliberate driver-side
single-artifact sink: rows stream in id order via ``toLocalIterator`` (one
partition resident at a time) and the FAISS serialization is injectable so
the artifact layout is fully testable without faiss in the container; at
100 TB the canonical Parquet index is the store and this export runs on
filtered subsets.
"""

from __future__ import annotations

import base64
import json
import sqlite3
import time
from typing import Any, Callable

from pyspark.sql import DataFrame

KV_TABLE = "kvstore"
KV_NAMESPACE = "vector_io::faiss"
FAISS_INDEX_PREFIX = "faiss_index:v3::"
OPENAI_VECTOR_STORES_PREFIX = "openai_vector_stores:v3::"
DB_FILENAME = "faiss_store.db"


def serialize_flat_l2(vectors) -> bytes:
    """Serialize an IndexFlatL2 over ``vectors`` with real faiss when
    installed, else the pure-Python flat-format writer (faiss_io.py —
    byte-identical layout); inject ``serialize_index`` to test the
    artifact layout without the library."""
    import numpy as np

    mat = np.asarray(vectors, dtype="float32")
    try:
        import faiss
    except ImportError:
        from rag_content_spark.sinks.faiss_io import serialize_flat

        return serialize_flat(mat, metric="l2")
    index = faiss.IndexFlatL2(mat.shape[1])
    index.add(mat)
    return bytes(faiss.serialize_index(index))


def chunk_record(
    row: dict[str, Any],
    index_name: str,
    embedding_model: str,
    embedding_dimension: int,
    id_col: str = "chunk_id",
    text_col: str = "chunk_text",
    doc_col: str = "document_id",
    source_col: str = "docs_url",
) -> dict[str, Any]:
    """One Chunk payload, shaped like the reference's insert dict
    (document_processor.py:446-457 add_docs + :556-566 enrichment)."""
    source = row.get(source_col) or row.get("title") or index_name
    return {
        "content": row[text_col],
        "chunk_id": row[id_col],
        "metadata": {
            "document_id": row.get(doc_col),
            "source": index_name,
            **{
                k: row[k]
                for k in ("title", "docs_url")
                if k in row and row[k] is not None
            },
        },
        "chunk_metadata": {
            "document_id": row.get(doc_col),
            "chunk_id": row[id_col],
            "source": source,
        },
        "embedding_model": embedding_model,
        "embedding_dimension": embedding_dimension,
    }


def write_llamastack_faiss(
    chunks: DataFrame,
    db_path: str,
    vector_store_id: str,
    index_name: str = "rag",
    embedding_model: str = "sentence-transformers/all-mpnet-base-v2",
    id_col: str = "chunk_id",
    text_col: str = "chunk_text",
    embedding_col: str = "embedding",
    doc_col: str = "document_id",
    serialize_index: Callable[[list], bytes] | None = None,
    created_at: int | None = None,
) -> dict[str, Any]:
    """Write ``faiss_store.db`` so the reference's ``query_rag.py`` OGX
    path (and our ``detect_store_type``) recognize it.

    Returns ``{"count", "dim", "db_path", "vector_store_id"}``.
    """
    cols = [
        f.name
        for f in chunks.schema.fields
        if f.name != embedding_col
    ]
    ordered = chunks.orderBy(id_col)
    chunk_by_index: dict[str, str] = {}
    vectors: list[Any] = []
    dim = 0
    for i, row in enumerate(ordered.toLocalIterator()):
        rd = row.asDict()
        vec = rd.get(embedding_col)
        if vec is not None:
            vectors.append(list(vec))
            dim = len(vec)
        rec = chunk_record(
            {k: rd.get(k) for k in cols},
            index_name,
            embedding_model,
            dim,
            id_col=id_col,
            text_col=text_col,
            doc_col=doc_col,
        )
        chunk_by_index[str(i)] = json.dumps(rec)

    ser = serialize_index or serialize_flat_l2
    payload = {
        "chunk_by_index": chunk_by_index,
        "faiss_index": base64.b64encode(ser(vectors)).decode("utf-8"),
    }
    store_info = {
        "id": vector_store_id,
        "object": "vector_store",
        "name": index_name,
        "created_at": int(created_at if created_at is not None else time.time()),
        "file_counts": {
            "cancelled": 0,
            "completed": 0,
            "failed": 0,
            "in_progress": 0,
            "total": 0,
        },
        "status": "completed",
        "usage_bytes": 0,
        "metadata": {
            "provider_id": index_name,
            "embedding_model": embedding_model,
            "embedding_dimension": dim,
        },
    }

    conn = sqlite3.connect(db_path)
    try:
        with conn:
            conn.execute(
                f"CREATE TABLE IF NOT EXISTS {KV_TABLE} "
                "(key TEXT PRIMARY KEY, value TEXT, expiration TIMESTAMP)"
            )
            conn.execute(
                f"INSERT OR REPLACE INTO {KV_TABLE} (key, value) VALUES (?, ?)",
                (
                    f"{KV_NAMESPACE}:{FAISS_INDEX_PREFIX}{vector_store_id}",
                    json.dumps(payload),
                ),
            )
            conn.execute(
                f"INSERT OR REPLACE INTO {KV_TABLE} (key, value) VALUES (?, ?)",
                (
                    f"{KV_NAMESPACE}:{OPENAI_VECTOR_STORES_PREFIX}{vector_store_id}",
                    json.dumps(store_info),
                ),
            )
    finally:
        conn.close()
    return {
        "count": len(chunk_by_index),
        "dim": dim,
        "db_path": db_path,
        "vector_store_id": vector_store_id,
    }


def read_llamastack_faiss(
    db_path: str, vector_store_id: str | None = None
) -> dict[str, Any]:
    """Parse the artifact back (inspection / round-trip tests): returns
    ``{"store_info", "chunks" (position-ordered list), "faiss_index"
    (raw bytes), "vector_store_id"}``."""
    conn = sqlite3.connect(db_path)
    try:
        rows = dict(
            conn.execute(f"SELECT key, value FROM {KV_TABLE}").fetchall()
        )
    finally:
        conn.close()
    if vector_store_id is None:
        prefix = f"{KV_NAMESPACE}:{FAISS_INDEX_PREFIX}"
        ids = [k[len(prefix) :] for k in rows if k.startswith(prefix)]
        if not ids:
            raise ValueError(f"no faiss_index record in {db_path}")
        vector_store_id = ids[0]
    payload = json.loads(
        rows[f"{KV_NAMESPACE}:{FAISS_INDEX_PREFIX}{vector_store_id}"]
    )
    info_key = f"{KV_NAMESPACE}:{OPENAI_VECTOR_STORES_PREFIX}{vector_store_id}"
    chunks = [
        json.loads(payload["chunk_by_index"][k])
        for k in sorted(payload["chunk_by_index"], key=int)
    ]
    return {
        "store_info": json.loads(rows[info_key]) if info_key in rows else None,
        "chunks": chunks,
        "faiss_index": base64.b64decode(payload["faiss_index"]),
        "vector_store_id": vector_store_id,
    }
