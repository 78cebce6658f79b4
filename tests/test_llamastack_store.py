"""W4 faiss_store.db artifact + Q5 store auto-detect dispatch order."""

import json
import os
import sqlite3

import pytest

from rag_content_spark.plans.query import detect_store_type
from rag_content_spark.sinks.llamastack_store import (
    DB_FILENAME,
    FAISS_INDEX_PREFIX,
    KV_NAMESPACE,
    KV_TABLE,
    OPENAI_VECTOR_STORES_PREFIX,
    read_llamastack_faiss,
    write_llamastack_faiss,
)


def _fake_serialize(vectors) -> bytes:
    # deterministic stand-in for faiss.serialize_index (layout test only)
    return json.dumps(vectors).encode()


@pytest.fixture()
def chunks_df(spark):
    rows = [
        ("d1#1", "second chunk", "d1", "https://x/d1", "Doc One", [0.0, 1.0]),
        ("d1#0", "first chunk", "d1", "https://x/d1", "Doc One", [1.0, 0.0]),
        ("d2#0", "other doc", "d2", None, "Doc Two", [0.5, 0.5]),
    ]
    return spark.createDataFrame(
        rows,
        ["chunk_id", "chunk_text", "document_id", "docs_url", "title", "embedding"],
    )


def test_round_trip_artifact(tmp_path, chunks_df):
    db = str(tmp_path / DB_FILENAME)
    out = write_llamastack_faiss(
        chunks_df,
        db,
        vector_store_id="vs_123",
        index_name="rag-index",
        serialize_index=_fake_serialize,
        created_at=1700000000,
    )
    assert out == {
        "count": 3,
        "dim": 2,
        "db_path": db,
        "vector_store_id": "vs_123",
    }
    back = read_llamastack_faiss(db)
    assert back["vector_store_id"] == "vs_123"
    # position order = chunk_id order (deterministic stream)
    assert [c["chunk_id"] for c in back["chunks"]] == ["d1#0", "d1#1", "d2#0"]
    first = back["chunks"][0]
    # reference insert-payload shape (document_processor.py:446-457,556-566)
    assert first["content"] == "first chunk"
    assert first["metadata"]["document_id"] == "d1"
    assert first["metadata"]["source"] == "rag-index"
    assert first["chunk_metadata"] == {
        "document_id": "d1",
        "chunk_id": "d1#0",
        "source": "https://x/d1",
    }
    # chunk without docs_url falls back to title for chunk_metadata.source
    assert back["chunks"][2]["chunk_metadata"]["source"] == "Doc Two"
    # embeddings live in the serialized index, in the same order
    assert json.loads(back["faiss_index"]) == [
        [1.0, 0.0],
        [0.0, 1.0],
        [0.5, 0.5],
    ]
    assert back["store_info"]["id"] == "vs_123"
    assert back["store_info"]["created_at"] == 1700000000


def test_kv_layout_matches_llamastack(tmp_path, chunks_df):
    db = str(tmp_path / DB_FILENAME)
    write_llamastack_faiss(
        chunks_df, db, vector_store_id="vs_9", serialize_index=_fake_serialize
    )
    conn = sqlite3.connect(db)
    cols = [r[1] for r in conn.execute(f"PRAGMA table_info({KV_TABLE})")]
    keys = sorted(k for (k,) in conn.execute(f"SELECT key FROM {KV_TABLE}"))
    conn.close()
    assert cols == ["key", "value", "expiration"]
    assert keys == [
        f"{KV_NAMESPACE}:{FAISS_INDEX_PREFIX}vs_9",
        f"{KV_NAMESPACE}:{OPENAI_VECTOR_STORES_PREFIX}vs_9",
    ]


def test_without_faiss_pure_python_serialization(tmp_path, chunks_df):
    """W4 de-gated (round-8): without faiss the embedded index is
    serialized by the pure-Python flat-format writer — the base64
    payload decodes to a valid IndexFlatL2 byte string carrying the
    chunk vectors in id order."""
    import base64
    import json as _json
    import sqlite3

    from rag_content_spark.sinks.faiss_io import deserialize_flat

    out = write_llamastack_faiss(
        chunks_df, str(tmp_path / DB_FILENAME), vector_store_id="vs"
    )
    assert out["count"] > 0
    conn = sqlite3.connect(str(tmp_path / DB_FILENAME))
    (val,) = conn.execute(
        "SELECT value FROM kvstore WHERE key LIKE '%faiss_index:v3::%'"
    ).fetchone()
    payload = _json.loads(val)
    metric, mat = deserialize_flat(
        base64.b64decode(payload["faiss_index"])
    )
    assert metric == "l2" and mat.shape[0] == out["count"]


# ---------------------------------------------------------------------------
# Q5 detect_store_type — the reference's dispatch order (query_rag.py:306-316)


def _clear_pg(monkeypatch):
    monkeypatch.delenv("POSTGRES_DATABASE", raising=False)


def test_detect_env_override_wins(tmp_path, monkeypatch):
    # branch 1: POSTGRES_DATABASE set -> llamastack-pgvector, even with
    # other artifacts present
    (tmp_path / "metadata.json").write_text("{}")
    (tmp_path / DB_FILENAME).write_text("")
    monkeypatch.setenv("POSTGRES_DATABASE", "ragdb")
    assert detect_store_type(str(tmp_path)) == "llamastack-pgvector"


def test_detect_metadata_json_before_faiss_db(tmp_path, monkeypatch):
    # branch 2 beats branch 3 (reference checks metadata.json first)
    _clear_pg(monkeypatch)
    (tmp_path / "metadata.json").write_text("{}")
    (tmp_path / DB_FILENAME).write_text("")
    assert detect_store_type(str(tmp_path)) == "faiss"


def test_detect_llamastack_faiss_artifact(tmp_path, monkeypatch, chunks_df):
    # branch 3 on a REAL artifact written by the W4 sink
    _clear_pg(monkeypatch)
    write_llamastack_faiss(
        chunks_df,
        str(tmp_path / DB_FILENAME),
        vector_store_id="vs_1",
        serialize_index=_fake_serialize,
    )
    assert detect_store_type(str(tmp_path)) == "llamastack-faiss"


def test_detect_parquet_fallback_and_error(tmp_path, monkeypatch):
    # branch 4: this engine's canonical store; empty dir -> error
    _clear_pg(monkeypatch)
    with pytest.raises(ValueError):
        detect_store_type(str(tmp_path))
    (tmp_path / "index.parquet").write_text("")
    assert detect_store_type(str(tmp_path)) == "parquet"
