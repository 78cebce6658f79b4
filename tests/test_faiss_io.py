"""Pure-Python FAISS flat-index format (sinks/faiss_io.py): golden byte
layout pinned against the public serialization (faiss
impl/index_write.cpp), round trip, and parity with real faiss where
installed."""

import struct

import numpy as np
import pytest

from rag_content_spark.sinks.faiss_io import (
    PyFlatIndex,
    deserialize_flat,
    read_flat_index,
    serialize_flat,
    write_flat_index,
)


def test_golden_byte_layout_ip():
    # 2 vectors, d=3 — every byte accounted for
    data = serialize_flat([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], metric="ip")
    assert data[:4] == b"IxFI"
    d, ntotal, d1, d2, trained, mt = struct.unpack_from("<iqqqBi", data, 4)
    assert (d, ntotal) == (3, 2)
    assert d1 == d2 == (1 << 20)  # deprecated header fields
    assert trained == 1 and mt == 0  # METRIC_INNER_PRODUCT
    off = 4 + struct.calcsize("<iqqqBi")
    (nfloats,) = struct.unpack_from("<Q", data, off)
    assert nfloats == 6  # float count, not byte count (READXBVECTOR)
    floats = struct.unpack_from("<6f", data, off + 8)
    assert list(floats) == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    assert len(data) == off + 8 + 6 * 4  # nothing trailing


def test_golden_byte_layout_l2():
    data = serialize_flat([[0.5, -0.5]], metric="l2")
    assert data[:4] == b"IxF2"
    *_unused, mt = struct.unpack_from("<iqqqBi", data, 4)
    assert mt == 1  # METRIC_L2


def test_round_trip_file(tmp_path):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(17, 8)).astype("float32")
    path = str(tmp_path / "x.faiss")
    write_flat_index(mat, path, metric="ip")
    metric, back = read_flat_index(path)
    assert metric == "ip"
    np.testing.assert_array_equal(back, mat)


def test_deserialize_rejects_corruption():
    good = serialize_flat([[1.0, 2.0]], metric="ip")
    with pytest.raises(ValueError, match="fourcc"):
        deserialize_flat(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="corrupt"):
        # header claims 1x2 but chop a float off the payload count
        bad = bytearray(good)
        off = 4 + struct.calcsize("<iqqqBi")
        bad[off:off + 8] = struct.pack("<Q", 3)
        deserialize_flat(bytes(bad))


def test_pyflatindex_batched_add_matches_single_shot():
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(10, 4)).astype("float32")
    idx = PyFlatIndex(4, "ip")
    idx.add(mat[:4])
    idx.add(mat[4:9])
    idx.add(mat[9:])
    assert idx.ntotal == 10
    assert idx.serialize() == serialize_flat(mat, "ip")
    with pytest.raises(ValueError):
        idx.add(np.zeros((2, 5), dtype="float32"))


def test_empty_index_serializes():
    data = serialize_flat(np.zeros((0, 4), dtype="float32"), metric="ip")
    metric, mat = deserialize_flat(data)
    assert metric == "ip" and mat.shape == (0, 4)


def test_parity_with_real_faiss():
    faiss = pytest.importorskip("faiss")
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(5, 6)).astype("float32")
    index = faiss.IndexFlatIP(6)
    index.add(mat)
    theirs = bytes(faiss.serialize_index(index))
    assert serialize_flat(mat, "ip") == theirs


def test_import_flat_index_roundtrip(spark, tmp_path):
    """The switch-over path: export_faiss artifact -> import_flat_index
    -> same (id, vector) rows, top-1 retrieval agrees."""
    from pyspark.sql import functions as F

    from rag_content_spark.sinks.exports import export_faiss
    from rag_content_spark.sinks.faiss_io import import_flat_index
    from rag_content_spark.operators.similarity import top_k

    rows = [
        ("a", [1.0, 0.0, 0.0]),
        ("b", [0.0, 1.0, 0.0]),
        ("c", [0.6, 0.8, 0.0]),
    ]
    df = spark.createDataFrame(rows, "chunk_id string, embedding array<float>")
    path = str(tmp_path / "ref.faiss")
    export_faiss(df, path)
    back = import_flat_index(spark, path)
    got = {
        r["chunk_id"]: [round(x, 6) for x in r["embedding"]]
        for r in back.collect()
    }
    assert got == {cid: vec for cid, vec in rows}
    hit = top_k(back, [0.0, 0.9, 0.1], k=1, metric="ip", id_col="chunk_id")
    assert hit.collect()[0]["chunk_id"] == "b"


def test_import_flat_index_without_sidecar(spark, tmp_path):
    import numpy as np

    from rag_content_spark.sinks.faiss_io import (
        import_flat_index,
        write_flat_index,
    )

    mat = np.arange(8, dtype="float32").reshape(4, 2)
    path = str(tmp_path / "bare.faiss")
    write_flat_index(mat, path)
    got = sorted(
        (r["chunk_id"], list(r["embedding"]))
        for r in import_flat_index(spark, path).collect()
    )
    assert got[0] == ("0", [0.0, 1.0]) and got[3] == ("3", [6.0, 7.0])
