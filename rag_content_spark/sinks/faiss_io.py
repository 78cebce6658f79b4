"""Pure-Python writer/reader for the FAISS ``IndexFlatIP`` /
``IndexFlatL2`` on-disk format — de-gates W1 (the reference's primary
artifact, document_processor.py:266-279) in containers without the
faiss binary.

The format is public (BSD-licensed faiss, faiss/impl/index_write.cpp
``write_index`` + ``write_index_header``; index_read.cpp
``read_index``); a flat index file is:

    bytes 0-3    fourcc         b"IxFI" (inner product) / b"IxF2" (L2)
    int32        d              vector dimension
    int64        ntotal         vector count
    int64        dummy          1 << 20 (two deprecated fields the
    int64        dummy          reader skips)
    uint8        is_trained     1 (flat indexes are born trained)
    int32        metric_type    0 = METRIC_INNER_PRODUCT, 1 = METRIC_L2
    uint64       nfloats        ntotal * d (READXBVECTOR stores the
                                FLOAT count, not the byte count)
    float32[..]  data           row-major vectors, little-endian

Everything is little-endian with no alignment padding (faiss writes
with raw fwrite on x86). ``faiss.read_index`` loads these bytes
directly, and ``faiss.serialize_index`` of the same vectors produces
byte-identical output (pinned structurally in tests; round-tripped with
real faiss where available).
"""

from __future__ import annotations

import struct

FOURCC_IP = b"IxFI"
FOURCC_L2 = b"IxF2"
METRIC_INNER_PRODUCT = 0
METRIC_L2 = 1
_DUMMY = 1 << 20  # two deprecated header fields faiss still writes


def serialize_flat(vectors, metric: str = "ip") -> bytes:
    """The ``faiss.serialize_index(IndexFlat*(d)); index.add(vectors)``
    byte string, computed without faiss. ``vectors`` is any 2-D
    float-convertible array (numpy array / list of lists)."""
    import numpy as np

    mat = np.ascontiguousarray(np.asarray(vectors, dtype="<f4"))
    if mat.ndim != 2:
        raise ValueError(f"vectors must be 2-D, got shape {mat.shape}")
    ntotal, d = mat.shape
    if metric == "ip":
        fourcc, mt = FOURCC_IP, METRIC_INNER_PRODUCT
    elif metric == "l2":
        fourcc, mt = FOURCC_L2, METRIC_L2
    else:
        raise ValueError(f"metric must be 'ip' or 'l2', got {metric!r}")
    header = fourcc + struct.pack(
        "<iqqqBi", d, ntotal, _DUMMY, _DUMMY, 1, mt
    )
    return header + struct.pack("<Q", ntotal * d) + mat.tobytes()


def write_flat_index(vectors, path: str, metric: str = "ip") -> None:
    """``faiss.write_index`` twin for flat indexes."""
    with open(path, "wb") as fh:
        fh.write(serialize_flat(vectors, metric))


def deserialize_flat(data: bytes):
    """Parse a flat-index byte string back to (metric, matrix) — the
    read twin that pins the round trip and lets this repo CONSUME a
    reference-produced faiss file without faiss installed."""
    import numpy as np

    fourcc = data[:4]
    if fourcc == FOURCC_IP:
        metric = "ip"
    elif fourcc == FOURCC_L2:
        metric = "l2"
    else:
        raise ValueError(f"not a flat faiss index (fourcc {fourcc!r})")
    d, ntotal, _d1, _d2, is_trained, mt = struct.unpack_from(
        "<iqqqBi", data, 4
    )
    off = 4 + struct.calcsize("<iqqqBi")
    (nfloats,) = struct.unpack_from("<Q", data, off)
    off += 8
    if nfloats != ntotal * d:
        raise ValueError(
            f"corrupt flat index: header says {ntotal}x{d}, "
            f"payload has {nfloats} floats"
        )
    expected_metric = METRIC_INNER_PRODUCT if metric == "ip" else METRIC_L2
    if mt != expected_metric or is_trained != 1:
        raise ValueError(
            f"inconsistent header: metric_type={mt}, is_trained={is_trained}"
        )
    mat = np.frombuffer(data, dtype="<f4", count=nfloats, offset=off)
    return metric, mat.reshape(ntotal, d).copy()


def read_flat_index(path: str):
    """(metric, matrix) from a flat faiss index file."""
    with open(path, "rb") as fh:
        return deserialize_flat(fh.read())


def import_flat_index(spark, path: str, id_col: str = "chunk_id"):
    """Load a faiss flat-index file (plus the llama-index-style
    ``<path>.ids.json`` position->id sidecar when present) into a
    DataFrame (id, embedding) — the switch-over path for a user of the
    reference whose existing store is a ``faiss.write_index`` artifact
    (reference document_processor.py:266-279): import once, write
    parquet, and every operator here runs against it. Positions become
    string ids ("0", "1", ...) when no sidecar exists.

    Driver-side by design: a FAISS file is a single binary blob, so it
    must be read in one process — the returned DataFrame is
    repartitioned so downstream work distributes; persist it as parquet
    immediately for anything larger than a one-off import."""
    import json
    import os

    metric, mat = read_flat_index(path)
    sidecar = path + ".ids.json"
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            pos_to_id = json.load(fh)
        ids = [pos_to_id[str(i)] for i in range(mat.shape[0])]
    else:
        ids = [str(i) for i in range(mat.shape[0])]
    rows = [
        (ids[i], [float(x) for x in mat[i]]) for i in range(mat.shape[0])
    ]
    df = spark.createDataFrame(
        rows, f"{id_col} string, embedding array<float>"
    )
    n_parts = max(1, min(200, mat.shape[0] // 10_000 or 1))
    return df.repartition(n_parts)


class PyFlatIndex:
    """Minimal stand-in for ``faiss.IndexFlat*`` with the two members
    export paths use (``add``/``d``/``ntotal``) — the default
    index_factory in exports.export_faiss when faiss is absent."""

    def __init__(self, d: int, metric: str = "ip"):
        self.d = int(d)
        self.metric = metric
        self.ntotal = 0
        self._chunks: list = []

    def add(self, mat) -> None:
        import numpy as np

        m = np.ascontiguousarray(np.asarray(mat, dtype="<f4"))
        if m.ndim != 2 or m.shape[1] != self.d:
            raise ValueError(f"expected (*, {self.d}), got {m.shape}")
        self._chunks.append(m)
        self.ntotal += m.shape[0]

    def matrix(self):
        import numpy as np

        if not self._chunks:
            return np.zeros((0, self.d), dtype="<f4")
        return np.concatenate(self._chunks, axis=0)

    def serialize(self) -> bytes:
        return serialize_flat(self.matrix(), self.metric)

    def write(self, path: str) -> None:
        with open(path, "wb") as fh:
            fh.write(self.serialize())
