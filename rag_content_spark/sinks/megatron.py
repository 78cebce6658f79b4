"""Megatron-style indexed-dataset sink (.bin/.idx pairs) — the
trains-ready artifact GPT-style pretraining loaders memory-map.

Format per the public Megatron-LM ``indexed_dataset.py`` (MMapIndexed
layout): ``.bin`` is the raw little-endian token stream; ``.idx`` is

    magic  b"MMIDIDX\\x00\\x00"
    version  uint64 = 1
    dtype    uint8 code (4 = int32, 8 = uint16)
    n_seqs   uint64
    n_docs   uint64  (= len(doc_idx))
    sizes    int32[n_seqs]   per-sequence token counts
    pointers int64[n_seqs]   byte offsets into .bin
    doc_idx  int64[n_docs]   sequence index at each document boundary
                             ([0..n_seqs] here: one sequence per doc)

Scale shape (same as sinks/webdataset.py): deterministic hash shard
assignment, ONE repartition on shard id, each (bin, idx) pair written
executor-side by whichever worker holds the shard — the driver never
sees token bytes. Megatron's blended-dataset loader consumes multiple
prefixes natively, so shard-pairs ARE the scale unit. Bytes are fully
deterministic (rows sorted by id within shard).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, functions as F

from rag_content_spark.functions.hashing import stable_hash64

_MAGIC = b"MMIDIDX\x00\x00"
_DTYPE_CODES = {"int32": 4, "uint16": 8}


def write_indexed_pair(
    prefix: str, sequences: list, dtype: str = "int32"
) -> tuple[int, int]:
    """Write one ``{prefix}.bin`` + ``{prefix}.idx`` pair from a list of
    int sequences. Returns (total_tokens, bin_bytes)."""
    import numpy as np

    np_dtype = np.dtype(dtype).newbyteorder("<")
    sizes = np.array([len(s) for s in sequences], dtype="<i4")
    pointers = np.zeros(len(sequences), dtype="<i8")
    itemsize = np.dtype(dtype).itemsize
    acc = 0
    for i, n in enumerate(sizes):
        pointers[i] = acc
        acc += int(n) * itemsize
    doc_idx = np.arange(len(sequences) + 1, dtype="<i8")

    # guard: np.asarray(..., dtype='uint16') silently wraps token ids
    # >= 65536 (or negatives), corrupting the shard with no error —
    # validate each sequence as it is written, streaming into a temp
    # file renamed on success, so a failure never leaves a (truncated
    # or partially-valid) .bin behind AND peak memory stays one
    # sequence, not the whole shard (round-5 ADVICE: an up-front
    # arrays = [...] list doubled resident memory).
    info = np.iinfo(np_dtype) if np.issubdtype(np_dtype, np.integer) else None
    tmp_bin = prefix + ".bin.tmp"
    try:
        with open(tmp_bin, "wb") as fb:
            for s in sequences:
                arr = np.asarray(s)
                if info is not None and len(arr) and (
                    arr.min() < info.min or arr.max() > info.max
                ):
                    raise ValueError(
                        f"token id out of range for dtype {dtype}: "
                        f"[{int(arr.min())}, {int(arr.max())}] outside "
                        f"[{info.min}, {info.max}]"
                    )
                fb.write(arr.astype(np_dtype).tobytes())
        os.replace(tmp_bin, prefix + ".bin")
    except BaseException:
        if os.path.exists(tmp_bin):
            os.remove(tmp_bin)
        raise
    with open(prefix + ".idx", "wb") as fi:
        fi.write(_MAGIC)
        fi.write(struct.pack("<Q", 1))
        fi.write(struct.pack("<B", _DTYPE_CODES[dtype]))
        fi.write(struct.pack("<Q", len(sequences)))
        fi.write(struct.pack("<Q", len(doc_idx)))
        fi.write(sizes.tobytes())
        fi.write(pointers.tobytes())
        fi.write(doc_idx.tobytes())
    return int(sizes.sum()), acc


def read_indexed_pair(prefix: str) -> list:
    """Round-trip reader (the loader's mmap view, materialized):
    returns the list of numpy token arrays."""
    import numpy as np

    with open(prefix + ".idx", "rb") as fi:
        assert fi.read(9) == _MAGIC, "bad magic"
        (version,) = struct.unpack("<Q", fi.read(8))
        assert version == 1
        (code,) = struct.unpack("<B", fi.read(1))
        dtype = {v: k for k, v in _DTYPE_CODES.items()}[code]
        (n_seqs,) = struct.unpack("<Q", fi.read(8))
        (n_docs,) = struct.unpack("<Q", fi.read(8))
        sizes = np.frombuffer(fi.read(4 * n_seqs), dtype="<i4")
        pointers = np.frombuffer(fi.read(8 * n_seqs), dtype="<i8")
        fi.read(8 * n_docs)  # doc_idx
    data = np.fromfile(prefix + ".bin", dtype=np.dtype(dtype).newbyteorder("<"))
    itemsize = np.dtype(dtype).itemsize
    return [
        data[p // itemsize : p // itemsize + n] for p, n in zip(pointers, sizes)
    ]


def write_megatron_shards(
    df: DataFrame,
    out_dir: str,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_shards: int = 8,
    dtype: str = "int32",
    shard_col: str | None = None,
) -> DataFrame:
    """Write (id, token-array) rows as Megatron .bin/.idx shard pairs;
    returns the manifest DataFrame (shard, n_seqs, n_tokens, bin_bytes).

    Assignment is ``stable_hash64(id) % n_shards`` unless ``shard_col``
    names an explicit one. One repartition, executor-side writes, rows
    sorted by id within each shard for byte determinism.
    """
    if dtype not in _DTYPE_CODES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPE_CODES)}")
    os.makedirs(out_dir, exist_ok=True)
    cols = [
        F.col(id_col).cast("string").alias("_id"),
        F.col(tokens_col).alias("_toks"),
    ]
    if shard_col is None:
        cols.append(
            (stable_hash64(F.col(id_col).cast("string"), salt="mgt") % n_shards)
            .cast("int")
            .alias("_shard")
        )
    else:
        cols.append(F.col(shard_col).cast("int").alias("_shard"))
    flat = df.select(*cols).repartition(n_shards, "_shard")

    import pandas as pd

    def _write(batches):
        per_shard: dict[int, list] = {}
        for pdf in batches:
            for i in range(len(pdf)):
                per_shard.setdefault(int(pdf["_shard"].iloc[i]), []).append(
                    (pdf["_id"].iloc[i], list(pdf["_toks"].iloc[i]))
                )
        out = []
        for shard, rows in per_shard.items():
            rows.sort(key=lambda r: r[0])
            prefix = os.path.join(out_dir, f"shard-{shard:05d}")
            n_tokens, n_bytes = write_indexed_pair(
                prefix, [toks for _, toks in rows], dtype
            )
            out.append((shard, len(rows), n_tokens, n_bytes))
        yield pd.DataFrame(
            out, columns=["shard", "n_seqs", "n_tokens", "bin_bytes"]
        )

    return flat.mapInPandas(
        _write, schema="shard int, n_seqs long, n_tokens long, bin_bytes long"
    )
