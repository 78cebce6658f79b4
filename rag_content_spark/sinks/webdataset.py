"""WebDataset-style tar-shard sink for multimodal training data.

The de-facto exchange format for large-scale multimodal training
(Aizman et al., "High Performance I/O For Large Scale Deep Learning";
the public webdataset library): samples are tar members named
``{key}.{ext}``, grouped into fixed-count shards ``shard-NNNNN.tar``
that loaders stream sequentially. The reference has no multimodal
export; this is the 100 TB-pipeline extension next to the docker
image archive writer (sinks/image_archive.py), built the same way —
stdlib ``tarfile``, fully deterministic bytes (sorted members, zeroed
mtime/uid/gid) so shards are reproducible and diffable across runs.

Scale shape: shard assignment is a deterministic hash (or an explicit
column), rows shuffle ONCE on shard id, and each shard is written by
whichever executor holds its partition via ``mapInPandas`` — the
driver never sees sample bytes. Shard count follows the same sizing
rule as sequence packing: ~shard_size_bytes of payload per tar (the
loader's sequential-read unit), #shards >= cluster parallelism.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, functions as F

from rag_content_spark.functions.hashing import stable_hash64


def _write_shard(path: str, members: list[tuple[str, bytes]]) -> int:
    """One deterministic tar: members sorted by name, zeroed metadata.
    Returns bytes written."""
    with tarfile.open(path, "w") as tar:
        for name, payload in sorted(members):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tar.addfile(info, io.BytesIO(payload))
    return os.path.getsize(path)


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    payload_cols: dict[str, str],
    n_shards: int = 8,
    shard_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards; returns the manifest
    DataFrame (shard, n_samples, bytes) the caller can persist next to
    the shards.

    ``payload_cols`` maps member extension -> column. String columns
    are utf-8 encoded; binary columns pass through — so a sample row
    (key=000017, {"txt": "caption", "img": b"..."}) becomes members
    ``000017.txt`` + ``000017.img`` in its shard, the pairing contract
    webdataset loaders reassemble samples from.

    Assignment is ``stable_hash64(key) % n_shards`` unless ``shard_col``
    names an explicit one. The single wide shuffle is
    ``repartition(n_shards, shard)``; a partition can carry several
    shard ids (hash collisions across partitions are fine — each shard
    id lands in exactly one partition), and the writer groups locally.
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = [F.col(key_col).cast("string").alias("_key")]
    if shard_col is None:
        cols.append(
            (stable_hash64(F.col(key_col).cast("string"), salt="wds") % n_shards)
            .cast("int")
            .alias("_shard")
        )
    else:
        cols.append(F.col(shard_col).cast("int").alias("_shard"))
    exts = sorted(payload_cols)
    for ext in exts:
        cols.append(F.col(payload_cols[ext]).alias(f"_p_{ext}"))
    flat = df.select(*cols).repartition(n_shards, "_shard")

    import pandas as pd

    def _write(batches):
        rows: dict[int, list[tuple[str, bytes]]] = {}
        for pdf in batches:
            for i in range(len(pdf)):
                members = rows.setdefault(int(pdf["_shard"].iloc[i]), [])
                key = pdf["_key"].iloc[i]
                for ext in exts:
                    payload = pdf[f"_p_{ext}"].iloc[i]
                    if payload is None:
                        continue
                    if isinstance(payload, str):
                        payload = payload.encode("utf-8")
                    members.append((f"{key}.{ext}", bytes(payload)))
        out = []
        for shard, members in rows.items():
            path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
            n_bytes = _write_shard(path, members)
            out.append((shard, len(members) // max(len(exts), 1), n_bytes))
        yield pd.DataFrame(out, columns=["shard", "n_samples", "bytes"])

    return flat.mapInPandas(
        _write, schema="shard int, n_samples long, bytes long"
    )
