"""Megatron indexed-dataset sink (sinks/megatron.py): idx layout,
round-trip, determinism, shard manifest."""

import hashlib
import struct


def test_indexed_pair_roundtrip(tmp_path):
    from rag_content_spark.sinks.megatron import (
        read_indexed_pair,
        write_indexed_pair,
    )

    seqs = [[1, 2, 3], [7], [], [100000, 5, 9, 11]]
    prefix = str(tmp_path / "train")
    n_tokens, n_bytes = write_indexed_pair(prefix, seqs)
    assert n_tokens == 8 and n_bytes == 8 * 4
    back = read_indexed_pair(prefix)
    assert [list(a) for a in back] == seqs


def test_idx_header_layout(tmp_path):
    from rag_content_spark.sinks.megatron import write_indexed_pair

    prefix = str(tmp_path / "t")
    write_indexed_pair(prefix, [[1, 2], [3]], dtype="int32")
    raw = open(prefix + ".idx", "rb").read()
    assert raw[:9] == b"MMIDIDX\x00\x00"
    assert struct.unpack("<Q", raw[9:17])[0] == 1       # version
    assert raw[17] == 4                                  # int32 code
    assert struct.unpack("<Q", raw[18:26])[0] == 2       # n_seqs
    assert struct.unpack("<Q", raw[26:34])[0] == 3       # n_docs = n_seqs+1
    sizes = struct.unpack("<2i", raw[34:42])
    assert sizes == (2, 1)
    pointers = struct.unpack("<2q", raw[42:58])
    assert pointers == (0, 8)


def test_uint16_dtype(tmp_path):
    from rag_content_spark.sinks.megatron import (
        read_indexed_pair,
        write_indexed_pair,
    )

    prefix = str(tmp_path / "u16")
    n_tokens, n_bytes = write_indexed_pair(prefix, [[1, 65535]], dtype="uint16")
    assert n_bytes == 4
    assert [list(a) for a in read_indexed_pair(prefix)] == [[1, 65535]]


def test_write_megatron_shards_spark(spark, tmp_path):
    from rag_content_spark.sinks.megatron import (
        read_indexed_pair,
        write_megatron_shards,
    )

    rows = [(i, [i, i + 1, i + 2]) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    out = str(tmp_path / "mgt")
    manifest = write_megatron_shards(df, out, n_shards=4).collect()
    assert sum(m["n_seqs"] for m in manifest) == 40
    assert sum(m["n_tokens"] for m in manifest) == 120
    # every sequence recoverable across all shard pairs
    got = []
    for m in manifest:
        got += [list(a) for a in read_indexed_pair(f"{out}/shard-{m['shard']:05d}")]
    assert sorted(got) == sorted([t for _, t in rows])


def test_shard_bytes_deterministic(spark, tmp_path):
    from rag_content_spark.sinks.megatron import write_megatron_shards

    rows = [(i, [i % 7, i % 5]) for i in range(30)]

    def _digests(out):
        df = spark.createDataFrame(rows, ["doc_id", "tokens"]).repartition(6)
        ms = write_megatron_shards(df, out, n_shards=3).collect()
        return {
            m["shard"]: (
                hashlib.md5(open(f"{out}/shard-{m['shard']:05d}.bin", "rb").read()).hexdigest(),
                hashlib.md5(open(f"{out}/shard-{m['shard']:05d}.idx", "rb").read()).hexdigest(),
            )
            for m in ms
        }

    assert _digests(str(tmp_path / "a")) == _digests(str(tmp_path / "b"))


def test_uint16_overflow_raises_before_writing(tmp_path):
    # np.asarray(..., 'uint16') would silently wrap 65536 -> 0; the sink
    # must refuse loudly and leave NO partial .bin behind
    import pytest

    from rag_content_spark.sinks.megatron import write_indexed_pair

    prefix = str(tmp_path / "bad")
    with pytest.raises(ValueError, match="out of range"):
        write_indexed_pair(prefix, [[1, 2], [65536]], dtype="uint16")
    assert not (tmp_path / "bad.bin").exists()
    assert not (tmp_path / "bad.idx").exists()
    with pytest.raises(ValueError, match="out of range"):
        write_indexed_pair(prefix, [[-1]], dtype="uint16")
