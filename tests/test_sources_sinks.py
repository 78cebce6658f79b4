import json
import os

from pyspark.sql import functions as F

from rag_content_spark.sinks.exports import (
    build_metadata_json,
    pgvector_insert_sql,
    render_lightspeed_stack_yaml,
    render_llama_stack_yaml,
    write_metadata_json,
)
from rag_content_spark.sources.directory import read_text_documents
from rag_content_spark.sources.okp import filter_okp_documents, parse_okp_metadata


def test_read_text_documents_recursive(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.md").write_text("# Title A\n\nbody a")
    (tmp_path / "sub" / "b.md").write_text("# Title B\n\nbody b")
    (tmp_path / "sub" / "c.txt").write_text("plain text c")
    df = read_text_documents(spark, str(tmp_path))
    rows = {r["file_name"]: r for r in df.collect()}
    assert set(rows) == {"a.md", "b.md", "c.txt"}
    assert rows["b.md"]["doc_type"] == "markdown"
    assert rows["c.txt"]["doc_type"] == "text"
    assert rows["a.md"]["text"].startswith("# Title A")
    assert rows["a.md"]["doc_id"]  # stable id present


def test_read_text_documents_glob(spark, tmp_path):
    (tmp_path / "a.md").write_text("x y")
    (tmp_path / "b.txt").write_text("x y")
    df = read_text_documents(spark, str(tmp_path), glob="*.md")
    assert [r["file_name"] for r in df.collect()] == ["a.md"]


OKP_DOC = (
    '+++\ntitle = "Install Guide"\n'
    'reference_url = "https://portal.example.com/install"\n'
    'portal_product_names = ["Red Hat OpenStack Platform", "Other"]\n+++\n'
    "body text here"
)
OKP_NO_URL = '+++\ntitle = "No URL"\nportal_product_names = ["Red Hat OpenStack Platform"]\n+++\nbody'
OKP_OTHER = '+++\ntitle = "Other"\nreference_url = "https://x"\nportal_product_names = ["Unrelated"]\n+++\nbody'


def test_okp_parse_and_filter(spark):
    df = spark.createDataFrame(
        [(1, OKP_DOC), (2, OKP_NO_URL), (3, OKP_OTHER)], ["doc_id", "text"]
    )
    parsed = parse_okp_metadata(df).collect()
    by_id = {r["doc_id"]: r for r in parsed}
    assert by_id[1]["okp_title"] == "Install Guide"
    assert by_id[1]["portal_product_names"] == [
        "Red Hat OpenStack Platform",
        "Other",
    ]
    assert by_id[2]["okp_url"] is None
    kept = filter_okp_documents(df, ["openstack"]).collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_metadata_json_exact_keys(tmp_path):
    meta = build_metadata_json(
        execution_time_s=12,
        embedding_model="sentence-transformers/all-mpnet-base-v2",
        index_id="idx",
        vector_db="faiss.IndexFlatIP",
        embedding_dimension=768,
        chunk=380,
        overlap=0,
        total_embedded_files=3,
    )
    # the reference's exact key set (document_processor.py:281-300)
    assert list(meta) == [
        "execution-time",
        "llm",
        "embedding-model",
        "index-id",
        "vector-db",
        "embedding-dimension",
        "chunk",
        "overlap",
        "total-embedded-files",
    ]
    assert meta["llm"] == "None"
    path = str(tmp_path / "metadata.json")
    write_metadata_json(path, meta)
    assert json.load(open(path)) == meta


def test_pgvector_sql_builder():
    sql, params = pgvector_insert_sql(
        "chunks", {"chunk_id": "c1", "text": "t", "embedding": [0.25, -1.0]}
    )
    assert sql == (
        "INSERT INTO chunks (chunk_id, text, embedding) VALUES (%s, %s, %s::vector)"
    )
    assert params == ["c1", "t", "[0.25,-1.0]"]


def test_yaml_templates_render():
    ls = render_llama_stack_yaml("/db/faiss.db", "model-x", 768, "vs_123")
    assert "db_path: /db/faiss.db" in ls and "vector_store_id: vs_123" in ls
    lcs = render_lightspeed_stack_yaml("/cfg/llama-stack.yaml")
    assert "library_client_config_path: /cfg/llama-stack.yaml" in lcs


def test_parquet_index_roundtrip(spark, tmp_path):
    from rag_content_spark.sinks.parquet_sink import read_index, write_index

    df = spark.createDataFrame(
        [("c1", "hello", [0.1, 0.2]), ("c2", "world", [0.3, 0.4])],
        ["chunk_id", "text", "embedding"],
    )
    path = str(tmp_path / "index")
    write_index(df, path)
    back = read_index(spark, path)
    assert back.count() == 2
    assert {r["chunk_id"] for r in back.collect()} == {"c1", "c2"}


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    from rag_content_spark.sinks.parquet_sink import write_bucketed_index

    # NB: spark.sql.warehouse.dir is a static conf — bucketed tables land
    # in the default ./spark-warehouse (gitignored); drop them after.
    df = spark.range(0, 1000).selectExpr(
        "CAST(id AS STRING) AS chunk_id", "id AS payload"
    )
    try:
        write_bucketed_index(df, "bucketed_a", n_buckets=4)
        write_bucketed_index(df, "bucketed_b", n_buckets=4)
        joined = spark.table("bucketed_a").join(
            spark.table("bucketed_b"), "chunk_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no shuffle exchange in the plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")


def test_compact_index_reduces_files(spark, tmp_path):
    import glob

    from rag_content_spark.sinks.parquet_sink import compact_index

    path = str(tmp_path / "fragmented")
    spark.range(0, 10000).selectExpr(
        "CAST(id AS STRING) AS chunk_id", "id AS payload"
    ).repartition(64).write.parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 32
    compact_index(spark, path, target_partition_bytes=1 << 30)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after < before and after <= 2
    back = spark.read.parquet(path)
    assert back.count() == 10000


# ----------------------------- W1 FAISS export -----------------------------


class _FakeIndex:
    """Records adds like faiss.IndexFlatIP: batched float32 matrices."""

    def __init__(self, dim):
        self.d = dim
        self.batches = []

    def add(self, mat):
        assert mat.dtype.name == "float32" and mat.ndim == 2
        assert mat.shape[1] == self.d
        self.batches.append(mat.copy())


def test_export_faiss_order_and_id_mapping(spark, tmp_path):
    from rag_content_spark.sinks.exports import export_faiss

    rows = [(f"c{i:03d}", [float(i), float(i) * 0.5]) for i in range(10)]
    # Scramble input order: export must re-establish id order.
    scrambled = rows[::2][::-1] + rows[1::2]
    df = spark.createDataFrame(
        scrambled, "chunk_id string, embedding array<float>"
    ).repartition(4)

    written = {}
    out = str(tmp_path / "index.faiss")
    res = export_faiss(
        df,
        out,
        index_factory=_FakeIndex,
        index_writer=lambda idx, path: written.setdefault("idx", idx),
        batch_rows=4,
    )
    assert res["count"] == 10 and res["dim"] == 2
    # Vector order == sorted chunk_id order (reference adds nodes in list
    # order; our deterministic equivalent is the id sort).
    assert res["ids"] == [f"c{i:03d}" for i in range(10)]
    import numpy as np

    idx = written["idx"]
    flat = np.vstack(idx.batches)
    assert flat.shape == (10, 2)
    assert [float(v) for v in flat[:, 0]] == [float(i) for i in range(10)]
    # Batching honored: 10 rows at batch_rows=4 -> 4+4+2.
    assert [b.shape[0] for b in idx.batches] == [4, 4, 2]
    # Sidecar mirrors llama-index index_to_id: position i -> chunk id.
    sidecar = json.loads(open(out + ".ids.json").read())
    assert sidecar["0"] == "c000" and sidecar["9"] == "c009"
    assert len(sidecar) == 10


def test_export_faiss_empty_input(spark, tmp_path):
    from rag_content_spark.sinks.exports import export_faiss

    df = spark.createDataFrame([], "chunk_id string, embedding array<float>")
    res = export_faiss(
        df,
        str(tmp_path / "empty.faiss"),
        index_factory=_FakeIndex,
        index_writer=lambda idx, path: None,
    )
    assert res["count"] == 0
    assert not os.path.exists(str(tmp_path / "empty.faiss.ids.json"))


def test_export_faiss_pure_python_fallback(spark, tmp_path):
    """W1 de-gated (round-8): without faiss installed, export_faiss
    falls back to the pure-Python flat-format writer and produces a
    file in the public faiss IndexFlatIP layout (readable by
    faiss.read_index; pinned here with the read twin)."""
    from rag_content_spark.sinks.exports import export_faiss
    from rag_content_spark.sinks.faiss_io import read_flat_index

    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.0, 1.0]),
        ("c", [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "chunk_id string, embedding array<float>")
    path = str(tmp_path / "x.faiss")
    res = export_faiss(df, path)
    assert res["count"] == 3 and res["dim"] == 2
    metric, mat = read_flat_index(path)
    assert metric == "ip" and mat.shape == (3, 2)
    # row order == sorted id order
    assert mat[0].tolist() == [1.0, 0.0] and mat[1].tolist() == [0.0, 1.0]
    sidecar = json.loads(open(path + ".ids.json").read())
    assert sidecar == {"0": "a", "1": "b", "2": "c"}


def test_write_jsonl_shards(spark, tmp_path):
    """Training export: shard-partitioned JSONL, rows in packed order
    within each shard file."""
    import glob
    import json as jsonlib

    from rag_content_spark.operators.packing import pack_sequences
    from rag_content_spark.sinks.parquet_sink import write_jsonl_shards

    rows = [(f"d{i:02d}", "tok " * 30) for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = pack_sequences(docs, budget=90, shards=2).join(
        docs, "doc_id"
    )
    out = str(tmp_path / "jsonl")
    write_jsonl_shards(packed, out)

    shard_dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(shard_dirs) >= 1
    for d in shard_dirs:
        lines = []
        for f in sorted(glob.glob(d + "/part-*")):
            lines += [jsonlib.loads(l) for l in open(f) if l.strip()]
        assert lines, d
        # packed order within the shard
        buckets = [l["seq_bucket"] for l in lines]
        assert buckets == sorted(buckets), d
        assert all("text" in l and "doc_id" in l for l in lines)


def test_webdataset_shards_roundtrip(spark, tmp_path):
    import tarfile

    from rag_content_spark.sinks.webdataset import write_webdataset_shards

    rows = [
        (i, f"caption {i}", bytes([i % 256]) * (10 + i)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["sample_id", "caption", "img"])
    out = str(tmp_path / "wds")
    manifest = write_webdataset_shards(
        df, out, "sample_id", {"txt": "caption", "img": "img"}, n_shards=4
    ).collect()
    assert sum(r["n_samples"] for r in manifest) == 40
    # every sample reassembles: .txt and .img members pair under one key
    seen = {}
    for r in manifest:
        path = f"{out}/shard-{r['shard']:05d}.tar"
        with tarfile.open(path) as tar:
            names = tar.getnames()
            assert names == sorted(names)  # deterministic member order
            for n in names:
                key, ext = n.rsplit(".", 1)
                seen.setdefault(key, set()).add(ext)
                if ext == "txt":
                    assert tar.extractfile(n).read().decode() == f"caption {key}"
    assert len(seen) == 40 and all(v == {"txt", "img"} for v in seen.values())


def test_webdataset_shards_deterministic_bytes(spark, tmp_path):
    from rag_content_spark.sinks.webdataset import write_webdataset_shards

    rows = [(i, f"text {i}") for i in range(20)]
    df = spark.createDataFrame(rows, ["sample_id", "caption"])
    digests = []
    for run in ("a", "b"):
        out = str(tmp_path / run)
        write_webdataset_shards(
            df, out, "sample_id", {"txt": "caption"}, n_shards=2
        ).collect()
        import hashlib, os

        digests.append(
            {
                f: hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
                for f in sorted(os.listdir(out))
            }
        )
    assert digests[0] == digests[1]


def test_fast_reader_parity_with_wholetext(spark, tmp_path):
    """The manifest reader's rows are IDENTICAL to the Hadoop wholetext
    reader's (paths, doc_ids, doc_type routing, content) — it is a
    drop-in small-files fast path, not a different source."""
    from rag_content_spark.sources.directory import (
        read_text_documents,
        read_text_documents_fast,
    )

    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    (d / "a.md").write_text("# A\n\nalpha doc")
    (d / "b.txt").write_text("plain bravo")
    (d / "sub" / "c.md").write_text("# C\n\nnested charlie")
    slow = {r["file_path"]: r for r in read_text_documents(spark, str(d)).collect()}
    fast = {
        r["file_path"]: r
        for r in read_text_documents_fast(spark, str(d)).collect()
    }
    assert set(slow) == set(fast) and len(slow) == 3
    for p in slow:
        for col in ("file_name", "doc_type", "doc_id", "text"):
            assert slow[p][col] == fast[p][col], (p, col)


def test_fast_reader_glob_and_partitions(spark, tmp_path):
    from rag_content_spark.sources.directory import read_text_documents_fast

    d = tmp_path / "c"
    d.mkdir()
    for i in range(10):
        (d / f"{i}.md").write_text(f"doc {i}")
    (d / "skip.txt").write_text("not matched")
    out = read_text_documents_fast(spark, str(d), glob="*.md", partitions=4)
    assert out.count() == 10
    assert out.rdd.getNumPartitions() == 4


def test_read_jsonl_documents_dolma(spark, tmp_path):
    import gzip
    import json

    from rag_content_spark.sources.jsonl import (
        corrupt_line_stats,
        read_jsonl_documents,
    )

    good = [
        {"id": "d1", "text": "hello world", "source": "cc", "added": "2026-01-01",
         "metadata": json.dumps({"url": "http://a"})},
        {"text": "no id here", "source": "cc"},   # id falls back to md5(text)
    ]
    with open(tmp_path / "a.jsonl", "w") as fh:
        for r in good:
            fh.write(json.dumps(r) + "\n")
        fh.write("{this is not json\n")
    # gz sibling read through the same glob
    with gzip.open(tmp_path / "b.jsonl.gz", "wt") as fh:
        fh.write(json.dumps({"id": "d3", "text": "zipped"}) + "\n")

    docs = read_jsonl_documents(spark, str(tmp_path))
    rows = {r["doc_id"]: r for r in docs.collect() if r["doc_id"] is not None}
    assert rows["d1"]["text"] == "hello world"
    assert rows["d3"]["text"] == "zipped"
    import hashlib

    md5_id = hashlib.md5(b"no id here").hexdigest()
    assert rows[md5_id]["source"] == "cc"
    stats = corrupt_line_stats(docs).collect()[0]
    assert stats["n_rows"] == 4 and stats["n_corrupt"] == 1


def test_export_faiss_real_roundtrip(spark, tmp_path):
    # W1 with the REAL library (reference document_processor.py:266-279
    # persist shape): IndexFlatIP, top-1 for a known query, sidecar map.
    # Skips cleanly where faiss is absent (this container); runs green
    # on any machine with faiss installed.
    import json

    import pytest

    faiss = pytest.importorskip("faiss")
    import numpy as np

    from rag_content_spark.sinks.exports import export_faiss

    rows = [
        (10, [1.0, 0.0, 0.0]),
        (20, [0.0, 1.0, 0.0]),
        (30, [0.7, 0.7, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["chunk_id", "embedding"])
    path = str(tmp_path / "real.faiss")
    res = export_faiss(df, path, metric="ip")
    assert res["count"] == 3 and res["dim"] == 3

    index = faiss.read_index(path)
    assert index.ntotal == 3
    scores, pos = index.search(np.asarray([[0.0, 0.9, 0.1]], dtype="float32"), 1)
    ids = json.load(open(path + ".ids.json"))
    # nearest by inner product is chunk 20 (the [0,1,0] vector)
    assert ids[str(int(pos[0][0]))] == "20"
    assert scores[0][0] == pytest.approx(0.9, abs=1e-6)


def test_hf_parquet_dataset_layout(spark, tmp_path):
    import json
    import pyarrow.parquet as pq

    from rag_content_spark.sinks.hf_dataset import write_hf_parquet_dataset

    df = spark.createDataFrame(
        [(i, f"doc {i}", [0.1 * i, 0.2]) for i in range(50)],
        "doc_id long, text string, embedding array<double>",
    )
    man = {
        r["shard"]: r
        for r in write_hf_parquet_dataset(
            df, str(tmp_path), split="train", key_col="doc_id", n_shards=4
        ).collect()
    }
    files = sorted(os.listdir(tmp_path / "data"))
    assert files == [f"train-{s:05d}-of-00004.parquet" for s in sorted(man)]
    # every row lands exactly once; shard files are valid parquet
    total = sum(pq.read_table(tmp_path / "data" / f).num_rows for f in files)
    assert total == 50 == sum(r["n_rows"] for r in man.values())
    back = pq.read_table(tmp_path / "data" / files[0])
    assert back.column_names == ["doc_id", "text", "embedding"]
    info = json.loads((tmp_path / "dataset_info.json").read_text())
    assert info["features"]["text"] == {"dtype": "string", "_type": "Value"}
    assert info["features"]["embedding"]["_type"] == "Sequence"
    assert info["splits"]["train"]["num_examples"] == 50
    # second split merges into the same dataset_info
    val = spark.createDataFrame(
        [(99, "v", [1.0])], "doc_id long, text string, embedding array<double>"
    )
    write_hf_parquet_dataset(
        val, str(tmp_path), split="validation", key_col="doc_id", n_shards=1
    ).collect()
    info = json.loads((tmp_path / "dataset_info.json").read_text())
    assert set(info["splits"]) == {"train", "validation"}
    # determinism: rewriting the train split produces identical bytes
    h1 = [(f, (tmp_path / "data" / f).read_bytes()) for f in files]
    write_hf_parquet_dataset(
        df, str(tmp_path), split="train", key_col="doc_id", n_shards=4
    ).collect()
    for f, b in h1:
        assert (tmp_path / "data" / f).read_bytes() == b


def test_hf_parquet_dataset_backfills_empty_shards(spark, tmp_path):
    """Hash sharding with n_shards >> rows leaves shards empty; the sink
    must still write all -of-NNNNN files (loaders enumerate by count)."""
    import json
    import pyarrow.parquet as pq

    from rag_content_spark.sinks.hf_dataset import write_hf_parquet_dataset

    df = spark.createDataFrame(
        [(1, "only row")], "doc_id long, text string"
    )
    man = {
        r["shard"]: r["n_rows"]
        for r in write_hf_parquet_dataset(
            df, str(tmp_path), split="train", key_col="doc_id", n_shards=4
        ).collect()
    }
    files = sorted(os.listdir(tmp_path / "data"))
    assert files == [f"train-{s:05d}-of-00004.parquet" for s in range(4)]
    assert set(man) == {0, 1, 2, 3} and sum(man.values()) == 1
    # empty shards are valid parquet with the exact schema
    empty = [f for f in files if man[int(f.split("-")[1])] == 0]
    assert len(empty) == 3
    t = pq.read_table(tmp_path / "data" / empty[0])
    assert t.num_rows == 0 and t.column_names == ["doc_id", "text"]
    info = json.loads((tmp_path / "dataset_info.json").read_text())
    assert info["splits"]["train"]["shards"] == 4
