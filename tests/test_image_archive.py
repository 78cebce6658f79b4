import gzip
import hashlib
import io
import json
import tarfile

from rag_content_spark.sinks.image_archive import build_image_archive, build_layer


def _mk_artifacts(tmp_path):
    d = tmp_path / "artifacts"
    d.mkdir()
    (d / "index.db").write_bytes(b"fake faiss bytes")
    (d / "metadata.json").write_text('{"chunk": 380}')
    return str(d)


def test_layer_deterministic_and_diffid(tmp_path):
    d = _mk_artifacts(tmp_path)
    layer1, diff1 = build_layer(d)
    layer2, diff2 = build_layer(d)
    assert layer1 == layer2 and diff1 == diff2
    assert diff1 == hashlib.sha256(layer1).hexdigest()
    names = tarfile.open(fileobj=io.BytesIO(layer1)).getnames()
    assert names == ["rag/vector_db/index.db", "rag/vector_db/metadata.json"]


def test_image_archive_structure(tmp_path):
    d = _mk_artifacts(tmp_path)
    out = str(tmp_path / "image.tar")
    manifest = build_image_archive(d, out, repo_tag="test/rag:1")
    with tarfile.open(out) as tar:
        names = set(tar.getnames())
        assert "manifest.json" in names
        assert manifest["Config"] in names
        assert manifest["Layers"][0] in names
        m = json.load(tar.extractfile("manifest.json"))
        assert m[0]["RepoTags"] == ["test/rag:1"]
        # config diff_id matches the uncompressed layer digest
        cfg = json.load(tar.extractfile(m[0]["Config"]))
        layer_gz = tar.extractfile(m[0]["Layers"][0]).read()
        diff_id = hashlib.sha256(gzip.decompress(layer_gz)).hexdigest()
        assert cfg["rootfs"]["diff_ids"] == [f"sha256:{diff_id}"]
        # gzip'd layer name embeds its own digest
        assert m[0]["Layers"][0].split("/")[0] == hashlib.sha256(layer_gz).hexdigest()
