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


def _fake_base_archive(tmp_path):
    """A minimal but well-formed docker-archive base image."""
    from rag_content_spark.sinks.image_archive import _sha256

    base_layer_buf = io.BytesIO()
    with tarfile.open(fileobj=base_layer_buf, mode="w") as t:
        info = tarfile.TarInfo("etc/os-release")
        data = b"ID=fakebase\n"
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    base_layer = base_layer_buf.getvalue()
    base_diff = _sha256(base_layer)

    config = {
        "architecture": "amd64",
        "os": "linux",
        "created": "2020-01-01T00:00:00Z",
        "container": "deadbeef",
        "config": {"Env": ["PATH=/usr/bin"], "User": "0"},
        "rootfs": {"type": "layers", "diff_ids": [f"sha256:{base_diff}"]},
        "history": [{"created": "2020-01-01T00:00:00Z", "created_by": "base"}],
    }
    config_bytes = json.dumps(config).encode()
    config_name = f"{_sha256(config_bytes)}.json"
    layer_name = f"{base_diff}/layer.tar"
    manifest = [
        {
            "Config": config_name,
            "RepoTags": ["fakebase:1"],
            "Layers": [layer_name],
        }
    ]

    base_tar = tmp_path / "base.tar"
    with tarfile.open(base_tar, "w") as t:
        for name, data in (
            (layer_name, base_layer),
            (config_name, config_bytes),
            ("manifest.json", json.dumps(manifest).encode()),
        ):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    return str(base_tar), base_layer, layer_name


def test_splice_onto_base_two_layer_invariants(tmp_path):
    """Reference image_builder.py:217-284 splice semantics: base layers
    byte-identical, new layer appended, config diff_ids/history extended,
    User dropped to 65532, container key removed."""
    from rag_content_spark.sinks.image_archive import (
        read_docker_archive,
        splice_onto_base,
    )

    base_tar, base_layer, base_layer_name = _fake_base_archive(tmp_path)
    artifacts = tmp_path / "artifacts"
    artifacts.mkdir()
    (artifacts / "index.faiss").write_bytes(b"vectors")

    out_tar = str(tmp_path / "out.tar")
    entry = splice_onto_base(base_tar, str(artifacts), out_tar, "my-rag:v1")

    # manifest: base layer first, new layer appended
    assert entry["RepoTags"] == ["my-rag:v1"]
    assert entry["Layers"][0] == base_layer_name
    assert len(entry["Layers"]) == 2

    layers, config = read_docker_archive(out_tar)
    assert layers == entry["Layers"]
    assert len(config["rootfs"]["diff_ids"]) == 2
    assert config["config"]["User"] == "65532:65532"
    assert "container" not in config
    assert config["history"][-1]["created_by"] == (
        "rag-content-spark image splice"
    )
    # diff_id of the appended layer matches the layer bytes in the archive
    with tarfile.open(out_tar) as t:
        base_bytes = t.extractfile(base_layer_name).read()
        assert base_bytes == base_layer  # streamed through unchanged
        new_layer_bytes = t.extractfile(entry["Layers"][1]).read()
    assert (
        "sha256:" + hashlib.sha256(new_layer_bytes).hexdigest()
        == config["rootfs"]["diff_ids"][1]
    )
    # the data layer holds the artifact at the image path
    with tarfile.open(fileobj=io.BytesIO(new_layer_bytes)) as t:
        assert t.extractfile("rag/vector_db/index.faiss").read() == b"vectors"


def test_splice_deterministic(tmp_path):
    from rag_content_spark.sinks.image_archive import splice_onto_base

    base_tar, _, _ = _fake_base_archive(tmp_path)
    artifacts = tmp_path / "a"
    artifacts.mkdir()
    (artifacts / "x").write_bytes(b"1")
    out1, out2 = str(tmp_path / "o1.tar"), str(tmp_path / "o2.tar")
    splice_onto_base(base_tar, str(artifacts), out1)
    splice_onto_base(base_tar, str(artifacts), out2)
    assert open(out1, "rb").read() == open(out2, "rb").read()


def test_fetch_base_archive_injectable(tmp_path):
    from rag_content_spark.sinks.image_archive import fetch_base_archive

    calls = []

    def fake_runner(image, dest):
        calls.append((image, dest))
        open(dest, "wb").write(b"tar")

    dest = str(tmp_path / "b.tar")
    assert fetch_base_archive("registry.example/x:1", dest, runner=fake_runner) == dest
    assert calls == [("registry.example/x:1", dest)]
