"""S9 download_model layout tests (offline, fake snapshot)."""

import os

import pytest

from rag_content_spark.embedding.model_setup import download_model


def _fake_snapshot(repo_id: str, local_dir: str):
    """Write the file layout an all-mpnet-base-v2 snapshot ships with."""
    os.makedirs(os.path.join(local_dir, "onnx"))
    os.makedirs(os.path.join(local_dir, "openvino"))
    for name in (
        "config.json",
        "model.safetensors",
        "pytorch_model.bin",
        "onnx/model.onnx",
        "openvino/openvino_model.xml",
    ):
        with open(os.path.join(local_dir, name), "w") as f:
            f.write(repo_id)


def test_download_model_layout(tmp_path):
    target = str(tmp_path / "model")
    os.makedirs(target)
    out = download_model(
        "sentence-transformers/all-mpnet-base-v2",
        target,
        snapshot_fn=_fake_snapshot,
    )
    assert out == target
    # reference layout steps (download_embeddings_model.py:24-43)
    assert os.path.isdir(os.path.join(target, "2_Normalize"))
    assert open(os.path.join(target, "version.txt")).read() == "1"
    assert not os.path.exists(os.path.join(target, "pytorch_model.bin"))
    assert not os.path.exists(os.path.join(target, "onnx"))
    assert not os.path.exists(os.path.join(target, "openvino"))
    # the safetensors weights survive
    assert os.path.exists(os.path.join(target, "model.safetensors"))


def test_download_model_requires_hub_or_injection(tmp_path):
    try:
        import huggingface_hub  # noqa: F401

        pytest.skip("huggingface_hub installed; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        download_model("any/repo", str(tmp_path))
