"""W7: package index artifacts as a loadable docker-archive tar
(capability parity with the reference's image builder, image_builder.py:
it splices a data layer onto a base image without a daemon or root).

From-scratch minimal implementation (stdlib only): one data layer built
from a directory of artifacts, a config with the layer's diff_id, and a
docker-archive manifest — `docker load` / `podman load` compatible for
single-layer images. Base-image splicing (the reference uses skopeo) is
out of scope here; the data-layer + manifest mechanics are the parity
surface and are fully testable offline.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os
import tarfile


def _sha256(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def build_layer(artifact_dir: str, arcname_prefix: str = "rag/vector_db") -> tuple[bytes, str]:
    """Create an (uncompressed) tar layer from a directory.

    Returns (layer_bytes, diff_id). Entries are added in sorted order with
    zeroed timestamps so the layer digest is reproducible run-to-run.
    """
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for root, dirs, files in os.walk(artifact_dir):
            dirs.sort()
            for name in sorted(files):
                full = os.path.join(root, name)
                rel = os.path.relpath(full, artifact_dir)
                info = tarfile.TarInfo(os.path.join(arcname_prefix, rel))
                data = open(full, "rb").read()
                info.size = len(data)
                info.mtime = 0
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(data))
    layer = buf.getvalue()
    return layer, _sha256(layer)


def build_image_archive(
    artifact_dir: str,
    output_tar: str,
    repo_tag: str = "rag-content-spark:latest",
    created: str = "1970-01-01T00:00:00Z",
) -> dict:
    """Write a docker-archive tar containing one gzip'd data layer.

    Returns the manifest dict (for assertions). Deterministic: fixed
    timestamps, sorted entries.
    """
    layer, diff_id = build_layer(artifact_dir)
    layer_gz = gzip.compress(layer, mtime=0)

    config = {
        "architecture": "amd64",
        "os": "linux",
        "created": created,
        "config": {"Env": [], "Cmd": ["/bin/sh"]},
        "rootfs": {"type": "layers", "diff_ids": [f"sha256:{diff_id}"]},
        "history": [{"created": created, "created_by": "rag-content-spark data layer"}],
    }
    config_bytes = json.dumps(config, sort_keys=True).encode()
    config_name = f"{_sha256(config_bytes)}.json"
    layer_name = f"{_sha256(layer_gz)}/layer.tar.gz"

    manifest = [
        {"Config": config_name, "RepoTags": [repo_tag], "Layers": [layer_name]}
    ]
    manifest_bytes = json.dumps(manifest, sort_keys=True).encode()

    with tarfile.open(output_tar, "w") as tar:

        def add(name: str, data: bytes):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tar.addfile(info, io.BytesIO(data))

        add(config_name, config_bytes)
        add(layer_name, layer_gz)
        add("manifest.json", manifest_bytes)
    return manifest[0]
