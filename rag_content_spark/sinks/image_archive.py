"""W7: package index artifacts as a loadable docker-archive tar
(capability parity with the reference's image builder, image_builder.py:
it splices a data layer onto a base image without a daemon or root).

From-scratch minimal implementation (stdlib only):

- single-layer archive: one data layer built from a directory of
  artifacts, a config with the layer's diff_id, and a docker-archive
  manifest — `docker load` / `podman load` compatible.
- base-image splice (:func:`splice_onto_base`): stack the data layer on
  top of an existing docker-archive base (reference
  image_builder.py:217-284) — base layers stream through untouched, the
  new config appends the layer diff_id + history entry and drops root
  (User 65532). The base tar is a local file; fetching it via skopeo
  (:func:`fetch_base_archive`) is optional and injectable, so the splice
  is fully testable offline.
"""

from __future__ import annotations

import copy
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


def read_docker_archive(tar_path: str) -> tuple[list[str], dict]:
    """Parse a docker-archive: ordered layer entry names + image config
    (reference image_builder.py:157-177 contract; layer bytes are not
    loaded into memory)."""
    with tarfile.open(tar_path) as t:
        manifest_file = t.extractfile("manifest.json")
        if manifest_file is None:
            raise RuntimeError("manifest.json not found in archive")
        entry = json.loads(manifest_file.read())[0]
        config_file = t.extractfile(entry["Config"])
        if config_file is None:
            raise RuntimeError(f"{entry['Config']} not found in archive")
        config = json.loads(config_file.read())
    return entry["Layers"], config


def fetch_base_archive(
    base_image: str, dest_tar: str, runner=None, timeout: int = 300
) -> str:
    """Fetch a base image as a docker-archive via ``skopeo copy``
    (reference image_builder.py:128-154). ``runner`` is injectable for
    offline tests; the default shells out to skopeo and raises
    NotImplementedError when the binary is absent."""
    import shutil as _shutil
    import subprocess

    if runner is None:
        if _shutil.which("skopeo") is None:
            raise NotImplementedError(
                "skopeo is not installed; supply a local base tar or an "
                "injectable runner"
            )

        def runner(image: str, dest: str) -> None:
            subprocess.run(
                [
                    "skopeo",
                    "copy",
                    "--remove-signatures",
                    f"docker://{image}",
                    f"docker-archive:{dest}",
                ],
                check=True,
                timeout=timeout,
                stderr=subprocess.PIPE,
            )

    runner(base_image, dest_tar)
    return dest_tar


def splice_onto_base(
    base_tar: str,
    artifact_dir: str,
    output_tar: str,
    repo_tag: str = "rag-content-spark:latest",
    created: str = "1970-01-01T00:00:00Z",
) -> dict:
    """Stack the artifact data layer on top of a base docker-archive.

    Mirrors the reference's composition (image_builder.py:217-284):
    base layers are streamed into the output unchanged; the new config is
    a deep copy of the base config with ``created`` restamped, the
    ``container`` key dropped, ``User`` forced to 65532:65532 (non-root),
    the new layer's diff_id appended to ``rootfs.diff_ids``, and a
    history entry appended; the manifest lists base layers then the new
    layer. Deterministic for a fixed ``created``.

    Returns the manifest entry dict.
    """
    layer, diff_id = build_layer(artifact_dir)
    layer_entry = f"{diff_id}/layer.tar"

    base_layer_names, base_config = read_docker_archive(base_tar)

    new_config = copy.deepcopy(base_config)
    new_config["created"] = created
    new_config.pop("container", None)
    new_config.setdefault("config", {})["User"] = "65532:65532"
    new_config.setdefault("rootfs", {"type": "layers", "diff_ids": []})[
        "diff_ids"
    ].append(f"sha256:{diff_id}")
    new_config.setdefault("history", []).append(
        {"created": created, "created_by": "rag-content-spark image splice"}
    )
    config_bytes = json.dumps(new_config, sort_keys=True).encode()
    config_entry = f"{_sha256(config_bytes)}.json"

    manifest = [
        {
            "Config": config_entry,
            "RepoTags": [repo_tag],
            "Layers": [*base_layer_names, layer_entry],
        }
    ]
    manifest_bytes = json.dumps(manifest, indent=2).encode()

    with tarfile.open(output_tar, "w") as outer:
        with tarfile.open(base_tar) as base_t:
            for name in base_layer_names:
                member = base_t.getmember(name)
                fileobj = base_t.extractfile(member)
                info = tarfile.TarInfo(name=name)
                info.size = member.size
                info.mtime = 0
                outer.addfile(info, fileobj)

        def add(name: str, data: bytes):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            outer.addfile(info, io.BytesIO(data))

        add(layer_entry, layer)
        add(config_entry, config_bytes)
        add("manifest.json", manifest_bytes)
    return manifest[0]
