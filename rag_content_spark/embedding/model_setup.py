"""S9: embedding-model download & layout preparation (the reference's
documented first step, scripts/download_embeddings_model.py:24-43).

Driver-side utility, not a Spark job: the model directory is prepared
once, then shipped to executors via ``spark.submit.files``/archive or a
shared filesystem — the Arrow-batched encoder UDF
(rag_content_spark.embedding.encoder) loads it per worker.

The download callable is injectable so the layout logic is testable
offline; the default resolves ``huggingface_hub.snapshot_download``
lazily (not installed in every environment).
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Optional


def download_model(
    repo_id: str,
    local_dir: str,
    snapshot_fn: Optional[Callable[..., object]] = None,
) -> str:
    """Download a sentence-transformers model and normalize its layout.

    Mirrors the reference step by step
    (scripts/download_embeddings_model.py:24-43):

    1. snapshot-download ``repo_id`` into ``local_dir``;
    2. add an empty ``2_Normalize`` module dir (sentence-transformers
       normalization workaround);
    3. write ``version.txt`` so the dir doubles as an HF cache;
    4. drop ``pytorch_model.bin`` (the model loads from safetensors);
    5. drop the ``onnx``/``openvino`` export dirs.

    Returns ``local_dir``.
    """
    if snapshot_fn is None:
        try:
            from huggingface_hub import snapshot_download as snapshot_fn
        except ImportError as exc:  # pragma: no cover - hub not in container
            raise NotImplementedError(
                "huggingface_hub is not installed; pass snapshot_fn= "
                "(e.g. a local copy function) to prepare a model dir offline"
            ) from exc

    os.environ["HF_HUB_DISABLE_PROGRESS_BARS"] = "1"
    snapshot_fn(repo_id=repo_id, local_dir=local_dir)

    os.makedirs(os.path.join(local_dir, "2_Normalize"), exist_ok=True)

    with open(
        os.path.join(local_dir, "version.txt"), "w", encoding="utf-8"
    ) as f:
        f.write("1")

    bin_path = os.path.join(local_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        os.remove(bin_path)

    for export_dir in ("onnx", "openvino"):
        path = os.path.join(local_dir, export_dir)
        if os.path.isdir(path):
            shutil.rmtree(path)

    return local_dir
