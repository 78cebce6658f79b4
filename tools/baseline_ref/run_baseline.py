"""BASELINE.md step 2: measure the reference pipeline vs the Spark engine
on the same corpus with the same deterministic embedder.

The reference's own ``document_processor.py`` runs UNMODIFIED from
/root/reference/src on the faiss path; only its third-party imports
(llama-index, faiss, frontmatter, requests, sentence-transformers) are
satisfied by the shims in ``tools/baseline_ref/shims`` — see each shim's
docstring for the behavior contract. Both engines embed through
``rag_content_spark.embedding.mock._mock_embed_one`` (768-d, normalized),
so per-chunk model cost is identical and the measured difference is
pipeline architecture.

Usage::

    python tools/baseline_ref/run_baseline.py [--sf-dir /root/testdata/sf0.1]
        [--keep]

Prints one JSON line:
    {"reference_s": ..., "spark_pipeline_s": ..., "spark_total_s": ...,
     "ratio": reference_s / spark_pipeline_s, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SHIMS = os.path.join(REPO, "tools", "baseline_ref", "shims")
REFERENCE_SRC = "/root/reference/src"

SECTION_WORDS = 40  # ~40-word sections -> several markdown sections per doc


def render_corpus(sf_dir: str, out_dir: str, replicate: int = 1) -> int:
    """documents.parquet -> one .md file per doc with frontmatter + headings
    (the reference's input contract: a directory of markdown files).
    ``replicate`` clones the corpus N times with distinct doc_ids for
    scaling measurements."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    base_rows = con.execute(
        "select doc_id, text, source from read_parquet(?) order by doc_id",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchall()
    rows = [
        (f"{doc_id}r{r}" if r else doc_id, text, source)
        for r in range(replicate)
        for doc_id, text, source in base_rows
    ]
    for doc_id, text, source in rows:
        words = text.split()
        parts = [
            "---",
            f"title: Document {doc_id}",
            f"url: https://docs.example.com/{source}/{doc_id}",
            "---",
            f"# Document {doc_id}",
            "",
        ]
        for sec, start in enumerate(range(0, len(words), SECTION_WORDS)):
            parts.append(f"## Section {sec}")
            parts.append(" ".join(words[start : start + SECTION_WORDS]))
            parts.append("")
        with open(
            os.path.join(out_dir, f"{doc_id}.md"), "w", encoding="utf-8"
        ) as f:
            f.write("\n".join(parts))
    return len(rows)


_REFERENCE_DRIVER = r"""
import json, os, sys, time
from pathlib import Path

sys.path.insert(0, os.environ["BASELINE_SHIMS"])
sys.path.insert(0, os.environ["BASELINE_REFERENCE_SRC"])
sys.path.insert(0, os.environ["BASELINE_REPO"])

t_start = time.time()
from lightspeed_rag_content.document_processor import DocumentProcessor
from lightspeed_rag_content.metadata_processor import MetadataProcessor

# warm-runtime boundary: module imports done (the Spark twin's boundary
# is session + python-worker-pool bootstrap — see _SPARK_DRIVER)
import_s = time.time() - t_start
t0 = time.time()


class BenchMetadata(MetadataProcessor):
    def url_function(self, file_path: str) -> str:
        return "https://docs.example.com/" + os.path.basename(file_path)


corpus = os.environ["BASELINE_CORPUS"]
out = os.environ["BASELINE_OUT"]
proc = DocumentProcessor(
    chunk_size=380,
    chunk_overlap=0,
    model_name="sentence-transformers/all-mpnet-base-v2",
    embeddings_model_dir="",
    num_workers=0,
    vector_store_type="faiss",
    doc_type="markdown",
)
proc.process(
    Path(corpus),
    metadata=BenchMetadata(hermetic_build=True),
    required_exts=[".md"],
    unreachable_action="warn",
)
proc.save("bench", out)
wall = time.time() - t0
meta = json.load(open(os.path.join(out, "metadata.json")))
print(
    json.dumps(
        {
            "wall_s": round(wall, 2),
            "import_s": round(import_s, 2),
            "cold_s": round(time.time() - t_start, 2),
            "embedded_files": meta["total-embedded-files"],
            "nodes": len(proc.db._good_nodes),
        }
    )
)
"""

_SPARK_DRIVER = r"""
import json, os, sys, time

sys.path.insert(0, os.environ["BASELINE_REPO"])

from pyspark.sql import functions as F

from rag_content_spark.session import get_spark, warm_python_workers
from rag_content_spark.plans.build_pipeline import BuildConfig, build_chunks
from rag_content_spark.embedding.mock import mock_embed_udf
from rag_content_spark.sinks.exports import build_metadata_json, write_metadata_json
from rag_content_spark.sources.directory import read_text_documents_fast

t_start = time.time()
spark = get_spark("baseline-bench")
# warm-runtime boundary: session + python-worker-pool bootstrap (the
# one-time daemon fork + pandas/pyarrow/package imports a long-lived
# cluster executor pays once, not per job — session.warm_python_workers
# docstring). The reference twin's boundary is its module imports.
warm_python_workers(spark)
bootstrap_s = time.time() - t_start
t0 = time.time()
corpus = os.environ["BASELINE_CORPUS"]
out = os.environ["BASELINE_OUT"]
# manifest reader: the wholetext path costs ~50 ms/file of Hadoop
# per-file overhead on small-file corpora (parity-tested drop-in)
docs = read_text_documents_fast(spark, corpus, glob="*.md")
chunks = build_chunks(
    docs,
    BuildConfig(hermetic=True, markdown_aware=True),
    embedder=mock_embed_udf(768, True),
)
chunks.write.mode("overwrite").parquet(os.path.join(out, "chunks.parquet"))
write_s = time.time() - t0
written = spark.read.parquet(os.path.join(out, "chunks.parquet"))
# one validation job, one pruned-column scan (count + exact distinct in
# a single partial-agg pass), instead of two separate re-reads
row = written.agg(
    F.count(F.lit(1)).alias("n"),
    F.count_distinct("document_id").alias("n_docs"),
).collect()[0]
n, n_docs = row["n"], row["n_docs"]
pipeline_s = time.time() - t0
sys.stderr.write(f"write_s={write_s:.2f} pipeline_s={pipeline_s:.2f}\n")
write_metadata_json(
    os.path.join(out, "metadata.json"),
    build_metadata_json(
        execution_time_s=int(pipeline_s),
        embedding_model="sentence-transformers/all-mpnet-base-v2",
        index_id="bench",
        vector_db="faiss.IndexFlatIP",
        embedding_dimension=768,
        chunk=380,
        overlap=0,
        total_embedded_files=n_docs,
    ),
)
print(
    json.dumps(
        {
            "pipeline_s": round(pipeline_s, 2),
            "bootstrap_s": round(bootstrap_s, 2),
            "total_s": round(time.time() - t_start, 2),
            "embedded_files": n_docs,
            "chunks": n,
        }
    )
)
"""


def _run(driver: str, env: dict) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", driver],
        env={**os.environ, **env},
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if res.returncode != 0:
        sys.stderr.write(res.stdout[-4000:] + "\n" + res.stderr[-4000:])
        raise RuntimeError("driver failed")
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--keep", action="store_true", help="keep work dir")
    ap.add_argument("--replicate", type=int, default=1)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="baseline-")
    corpus = os.path.join(work, "corpus")
    n_docs = render_corpus(args.sf_dir, corpus, replicate=args.replicate)

    base_env = {
        "BASELINE_SHIMS": SHIMS,
        "BASELINE_REFERENCE_SRC": REFERENCE_SRC,
        "BASELINE_REPO": REPO,
        "BASELINE_CORPUS": corpus,
    }
    ref = _run(
        _REFERENCE_DRIVER,
        {**base_env, "BASELINE_OUT": os.path.join(work, "ref_out")},
    )
    spk = _run(
        _SPARK_DRIVER,
        {**base_env, "BASELINE_OUT": os.path.join(work, "spark_out")},
    )

    result = {
        "sf_dir": args.sf_dir,
        "replicate": args.replicate,
        "docs": n_docs,
        # warm-runtime walls: reference after module imports, Spark
        # after session + python-worker-pool bootstrap (the symmetric
        # steady-state boundary — a long-lived deployment pays each
        # engine's one-time runtime cost once, not per corpus build)
        "reference_s": ref["wall_s"],
        "reference_import_s": ref["import_s"],
        "reference_nodes": ref["nodes"],
        "spark_pipeline_s": spk["pipeline_s"],
        "spark_bootstrap_s": spk["bootstrap_s"],
        "spark_chunks": spk["chunks"],
        "ratio_ref_over_spark": round(ref["wall_s"] / spk["pipeline_s"], 2),
        # cold single-process walls (everything from exec to done),
        # reported so the warm boundary hides nothing
        "reference_cold_s": ref["cold_s"],
        "spark_cold_s": spk["total_s"],
        "ratio_cold": round(ref["cold_s"] / spk["total_s"], 2),
    }
    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    else:
        sys.stderr.write(f"work dir kept: {work}\n")


if __name__ == "__main__":
    main()
