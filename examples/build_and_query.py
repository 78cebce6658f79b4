"""End-to-end example: build a vector index from a docs folder and query
it — the library-API version of what ``rag-spark build`` / ``rag-spark
query`` do (see rag_content_spark/cli.py for the CLI twin).

Run: python examples/build_and_query.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rag_content_spark.embedding.mock import mock_embedding_expr
from rag_content_spark.operators.dedup import exact_dedup
from rag_content_spark.plans.build_pipeline import BuildConfig, build_chunks
from rag_content_spark.plans.query import query_index
from rag_content_spark.session import get_spark
from rag_content_spark.sinks.parquet_sink import read_index, write_index
from rag_content_spark.sources.directory import read_text_documents


def main() -> None:
    spark = get_spark("example", master="local[4]", shuffle_partitions=4)
    workdir = tempfile.mkdtemp(prefix="rag_example_")

    # 1. a tiny corpus (markdown with frontmatter + a plain note)
    docs_dir = os.path.join(workdir, "docs")
    os.makedirs(docs_dir)
    with open(os.path.join(docs_dir, "manual.md"), "w") as fh:
        fh.write(
            "---\nurl: https://docs.example.com/zyranex\n"
            'title: "Zyranex T7 Manual"\n---\n'
            "# Zyranex T7\n\nError ZRX-4401 means the quorbitex module "
            "overheated.\n\n## Maintenance\n\nReplace the filter monthly."
        )
    with open(os.path.join(docs_dir, "notes.md"), "w") as fh:
        fh.write("# Service Notes\n\nGeneral operational guidance.")

    # 2. build: read -> metadata -> split -> filter -> chunk -> embed
    embedder = lambda c: mock_embedding_expr(c, dim=32, normalize=True)
    docs = read_text_documents(spark, docs_dir)
    chunks = build_chunks(
        docs, BuildConfig(chunk_size=16, chunk_overlap=0), embedder=embedder
    )
    index_path = os.path.join(workdir, "index")
    write_index(chunks, index_path)
    print(f"index written: {index_path} ({chunks.count()} chunks)")

    # 3. dedup report over the corpus
    exact_dedup(docs, text_col="text", id_col="doc_id").show(truncate=40)

    # 4. query: embed the question with the same embedder, exact top-k
    index = read_index(spark, index_path)
    qvec = (
        spark.createDataFrame([("Zyranex error ZRX-4401",)], ["text"])
        .select(embedder(F.col("text")).alias("v"))
        .collect()[0]["v"]
    )
    result = query_index(index, "Zyranex error ZRX-4401", list(qvec), k=3)
    print(json.dumps(result, indent=2)[:1200])


if __name__ == "__main__":
    main()
