"""SFT / code-pretrain data-shaping example: chat-transcript validation
-> code-fence extraction -> semantic chunking -> FIM transform -> HF
parquet export.

The library-API tour of the round-6 operators; every stage is lazy
column algebra until the final writes. The oracle-checked query twins
are ``chat_turns`` / ``chat_valid`` / ``code_blocks`` /
``chunk_semantic`` / ``fim_split`` in __spark_entry__.py.

Run: python examples/sft_data_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rag_content_spark.operators.chunking import chunk_semantic
from rag_content_spark.operators.sft import (
    fim_transform,
    parse_chat_turns,
    validate_dialogs,
)
from rag_content_spark.operators.text_analysis import extract_code_blocks
from rag_content_spark.session import get_spark
from rag_content_spark.sinks.hf_dataset import write_hf_parquet_dataset


def main() -> None:
    spark = get_spark("sft-example", master="local[4]", shuffle_partitions=4)
    out = tempfile.mkdtemp(prefix="sft_example_")

    dialogs = spark.createDataFrame(
        [
            (1, "user: how do I read parquet?\nassistant: spark.read.parquet"),
            (2, "assistant: hi\nuser: backwards"),          # bad_start
            (3, "user: one\nuser: two\nassistant: ok"),      # bad_alternation
        ],
        ["doc_id", "text"],
    )
    turns = parse_chat_turns(dialogs)
    verdicts = validate_dialogs(turns)
    kept = dialogs.join(
        verdicts.filter("valid").select("doc_id"), "doc_id", "left_semi"
    )
    print("dialog verdicts:")
    verdicts.orderBy("doc_id").show(truncate=False)

    docs = spark.createDataFrame(
        [
            (
                10,
                "Intro prose. More prose here.\n```python\n"
                "def f():\n    return 1\n```\nclosing words.",
            )
        ],
        ["doc_id", "text"],
    )
    print("extracted code blocks:")
    extract_code_blocks(docs).show(truncate=False)

    print("semantic chunks (mock-embedding boundaries):")
    chunk_semantic(docs, threshold6=0).orderBy("segment_index").show(
        truncate=60
    )

    fim = fim_transform(
        docs.select("doc_id", "text"), min_tokens=4, fim_pct=100
    )
    print("FIM transform:")
    fim.show(truncate=80)

    manifest = write_hf_parquet_dataset(
        kept, os.path.join(out, "sft"), split="train", key_col="doc_id",
        n_shards=2,
    )
    print("HF export manifest:")
    manifest.show()
    print(f"dataset at {out}/sft (data/ shards + dataset_info.json)")


if __name__ == "__main__":
    main()
