"""Chunk-validity filter spec — ports the reference's parametrized
``_got_content`` cases (tests/test_document_processor_llama_index.py:118-155,
summarized in FIXTURES.md §2)."""

import pytest

from pyspark.sql import functions as F

from rag_content_spark.operators.filters import (
    apply_unreachable_policy,
    has_whitespace,
    markdown_has_content,
    valid_chunk,
)

VALID_CASES = [
    "# Header\ncontent line",
    "# H1\n## H2\nreal content",
    "content only",
    "# H\n\tindented content after header",
    "Setext Title\n=====\nbody follows",  # setext header then content
    "```\ncode inside fence\n```",
    "    indented code line",
    "plain content\n\n\n",
]

INVALID_CASES = [
    "# Single Header",
    "# H1\n## H2",
    "# Header with trailing space ",
    "## \n#",
    "####",
    "#    ",
    "  # leading-space header",
    "   \n\t  ",
    "```\n```",
    "# Header\n====\n---",
]


@pytest.mark.parametrize("text", VALID_CASES)
def test_got_content_valid(spark, text):
    df = spark.createDataFrame([(text,)], ["text"])
    assert df.select(markdown_has_content("text").alias("v")).first()["v"] is True


@pytest.mark.parametrize("text", INVALID_CASES)
def test_got_content_invalid(spark, text):
    df = spark.createDataFrame([(text,)], ["text"])
    assert df.select(markdown_has_content("text").alias("v")).first()["v"] is False


def test_whitespace_filter(spark):
    df = spark.createDataFrame([("nowhitespace",), ("has space",)], ["text"])
    got = df.select("text", has_whitespace("text").alias("v")).collect()
    assert {r["text"]: r["v"] for r in got} == {
        "nowhitespace": False,
        "has space": True,
    }


def test_valid_chunk_gates_by_doc_type(spark):
    # '# Only Header' is invalid for markdown-like types but fine for text
    df = spark.createDataFrame(
        [("# Only Header", "markdown"), ("# Only Header", "text")],
        ["text", "doc_type"],
    )
    got = {
        r["doc_type"]: r["v"]
        for r in df.select(
            "doc_type", valid_chunk("text", "doc_type").alias("v")
        ).collect()
    }
    assert got == {"markdown": False, "text": True}


def _policy_df(spark):
    return spark.createDataFrame(
        [("A", True), ("B", False), ("C", False)], ["title", "url_reachable"]
    )


def test_unreachable_warn_keeps_all(spark):
    assert apply_unreachable_policy(_policy_df(spark), "warn").count() == 3


def test_unreachable_drop_with_ignore_list(spark):
    kept = apply_unreachable_policy(
        _policy_df(spark), "drop", ignore_list=["C"]
    ).collect()
    assert sorted(r["title"] for r in kept) == ["A", "C"]


def test_unreachable_fail_raises(spark):
    with pytest.raises(RuntimeError):
        apply_unreachable_policy(_policy_df(spark), "fail")


def test_unreachable_fail_ok_when_all_ignored(spark):
    assert (
        apply_unreachable_policy(
            _policy_df(spark), "fail", ignore_list=["B", "C"]
        ).count()
        == 3
    )
