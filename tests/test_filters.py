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

# Every parametrized case from the reference's
# test__got_content_with_content / test__got_content_only_headers
# (tests/test_document_processor_llama_index.py:118-155), verbatim.
REFERENCE_VALID = [
    "# Header\nSome content",
    "# Header1\n# Header2\nAlso here",
    "No headers, just content",
    "# H\n# H2\n\tThis is non-header",
    "   # H\n Header\n ======\n\tThis is non-header",
    "  ## H\nHeader\n ------\n```\n# git commit\n```",
    " # H\n    # git commit\n",
    " Content\n\n",
]

REFERENCE_INVALID = [
    "# Only header",
    "# Another header\n## Subheader",
    "# Header with space \n",
    "## \n#",
    "#Header1\n#Header2\n#Header3",  # no-space ATX headers
    "#    ",
    "   # Header with leading space",
    "   \n\t  \n",
    "   \n```\n\n```\n",  # empty fenced code block
    "   \n      \n    \n",  # empty indented code block
    "  # Header\nAnother header\n====\n\n====",  # setext consumes a line
]

# Semantics the old regex version got wrong (VERDICT r01) + edge cases.
EXTRA_VALID = [
    "***",  # only =/- strings are horizontal rules
    "```\ncode inside fence\n```",
    "    indented code line",
    "x\n====\ny",  # setext consumed, then real content
    "Setext Title\n=====\nbody follows",
]
EXTRA_INVALID = [
    "Title\n=====",  # setext-only section
    "Title\n    ====",  # setext underline consumed even when 4-indented
    "=-=-",  # mixed =/- is still a rule
    "x\n====\ny\n====",
    "```\n```",
    "# Header\n====\n---",
]


def _got_content_batch(spark, cases):
    df = spark.createDataFrame(list(enumerate(cases)), ["id", "text"])
    got = df.select("id", markdown_has_content("text").alias("v")).collect()
    return [bool(r["v"]) for r in sorted(got, key=lambda r: r["id"])]


def test_got_content_reference_cases(spark):
    cases = REFERENCE_VALID + EXTRA_VALID + REFERENCE_INVALID + EXTRA_INVALID
    expected = [True] * (len(REFERENCE_VALID) + len(EXTRA_VALID)) + [False] * (
        len(REFERENCE_INVALID) + len(EXTRA_INVALID)
    )
    got = _got_content_batch(spark, cases)
    mism = [
        (c, g, e) for c, g, e in zip(cases, got, expected) if g != e
    ]
    assert not mism, f"got_content mismatches: {mism}"


def test_got_content_python_twin_agrees():
    from rag_content_spark.operators.filters import got_content_py

    for c in REFERENCE_VALID + EXTRA_VALID:
        assert got_content_py(c) is True, repr(c)
    for c in REFERENCE_INVALID + EXTRA_INVALID:
        assert got_content_py(c) is False, repr(c)


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
