from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from rag_content_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def docs_df(spark):
    """Tiny corpus mirroring FIXTURES.md §1 row varieties (markdown with
    frontmatter + marker terms, markdown without, plain text, unreachable)."""
    rows = [
        (
            "/corpus/manual.md",
            "markdown",
            "---\nurl: https://docs.example.com/zyranex\n"
            'title: "Zyranex T7 Manual"\n---\n'
            "# Zyranex T7\n\nThe Zyranex T7 reports error ZRX-4401 when the "
            "quorbitex module overheats.\n\n## Maintenance\n\nReplace the "
            "quorbitex filter every 30 days.",
        ),
        (
            "/corpus/notes.md",
            "markdown",
            "# Operational Notes\n\nRoutine service details and spare part lists.",
        ),
        ("/corpus/plain.txt", "text", "A single plain paragraph about nothing."),
    ]
    return spark.createDataFrame(rows, ["file_path", "doc_type", "text"]).selectExpr(
        "file_path", "doc_type", "md5(file_path) AS doc_id", "text"
    )
