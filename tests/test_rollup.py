"""Rollup operators (A1/A2) and the pairwise-distance functions (Q4)
— unit coverage for the cells the oracle queries exercise indirectly."""

import math

from pyspark.sql import functions as F


def test_group_chunks_by_document(spark):
    from rag_content_spark.operators.rollup import group_chunks_by_document

    rows = [("d1", "c2"), ("d1", "c1"), ("d2", "c3")]
    df = spark.createDataFrame(rows, ["document_id", "chunk_id"])
    got = {r["document_id"]: r for r in group_chunks_by_document(df).collect()}
    assert got["d1"]["n_chunks"] == 2
    assert got["d1"]["chunk_ids"] == ["c1", "c2"]  # sorted
    assert got["d2"]["chunk_ids"] == ["c3"]


def test_stamp_document_file_id_is_deterministic(spark):
    import hashlib

    from rag_content_spark.operators.rollup import stamp_document_file_id

    df = spark.createDataFrame([("d1", "c1"), ("d1", "c2")], ["document_id", "chunk_id"])
    got = stamp_document_file_id(df).collect()
    expected = hashlib.md5(b"d1").hexdigest()
    assert all(r["file_id"] == expected for r in got)


def test_corpus_counts_with_and_without_reachable(spark):
    from rag_content_spark.operators.rollup import corpus_counts

    plain = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    assert corpus_counts(plain).collect()[0]["n_docs"] == 2

    flagged = spark.createDataFrame(
        [(1, True), (2, False), (3, True)], ["doc_id", "url_reachable"]
    )
    row = corpus_counts(flagged).collect()[0]
    assert row["n_docs"] == 3 and row["n_reachable"] == 2

    grouped = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr")], ["doc_id", "lang"]
    )
    got = {r["lang"]: r["n_docs"] for r in corpus_counts(grouped, ["lang"]).collect()}
    assert got == {"en": 2, "fr": 1}


def test_cosine_euclidean_length_penalty(spark):
    from rag_content_spark.functions.vector import (
        cosine,
        euclidean,
        length_penalty,
    )

    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0], 4, 6)], ["a", "b", "la", "lb"]
    )
    r = df.select(
        cosine("a", "b").alias("cos"),
        euclidean("a", "b").alias("l2"),
        length_penalty("la", "lb").alias("pen"),
    ).collect()[0]
    assert abs(r["cos"]) < 1e-9                     # orthogonal
    assert abs(r["l2"] - math.sqrt(2)) < 1e-9
    assert abs(r["pen"] - (2 / 10 * 0.1)) < 1e-9    # |4-6|/(4+6)*0.1
