import math

from pyspark.sql import functions as F

from rag_content_spark.embedding.mock import mock_embed_udf, mock_embedding_expr


def test_expr_and_udf_twins_agree(spark):
    """The Column-expression mock and the pandas-UDF mock must produce
    identical vectors (same md5-derived formula)."""
    df = spark.createDataFrame([("hello world",), ("zyranex",)], ["text"])
    got = df.select(
        mock_embedding_expr("text", dim=8, normalize=False).alias("e1"),
        mock_embed_udf(dim=8, normalize=False)(F.col("text")).alias("e2"),
    ).collect()
    for row in got:
        assert [round(x, 12) for x in row["e1"]] == [
            round(x, 12) for x in row["e2"]
        ]


def test_deterministic_and_distinct(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["text"])
    rows = df.select(mock_embedding_expr("text", dim=8).alias("e")).collect()
    assert rows[0]["e"] == rows[1]["e"]
    assert rows[0]["e"] != rows[2]["e"]


def test_normalized_unit_norm(spark):
    df = spark.createDataFrame([("some text",)], ["text"])
    vec = df.select(
        mock_embedding_expr("text", dim=16, normalize=True).alias("e")
    ).first()["e"]
    assert math.isclose(sum(x * x for x in vec), 1.0, rel_tol=1e-4)


def test_real_encoder_is_import_gated():
    import pytest

    from rag_content_spark.embedding.encoder import _get_model

    with pytest.raises(NotImplementedError):
        _get_model("/nonexistent/model")
