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


def test_mock_embed_driver_twin_bit_identical(spark):
    """The r11 driver-side qvec path: _mock_embed_one must match
    mock_embedding_expr BIT-for-bit (the hybrid queries now embed their
    constant query string on the driver instead of paying a one-row
    createDataFrame+collect Spark job per invocation)."""
    import struct

    from rag_content_spark.embedding.mock import _mock_embed_one

    texts = ["spark join merge", "", "a", "héllo wörld", "x" * 5000]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r["text"]: r["e"]
        for r in df.select(
            "text", mock_embedding_expr("text", dim=8).alias("e")
        ).collect()
    }
    for t in texts:
        local = _mock_embed_one(t, 8, False).tolist()
        assert [struct.pack("<d", x) for x in got[t]] == [
            struct.pack("<d", x) for x in local
        ], t


def test_emb_driver_matches_spark_collect(spark, tmp_path):
    """The r11 _emb_driver pyarrow fetch must return exactly what the
    replaced Spark filter+collect returned — same vec_ids, bit-identical
    float64s — for both the IN-filter and the mod-50 centroid pattern."""
    import struct

    from pyspark.sql import functions as F

    from rag_content_spark.queries import _emb_driver

    rows = [(i, [float(i) * 0.1 + j * 1e-7 for j in range(4)]) for i in range(120)]
    path = str(tmp_path / "emb")
    spark.createDataFrame(rows, ["vec_id", "embedding"]).write.parquet(
        f"{path}/embeddings.parquet"
    )
    emb = spark.read.parquet(f"{path}/embeddings.parquet")

    spark_one = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    got_one = _emb_driver(path, vec_ids=[7])
    assert [v for v, _ in got_one] == [7]
    assert [struct.pack("<d", x) for x in got_one[0][1]] == [
        struct.pack("<d", x) for x in spark_one
    ]

    spark_mod = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter((F.col("vec_id") % 50 == 0) | (F.col("vec_id") == 7))
        .orderBy("vec_id")
        .collect()
    ]
    got_mod = _emb_driver(path, vec_ids=[7], mod=50)
    assert [v for v, _ in got_mod] == [v for v, _ in spark_mod]
    for (_, a), (_, b) in zip(got_mod, spark_mod):
        assert [struct.pack("<d", x) for x in a] == [struct.pack("<d", x) for x in b]


def test_emb_driver_mod_rem_max_id(spark, tmp_path):
    """The rem/max_id extension (IVF centroid pattern, r11 continuation)
    must return exactly what the replaced Spark filter+collect did."""
    import struct

    from pyspark.sql import functions as F

    from rag_content_spark.queries import _emb_driver

    rows = [(i, [float(i) * 0.3 + j * 1e-6 for j in range(4)]) for i in range(300)]
    path = str(tmp_path / "emb")
    spark.createDataFrame(rows, ["vec_id", "embedding"]).write.parquet(
        f"{path}/embeddings.parquet"
    )
    emb = spark.read.parquet(f"{path}/embeddings.parquet")
    want = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(
            (F.col("vec_id") % 50 == 1) & (F.col("vec_id") < 200)
        )
        .orderBy("vec_id")
        .collect()
    ]
    got = _emb_driver(path, mod=50, rem=1, max_id=200)
    assert [v for v, _ in got] == [v for v, _ in want] == [1, 51, 101, 151]
    for (_, a), (_, b) in zip(got, want):
        assert [struct.pack("<d", x) for x in a] == [
            struct.pack("<d", x) for x in b
        ]
