"""Deterministic HLL sketch (operators/sketches.py)."""

from pyspark.sql import functions as F

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.operators.sketches import hll_estimate, hll_registers


def _vals(spark, n, tag=""):
    return spark.range(n).select(
        stable_hash64(F.concat(F.lit(tag), F.col("id").cast("string"))).alias("h")
    )


def test_estimate_accuracy_large(spark):
    # raw-HLL stderr at m=256 is ~6.5%; well clear of the bias hump at 100k
    r = hll_estimate(_vals(spark, 100_000), "h").collect()[0]
    assert abs(r["est"] - 100_000) / 100_000 < 0.15
    assert r["n_zero"] == 0


def test_estimate_duplicates_invariant(spark):
    once = hll_estimate(_vals(spark, 5000), "h").collect()[0]["est"]
    tripled = hll_estimate(
        _vals(spark, 5000).unionAll(_vals(spark, 5000)).unionAll(_vals(spark, 5000)),
        "h",
    ).collect()[0]["est"]
    assert once == tripled


def test_small_range_correction_branch(spark):
    # tiny set -> zeros present -> linear-counting branch, near-exact
    r = hll_estimate(_vals(spark, 30), "h").collect()[0]
    assert r["n_zero"] > 0
    assert abs(r["est"] - 30) < 8


def test_register_merge_is_max(spark):
    # merging two sketches = elementwise max of register tables — the
    # property that makes HLL map-side combinable at 100 TB
    a = hll_registers(_vals(spark, 2000, "a"), "h")
    b = hll_registers(_vals(spark, 2000, "b"), "h")
    both = hll_registers(
        _vals(spark, 2000, "a").unionAll(_vals(spark, 2000, "b")), "h"
    )
    merged = (
        a.unionAll(b)
        .groupBy("reg")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, both.collect())
    )


def test_hll_registers_on_stream(spark, tmp_path):
    # the register table is a bounded streaming aggregate: <= 2^p keys of
    # state no matter how long the stream runs (max is the merge)
    import json

    src = tmp_path / "hll_in"
    src.mkdir()
    with open(src / "v.json", "w") as fh:
        for i in range(5000):
            fh.write(json.dumps({"v": str(i)}) + "\n")
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("v", T.StringType())])
    stream = spark.readStream.schema(schema).json(str(src)).select(
        stable_hash64(F.col("v")).alias("h")
    )
    q = (
        hll_registers(stream, "h")
        .writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_regs = {
        (r["reg"], r["max_rank"])
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    batch_regs = {
        (r["reg"], r["max_rank"])
        for r in hll_registers(_vals(spark, 5000), "h").collect()
    }
    # identical register state to the batch sketch over the same values,
    # and state stays within the 2^p bound
    assert len(stream_regs) <= 256
    assert stream_regs == batch_regs
