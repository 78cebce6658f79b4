"""exact_global_rank / exact_ntile: the distributed twins of the
unpartitioned rank window, equality-pinned against the window they
replace (operators/ranking.py)."""

import pytest
from pyspark.sql import Window, functions as F

from rag_content_spark.operators.ranking import exact_global_rank, exact_ntile


def _rand_df(spark, n, dup_every=7):
    # duplicate xent values every dup_every rows: the tie-break column
    # (id) must carry the total order
    return spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(n // dup_every + 1))).alias("x"),
    )


@pytest.mark.parametrize("n,parts", [(1, 4), (97, 4), (1000, 8), (1000, 33)])
def test_exact_global_rank_matches_window(spark, n, parts):
    df = _rand_df(spark, n)
    got = {
        r["id"]: r["rank"]
        for r in exact_global_rank(
            df, ["x", "id"], num_partitions=parts
        ).collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy("x", "id")).alias("rank")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(1000, 3), (1000, 4), (7, 3), (2, 3)])
def test_exact_ntile_matches_window(spark, n, k):
    df = _rand_df(spark, n)
    got = {
        r["id"]: r["bucket"]
        for r in exact_ntile(df, ["x", "id"], n=k, num_partitions=8).collect()
    }
    want = {
        r["id"]: r["b"]
        for r in df.select(
            "id", F.ntile(k).over(Window.orderBy("x", "id")).alias("b")
        ).collect()
    }
    assert got == want


def test_exact_global_rank_empty_input(spark):
    df = spark.range(0).select("id", F.lit(0).alias("x"))
    assert exact_global_rank(df, ["x", "id"]).collect() == []


def test_exact_global_rank_plan_has_no_single_partition_exchange(spark):
    df = _rand_df(spark, 1000)
    plan = (
        exact_global_rank(df, ["x", "id"], num_partitions=8)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "SinglePartition" not in plan, plan[:1500]


@pytest.mark.parametrize("n,parts", [(1, 4), (50, 4), (1000, 16)])
def test_exact_global_lead_matches_window(spark, n, parts):
    from rag_content_spark.operators.ranking import exact_global_lead

    # sparse ids (gaps) in random hash order
    df = spark.range(n).select(
        (F.col("id") * 3 + F.pmod(F.xxhash64("id"), F.lit(2))).alias("k")
    )
    got = {
        r["k"]: r["nxt"]
        for r in exact_global_lead(df, "k", num_partitions=parts).collect()
    }
    want = {
        r["k"]: r["nxt"]
        for r in df.select(
            "k", F.lead("k").over(Window.orderBy("k")).alias("nxt")
        ).collect()
    }
    assert got == want


def test_exact_global_lead_duplicate_keys(spark):
    from rag_content_spark.operators.ranking import exact_global_lead

    df = spark.createDataFrame([(1,), (1,), (2,), (5,), (5,)], ["k"])
    rows = exact_global_lead(df, "k", num_partitions=3).collect()
    # multiset of (k, nxt) matches the window's (any tie order)
    key = lambda t: (t[0], t[1] is None, t[1] or 0)  # noqa: E731
    got = sorted(((r["k"], r["nxt"]) for r in rows), key=key)
    want = sorted(
        (
            (r["k"], r["nxt"])
            for r in df.select(
                "k", F.lead("k").over(Window.orderBy("k")).alias("nxt")
            ).collect()
        ),
        key=key,
    )
    assert got == want
