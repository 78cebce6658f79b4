"""As-of and banded range joins (operators/temporal.py)."""

from pyspark.sql import functions as F

from rag_content_spark.operators.temporal import asof_join, range_join


def _frames(spark):
    left = spark.createDataFrame(
        [("p1", 1, 10), ("p2", 1, 20), ("p3", 2, 5)],
        ["event_id", "user_id", "ts_sec"],
    )
    right = spark.createDataFrame(
        [(1, 8, 0.8), (1, 10, 1.0), (1, 15, 1.5), (2, 9, 9.0)],
        ["user_id", "ts_sec", "value"],
    )
    return left, right


def test_asof_non_strict_includes_equal_ts(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: (r["asof_ts"], r["value"])
        for r in asof_join(left, right).collect()
    }
    # p1@10: right@10 visible (<=); p2@20: latest is 15; p3@5: no prior
    assert got == {
        "p1": (10, 1.0),
        "p2": (15, 1.5),
        "p3": (None, None),
    }


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["asof_ts"]
        for r in asof_join(left, right, strict=True).collect()
    }
    assert got["p1"] == 8  # the @10 right row is no longer visible


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one Exchange for the window partitioning; no join node at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_window_edges(spark):
    left, right = _frames(spark)
    pairs = range_join(
        left, right, lo=-5, hi=0, right_cols=("value",)
    ).collect()
    got = sorted((r["event_id"], r["r_value"]) for r in pairs)
    # p1@10 window [5,10]: right@8 and @10; p2@20 [15,20]: @15;
    # p3@5 [0,5]: nothing (right@9 is after)
    assert got == [("p1", 0.8), ("p1", 1.0), ("p2", 1.5)]


def test_range_join_rejects_empty_window(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError):
        range_join(left, right, lo=5, hi=5)
