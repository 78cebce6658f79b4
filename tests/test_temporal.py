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


def test_builtin_session_window_merges_at_exact_gap(spark):
    """Pin the Spark semantics the session_window_native oracle mirrors
    (queries.py): an event whose start equals the current session END
    (gap == exactly the window duration) MERGES — Spark's session merge
    rule is start <= end, so a new session needs a STRICTLY greater
    gap. sf0.1 user 511 hit this boundary in the wild (two events
    1800 s apart collapsed to one session while a >=-gap oracle split
    them)."""
    rows = [
        (1, 0),
        (1, 1800),   # == gap: merges (end extends to 3600)
        (1, 5401),   # 5401 - 1800 = 3601 > 1800: new session
        (2, 0),
        (2, 1801),   # > gap by 1 s: new session
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_sec"]).select(
        "user_id", F.timestamp_seconds("ts_sec").alias("ts")
    )
    sess = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .select(
            "user_id",
            F.unix_seconds("session_window.start").alias("start"),
            F.unix_seconds("session_window.end").alias("end"),
            "count",
        )
    )
    got = {
        (r["user_id"], r["start"], r["end"]): r["count"]
        for r in sess.collect()
    }
    assert got == {
        (1, 0, 3600): 2,      # exact-gap pair merged, end = last + gap
        (1, 5401, 7201): 1,
        (2, 0, 1800): 1,      # gap+1 split
        (2, 1801, 3601): 1,
    }
