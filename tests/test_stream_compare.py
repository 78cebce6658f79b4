"""Engine-side streaming value-hash compare (tools/verify_local.py
stream_compare): the big-replica verify path for corpus-linear results
(round-9 verdict task 1). Pins (a) cross-engine agreement of the
canonical row rendering + commutative md5-sum over every supported
type, including float rounding boundaries, NULLs and NaN; (b) that a
single differing cell IS detected (the hash is not vacuously equal);
(c) that a row-count difference is detected."""

import importlib.util
import os

import duckdb
import pytest


def _mod():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "verify_local", os.path.join(root, "tools", "verify_local.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def vl():
    return _mod()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET TimeZone='UTC'")
    return c


def _mixed_df(spark):
    from pyspark.sql import functions as F

    return spark.range(6).select(
        F.col("id").alias("k"),
        # float boundary cases: 2.5e-6 sits EXACTLY on the .5 micro-grid
        # boundary; NULL and NaN render as distinct tokens
        F.expr(
            "CASE WHEN id = 0 THEN CAST(2.5e-6 AS DOUBLE) "
            "WHEN id = 1 THEN CAST(-1.2345675 AS DOUBLE) "
            "WHEN id = 2 THEN CAST(NULL AS DOUBLE) "
            "WHEN id = 3 THEN CAST('NaN' AS DOUBLE) "
            "ELSE CAST(id AS DOUBLE) / 3.0 END"
        ).alias("x"),
        F.expr(
            "CASE WHEN id = 4 THEN CAST(NULL AS STRING) "
            "ELSE concat('s|', CAST(id AS STRING)) END"
        ).alias("s"),
        F.expr("CAST(id AS DECIMAL(12,2)) * 1.5").alias("d"),
        F.expr("id % 2 = 0").alias("b"),
        F.expr("DATE'2024-01-01' + CAST(id AS INT)").alias("dt"),
    )


_MIXED_SQL = """
SELECT k,
       CASE WHEN k = 0 THEN 2.5e-6
            WHEN k = 1 THEN -1.2345675
            WHEN k = 2 THEN NULL
            WHEN k = 3 THEN CAST('NaN' AS DOUBLE)
            ELSE CAST(k AS DOUBLE) / 3.0 END AS x,
       CASE WHEN k = 4 THEN NULL ELSE 's|' || CAST(k AS VARCHAR) END AS s,
       CAST(CAST(k AS DECIMAL(12,2)) * 1.5 AS DECIMAL(16,3)) AS d,
       k % 2 = 0 AS b,
       DATE '2024-01-01' + CAST(k AS INTEGER) AS dt
FROM range(6) t(k)
"""


def test_stream_compare_agrees_on_mixed_types(spark, vl, con):
    status, detail = vl.stream_compare(_mixed_df(spark), con, _MIXED_SQL)
    assert status == []
    assert detail == {"rows": 6}


def test_stream_compare_detects_one_cell_diff(spark, vl, con):
    bad = _MIXED_SQL.replace("'s|' || CAST(k AS VARCHAR)",
                             "'s|' || CAST(k + 1 AS VARCHAR)")
    status, _ = vl.stream_compare(_mixed_df(spark), con, bad)
    assert status == ["stream value-hash mismatch"]


def test_stream_compare_detects_float_micro_diff(spark, vl, con):
    # a 2e-6 shift lands on a different 1e-6 grid cell -> must fail
    bad = _MIXED_SQL.replace("CAST(k AS DOUBLE) / 3.0 END AS x",
                             "CAST(k AS DOUBLE) / 3.0 + 2e-6 END AS x")
    status, _ = vl.stream_compare(_mixed_df(spark), con, bad)
    assert status == ["stream value-hash mismatch"]


def test_stream_compare_detects_row_count(spark, vl, con):
    bad = _MIXED_SQL.replace("FROM range(6) t(k)", "FROM range(5) t(k)")
    status, _ = vl.stream_compare(_mixed_df(spark), con, bad)
    assert status and status[0].startswith("rows ")


def test_stream_compare_detects_column_mismatch(spark, vl, con):
    bad = _MIXED_SQL.replace("AS b,", "AS b2,")
    status, _ = vl.stream_compare(_mixed_df(spark), con, bad)
    assert status and status[0].startswith("cols ")


def test_stream_compare_null_not_aliased_by_literal_tokens(spark, vl, con):
    """r10 advice: a NULL string cell must not hash equal to any literal
    string — the old rendering used the token 'NULL', so a Spark NULL vs
    a DuckDB 'NULL' string (or vice versa) false-passed. The sentinel is
    now '\\N', and escaping doubles real backslashes, so neither the
    literal 'NULL' nor the literal '\\N' can collide with a true NULL."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit(None).cast("string").alias("s"), F.col("id").alias("k")
    )
    status, _ = vl.stream_compare(
        df, con, "SELECT 'NULL' AS s, 0 AS k"
    )
    assert status == ["stream value-hash mismatch"]
    status, _ = vl.stream_compare(
        df, con, r"SELECT '\N' AS s, 0 AS k"
    )
    assert status == ["stream value-hash mismatch"]
    # and a true NULL on both sides still agrees
    status, _ = vl.stream_compare(
        df, con, "SELECT CAST(NULL AS VARCHAR) AS s, 0 AS k"
    )
    assert status == []


def test_stream_compare_pipe_boundary_not_aliased(spark, vl, con):
    """r10 advice: cells are joined with '|', so without escaping the
    rows ('a|b','c') and ('a','b|c') rendered to the same bytes and a
    compensating cross-engine divergence would cancel in the
    commutative sum."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit("a|b").alias("s1"), F.lit("c").alias("s2")
    )
    status, _ = vl.stream_compare(
        df, con, "SELECT 'a' AS s1, 'b|c' AS s2"
    )
    assert status == ["stream value-hash mismatch"]
    status, _ = vl.stream_compare(
        df, con, "SELECT 'a|b' AS s1, 'c' AS s2"
    )
    assert status == []


def test_stream_compare_inf_and_macro_grid(spark, vl, con):
    """r10 advice: ±Infinity and |x| >= 9.2e12 used to crash the DuckDB
    side (BIGINT cast of an out-of-range floor) while Spark saturated.
    Now Inf renders as a token and the 9.2e12..9.2e24 band uses an
    'M'-prefixed floor(x/1e6) macro grid — cross-engine agreement holds
    and a 1e7 shift at 1.5e13 is still DETECTED (no 'OVR' blind spot)."""
    from pyspark.sql import functions as F

    df = spark.range(4).select(
        F.col("id").alias("k"),
        F.expr(
            "CASE WHEN id = 0 THEN CAST('Infinity' AS DOUBLE) "
            "WHEN id = 1 THEN CAST('-Infinity' AS DOUBLE) "
            "WHEN id = 2 THEN CAST(1.5e13 AS DOUBLE) "
            "ELSE CAST(5.0e12 AS DOUBLE) END"
        ).alias("x"),
    )
    good = (
        "SELECT k, CASE WHEN k = 0 THEN CAST('Infinity' AS DOUBLE) "
        "WHEN k = 1 THEN CAST('-Infinity' AS DOUBLE) "
        "WHEN k = 2 THEN 1.5e13 ELSE 5.0e12 END AS x FROM range(4) t(k)"
    )
    status, detail = vl.stream_compare(df, con, good)
    assert status == []
    assert detail == {"rows": 4}
    bad = good.replace("1.5e13", "1.5001e13")  # +1e9 -> +1000 macro cells
    status, _ = vl.stream_compare(df, con, bad)
    assert status == ["stream value-hash mismatch"]


def test_stream_compare_empty_results_pass(spark, vl, con):
    from pyspark.sql import functions as F

    df = spark.range(1).filter("id < 0").select(F.col("id").alias("k"))
    status, detail = vl.stream_compare(
        df, con, "SELECT k FROM range(0) t(k)"
    )
    assert status == []
    assert detail == {"rows": 0}
