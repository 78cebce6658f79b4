"""Physical-plan invariants: the properties that decide 100x scale
survival, pinned so a refactor cannot silently regress them.

Checks the STATIC plan (pre-AQE): narrow queries must stay
zero-exchange; joins meant to broadcast must not plan a cartesian
product; scans must prune to the referenced columns.
"""

import re

import pytest

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    from rag_content_spark import queries as Q

    df = Q.QUERIES[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _exchanges(plan):
    return len(re.findall(r"\n\s*(?:\(\d+\) )?Exchange", plan))


NARROW = [
    "chunk_fixed",      # explode is narrow
    "fim_split",        # token-slice algebra
    "chat_turns",       # line explode
    "script_profile",   # regexp counts
    "text_normalize",
    "gopher_quality",
    "lang_id",
    "mock_embed",
]


@pytest.mark.parametrize("name", NARROW)
def test_narrow_queries_have_zero_exchanges(spark, name):
    plan = _plan(spark, name)
    assert _exchanges(plan) == 0, f"{name} gained a shuffle:\n{plan[:1500]}"


def test_no_cartesian_products_anywhere_headline(spark):
    # broadcast one-row/bounded builds are fine (BroadcastNestedLoopJoin);
    # a CartesianProduct in a registered query is always a bug
    for name in [
        "volume_shipping",
        "national_market_share",
        "top_supplier",
        "large_volume_customers",
        "waiting_suppliers",
        "hybrid_search",
        "retrieval_metrics",
    ]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_tpch_shapes_broadcast_their_dims(spark):
    for name in ["volume_shipping", "national_market_share"]:
        plan = _plan(spark, name)
        assert plan.count("BroadcastHashJoin") >= 4, name
        assert plan.count("SortMergeJoin") <= 1, name


def test_scan_pruning_metadata_only_query(spark):
    # a query that never touches the wide embedding column must not
    # scan it
    plan = _plan(spark, "corpus_counts")
    for m in re.findall(r"ReadSchema: (\S+)", plan):
        assert "embedding" not in m, plan[:1200]


def test_no_python_row_udfs_in_headline_plans(spark):
    # BatchEvalPython = row-at-a-time Python UDF (the slow path);
    # ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas are the
    # sanctioned vectorized surfaces
    for name in ["build_pipeline", "chunk_llama", "semdedup", "dsir_weights"]:
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
