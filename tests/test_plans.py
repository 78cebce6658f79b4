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


# --- no corpus-sized unpartitioned windows -------------------------------

BOUNDING = {
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "LocalLimit",
    "LocalTableScan",
}


def _tree_nodes(plan):
    """[(depth, name, id)] from the formatted plan's tree section."""
    out = []
    for ln in plan.split("\n\n")[0].splitlines():
        m = re.match(r"^([ :+\-*]*)(\w+)[^(]*\((\d+)\)\s*$", ln)
        if m:
            out.append((len(m.group(1)), m.group(2), int(m.group(3))))
    return out


def _bracket_groups(s):
    groups, depth, cur = [], 0, ""
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(cur)
                continue
        if depth >= 1:
            cur += ch
    return groups


def _unpartitioned_window_ids(plan):
    ids = []
    for m in re.finditer(
        r"\((\d+)\) Window\n(?:Input[^\n]*\n)?Arguments: ([^\n]*)", plan
    ):
        groups = _bracket_groups(m.group(2))
        # Window args: [exprs], [partition spec], [order spec]; when
        # unpartitioned the 2nd group is the ORDER spec (ASC/DESC) or
        # empty (unordered frame over the whole input)
        if len(groups) >= 2:
            second = groups[1]
            if second.strip() == "" or re.search(r"\b(ASC|DESC)\b", second):
                ids.append(int(m.group(1)))
    return ids


def _window_is_bounded(plan, win_id):
    nodes = _tree_nodes(plan)
    idx = next(i for i, (_, n, nid) in enumerate(nodes) if nid == win_id)
    depth = nodes[idx][0]
    subtree = []
    for d, name, nid in nodes[idx + 1 :]:
        if d <= depth:
            break
        subtree.append(name)
    has_scan = any(n == "Scan" for n in subtree)
    has_bound = any(n in BOUNDING for n in subtree)
    return has_bound or not has_scan


GLOBAL_WINDOW_FIXED = [
    # each of these used to funnel the corpus through ONE window task;
    # now every unpartitioned Window must sit above a bounded input
    # (TakeOrdered/limit) — new corpus-sized global windows are a bug
    "rrf_hybrid",
    "ccnet_buckets",
    "id_gaps",
    "median_latency",
    "balance_rank_profile",
    "skew_report",
    "bpe_tokenize",
    "important_stock",
    "equi_depth_hist",
    "training_manifest",
]

# Registry-wide sweep result (r7): the ONLY unpartitioned windows over
# scan-rooted subtrees outside this list are `weekly_growth` (lag over
# the per-WEEK aggregate — cardinality bounded by the time span) and
# `quantile_sketch` (cumulative sum over the <=512-bucket sketch) —
# both windows over BOUNDED-DOMAIN aggregates, which a static detector
# cannot distinguish from corpus-sized inputs. Zero BatchEvalPython and
# zero CartesianProduct across all 187 registered queries in the same
# sweep. (`doc_keywords`, added after the sweep, audited clean in
# PLANS.md: both its windows are key-partitioned, joins are the
# one-row stats broadcast.)


@pytest.mark.parametrize("name", GLOBAL_WINDOW_FIXED)
def test_no_corpus_sized_unpartitioned_windows(spark, name):
    plan = _plan(spark, name)
    bad = [
        w
        for w in _unpartitioned_window_ids(plan)
        if not _window_is_bounded(plan, w)
    ]
    assert not bad, f"{name}: unbounded global window node(s) {bad}\n{plan[:2000]}"
