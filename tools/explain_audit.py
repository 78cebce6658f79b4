"""Physical-plan audit: for each headline query, report scan column
pruning (ReadSchema), pushed filters, join strategies, and exchange
count — the properties that decide whether a plan survives a 100x
scale-up.

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(name: str, df) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    ) if False else df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    scans = re.findall(r"ReadSchema: (\S+)", plan)
    pushed = re.findall(r"PushedFilters: (\[[^\]]*\])", plan)
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)
    exchanges = len(re.findall(r"\n\s*(?:\(\d+\) )?Exchange", plan))
    # formatted mode tags codegen stages as "[codegen id : N]"
    codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
    print(f"== {name}")
    for s in scans:
        print(f"   scan: {s[:110]}")
    for p in set(pushed):
        if p != "[]":
            print(f"   pushed: {p[:110]}")
    from collections import Counter

    if joins:
        print(f"   joins: {dict(Counter(joins))}")
    print(f"   exchanges: {exchanges}, codegen spans: {codegen}")


def main() -> None:
    from rag_content_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-audit", shuffle_partitions=8)
    only = sys.argv[1:]
    queries = entrymod.queries()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            audit(name, fn(spark, sf_dir))
        except Exception as exc:
            print(f"== {name}: ERROR {exc}")


if __name__ == "__main__":
    main()
