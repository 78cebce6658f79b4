"""Honest-compute sweep: time EVERY registered query with the noop sink
(guide §1.4 — bench.py's `.count()` lets Catalyst prune projection-only
heavy columns; the noop sink forces every output column), min-of-2 in one
warm session. Output: one JSON object {query: seconds} to stdout or FILE.

Usage: python tools/noop_sweep.py [FILE] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from rag_content_spark.session import get_spark, warm_python_workers

    import __spark_entry__ as entrymod

    args = sys.argv[1:]
    out = args[0] if args and (args[0].endswith(".json") or args[0] == "-") else "-"
    names = args[1:] if out != "-" else args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("noop-sweep")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    warm_python_workers(spark)

    queries = entrymod.queries()
    todo = names or list(queries)
    timings: dict[str, float] = {}
    for name in todo:
        fn = queries.get(name)
        if fn is None:
            continue
        best = None
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{timings[name]:8.3f}s  {name}", file=sys.stderr, flush=True)

    blob = json.dumps(timings, indent=1)
    if out == "-":
        print(blob)
    else:
        with open(out, "w") as f:
            f.write(blob)


if __name__ == "__main__":
    main()
