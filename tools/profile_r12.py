"""Round-12 build/exec split profiler: for every registered query, time
(a) the builder call `fn(spark, sf_dir)` — plan construction plus any
eager within-query materialization (localCheckpoints, iteration loops) —
and (b) the `.count()` action on the returned frame, in one warm
session, 2 reps, min per phase. Output: JSON {name: [build_s, exec_s]}.

Usage: python tools/profile_r12.py [out.json] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entrymod

    from rag_content_spark.session import get_spark, warm_python_workers

    args = sys.argv[1:]
    out_path = args[0] if args and args[0].endswith(".json") else "/tmp/build_split_r12.json"
    names = [a for a in args if not a.endswith(".json")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-r12")
    warm_python_workers(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    queries = entrymod.queries()
    sel = names or list(queries)
    out: dict[str, list[float]] = {}
    for name in sel:
        fn = queries.get(name)
        if fn is None:
            continue
        bb = ee = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            b = time.time() - t0
            t0 = time.time()
            df.count()
            e = time.time() - t0
            bb = b if bb is None else min(bb, b)
            ee = e if ee is None else min(ee, e)
        out[name] = [round(bb, 3), round(ee, 3)]
        print(f"{name:30s} build={bb:6.2f} exec={ee:6.2f}", flush=True)
    json.dump(out, open(out_path, "w"), indent=1)
    tb = sum(v[0] for v in out.values())
    te = sum(v[1] for v in out.values())
    print(f"TOTAL build={tb:.1f} exec={te:.1f}")


if __name__ == "__main__":
    main()
