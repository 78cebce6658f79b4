"""Strictly-interleaved quiet-box A/B bench of two repo checkouts —
the round-9 adjudication protocol, scripted (round-10 verdict task 3):
alternating invocations (A, B, A, B, ...), N reps per side, each rep a
FRESH process/JVM running `python bench.py <queries...>` in its own
tree, nothing else on the box (check `uptime` before trusting output).

Usage:
  python tools/ab_bench.py TREE_A TREE_B N query [query ...]
Prints one JSON line per rep as it lands, then a per-query summary:
  {"query": ..., "a_median": ..., "b_median": ..., "a_min": ...,
   "b_min": ..., "a_all": [...], "b_all": [...]}
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_rep(tree: str, queries: list[str]) -> dict:
    r = subprocess.run(
        [sys.executable, "bench.py", *queries],
        cwd=tree, capture_output=True, text=True, timeout=3600,
        env=dict(os.environ),
    )
    # the JSON line can share a physical line with \r progress output —
    # find the last '{"metric' and parse to end-of-line from there
    out = r.stdout.replace("\r", "\n")
    i = out.rfind('{"metric')
    if i >= 0:
        try:
            return json.loads(out[i:].splitlines()[0])["queries"]
        except Exception:
            pass
    raise RuntimeError(
        f"no bench JSON from {tree}: rc={r.returncode}\n{r.stderr[-800:]}"
    )


def main() -> int:
    tree_a, tree_b, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    queries = sys.argv[4:]
    sides: dict[str, dict[str, list[float]]] = {
        "A": {q: [] for q in queries}, "B": {q: [] for q in queries}
    }
    for rep in range(n):
        for side, tree in (("A", tree_a), ("B", tree_b)):
            t = run_rep(tree, queries)
            for q in queries:
                if q in t:
                    sides[side][q].append(t[q])
            print(json.dumps({"rep": rep, "side": side, "timings": t}),
                  flush=True)
    for q in queries:
        a, b = sides["A"][q], sides["B"][q]
        if not a or not b:
            continue
        print(json.dumps({
            "query": q,
            "a_median": round(statistics.median(a), 3),
            "b_median": round(statistics.median(b), 3),
            "a_min": round(min(a), 3), "b_min": round(min(b), 3),
            "a_all": a, "b_all": b,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
