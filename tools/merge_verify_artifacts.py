"""Merge partial verify_local --json artifacts into one canonical
per-round file.

Big-replica sweeps run in several sessions/processes (a replica rebuild
after /tmp cleanup, reordered resumes after a fix, a final fixup batch),
each leaving its own partial artifact. This combines them: later parts
win per query (a re-run after a fix supersedes the recorded failure),
and the merged file carries two honesty fields the single-run schema
doesn't need:

- ``excluded``: query -> one-line reason, for queries deliberately not
  run at this scale (e.g. brute-force-quadratic eval baselines whose
  DuckDB replay is O(n^2) by design) — the no-silent-caps rule applies
  to verification sweeps too;
- ``not_reached``: registry entries with no row in any part and no
  exclusion (ran out of wall budget) — distinct from a pass OR a fail.

Usage:
  python tools/merge_verify_artifacts.py OUT.json part1.json part2.json \
      [--exclude name=reason ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def main() -> None:
    args = sys.argv[1:]
    out = args[0]
    parts, excludes = [], {}
    for a in args[1:]:
        if a.startswith("--exclude"):
            continue
        if "=" in a and not a.endswith(".json"):
            name, reason = a.split("=", 1)
            excludes[name] = reason
        else:
            parts.append(a)

    queries: dict[str, dict] = {}
    sf_dir = None
    for p in parts:
        with open(p) as f:
            d = json.load(f)
        sf_dir = d.get("sf_dir", sf_dir)
        queries.update(d.get("queries", {}))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rag_content_spark import queries as Q

    registry = list(Q.QUERIES)
    not_reached = [
        n for n in registry if n not in queries and n not in excludes
    ]
    n_pass = sum(1 for r in queries.values() if r.get("status") == "pass")
    n_fail = sum(1 for r in queries.values() if r.get("status") == "fail")
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        head = None
    merged = {
        "sf_dir": sf_dir,
        "git_head": head,
        "complete": not not_reached and n_fail == 0,
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_rows_only": sum(
            1 for r in queries.values() if r.get("status") == "rows_only"
        ),
        "n_registry": len(registry),
        "excluded": excludes,
        "not_reached": not_reached,
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(
        f"{out}: {n_pass} pass / {n_fail} fail / "
        f"{len(excludes)} excluded / {len(not_reached)} not reached "
        f"(registry {len(registry)})"
    )


if __name__ == "__main__":
    main()
