"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns, floats normalized).

Usage: python tools/verify_local.py [--json OUT.json] [query_name ...]

--json writes a per-query artifact (status/rows/seconds + pass/fail
totals) — the per-round protocol is one full run committed as
VERIFY_LOCAL_rN.json, so every round records the WHOLE registry rather
than depending on the driver's 50-query prefix sample for the rest.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df) == 0:
        # 0-row agg below returns a DataFrame (not a Series) and crashes
        return df.reset_index(drop=True)
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            df[col] = s.map(_norm_cell)
        elif s.dtype.kind == "f":
            df[col] = s.round(6)
        elif str(s.dtype).startswith("datetime"):
            df[col] = s.astype(str)
    key = df.astype(str).agg("|".join, axis=1)
    return df.loc[key.sort_values().index].reset_index(drop=True)


def _norm_cell(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_scalar(x) for x in v) + "]"
    return _norm_scalar(v)


def _norm_scalar(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (float, np.floating)):
        return f"{round(float(v), 6):.6f}"
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(("|".join(_norm_cell(v) for v in row)).encode())
    return h.hexdigest()


def main() -> int:
    from rag_content_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    # lazy oracles embed data-derived literals — pin them to the SF this
    # run compares against (the driver's gate runs at the sf0.01 default)
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = set(args)
    results: dict[str, dict] = {}

    spark = get_spark("verify-local", shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            results[name] = {"status": "fail", "err": f"spark error: {exc}"[:500]}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            results[name] = {
                "status": "rows_only",
                "rows": len(sdf),
                "s": round(time.time() - t0, 1),
            }
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            results[name] = {"status": "fail", "err": f"oracle error: {exc}"[:500]}
            n_fail += 1
            continue
        ns, no = normalize(sdf), normalize(odf)
        status = []
        if len(ns) != len(no):
            status.append(f"rows {len(ns)} != {len(no)}")
        if list(ns.columns) != list(no.columns):
            status.append(f"cols {list(ns.columns)} != {list(no.columns)}")
        if not status:
            hs, ho = value_hash(ns), value_hash(no)
            if hs != ho:
                status.append("value-hash mismatch")
                # show first differing row for debugging
                for i in range(len(ns)):
                    a = "|".join(_norm_cell(v) for v in ns.iloc[i])
                    b = "|".join(_norm_cell(v) for v in no.iloc[i])
                    if a != b:
                        print(f"  first diff row {i}:\n   spark: {a[:400]}\n   duck : {b[:400]}")
                        break
        if status:
            print(f"FAIL {name}: {'; '.join(status)}  [{time.time()-t0:.1f}s]")
            results[name] = {"status": "fail", "err": "; ".join(status)[:500]}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(ns)} rows  [{time.time()-t0:.1f}s]")
            results[name] = {
                "status": "pass",
                "rows": len(ns),
                "s": round(time.time() - t0, 1),
            }
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if json_out:
        import json as _json
        import subprocess as _sp

        try:
            head = _sp.run(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
        except Exception:
            head = None
        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "git_head": head,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": sum(
                        1 for r in results.values() if r["status"] == "rows_only"
                    ),
                    "queries": results,
                },
                f,
                indent=1,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
