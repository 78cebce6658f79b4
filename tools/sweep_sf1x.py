"""Build a 10x replica of sf0.1 (~sf1) with TYPE-EXACT parquet via
DuckDB — the driver ships no sf1 testdata, and Spark-side replication
would rewrite events' TIMESTAMP_NS as BIGINT (nanosAsLong) and break
oracle parity. Fact tables replicate with shifted keys, dims copy
verbatim — same key-shift scheme as tools/scale_probe.py.

Usage: python tools/sweep_sf1x.py [dst_dir] [n]
Then:  SPARK_GRAFT_SF_DIR=<dst> SPARK_GRAFT_ORACLE_SF_DIR=<dst> \
         python tools/verify_local.py --json VERIFY_LOCAL_r08_sf1x.json
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.1"


def build(dst: str, n: int = 10) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def rep(table: str, select: str) -> None:
        con.execute(
            f"COPY (SELECT {select} "
            f"FROM read_parquet('{SRC}/{table}.parquet') "
            f"CROSS JOIN range({n}) r ORDER BY 1) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )

    rep(
        "documents",
        "doc_id + r.range * 100000 AS doc_id, text, lang, source, n_chars",
    )
    rep(
        "embeddings",
        "vec_id + r.range * 100000 AS vec_id, embedding, label",
    )
    rep(
        "orders",
        "o_orderkey + r.range * 10000000 AS o_orderkey, "
        "o_custkey + r.range * 1000000 AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    rep(
        "customer",
        "c_custkey + r.range * 1000000 AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment",
    )
    li_cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/lineitem.parquet')"
        ).fetchall()
    ]
    rest = ", ".join(c for c in li_cols if c != "l_orderkey")
    rep(
        "lineitem",
        f"l_orderkey + r.range * 10000000 AS l_orderkey, {rest}",
    )
    rep(
        "events",
        "event_id + r.range * 10000000 AS event_id, ts, "
        "user_id + r.range * 1000000 AS user_id, event_type, value, props",
    )
    for small in ("part", "supplier", "nation", "region"):
        shutil.copy(f"{SRC}/{small}.parquet", f"{dst}/{small}.parquet")
    con.close()


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_sf1x"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(dst, n)
    print(f"built {dst} (x{n})")
