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


def normalized_rows(df: pd.DataFrame) -> pd.Series:
    """One canonical string per row (columns sorted by name, cells
    normalized exactly as ``_norm_cell``: floats rounded to 6 and
    %.6f-formatted, None/NaN -> NULL, arrays flattened), returned SORTED.

    Column-vectorized replacement for the old per-row
    ``astype(str).agg(join, axis=1)`` + itertuples-md5 pair, which ran
    at ~3k rows/s and dominated the wall clock of large-SF sweeps
    (15M-row results at the 100x replica). Cell semantics are
    unchanged — only the row-ORDERING key switched from raw
    ``astype(str)`` to the normalized strings themselves, which is
    equivalent for comparison (any deterministic content-only key
    sorts equal frames identically; full-key ties are identical rows).
    """
    df = df[sorted(df.columns)]
    if len(df) == 0:
        return pd.Series([], dtype=object)
    parts = []
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            parts.append(s.map(_norm_cell))
        elif s.dtype.kind == "f":
            # replicate the old two-step exactly: numpy round(6) at the
            # frame level, then the python round + %.6f of _norm_scalar
            parts.append(s.round(6).map(_norm_scalar))
        else:  # ints/bools/datetimes: str(v) == astype(str)
            parts.append(s.astype(str))
    key = parts[0].astype(str)
    if len(parts) > 1:
        key = key.str.cat([p.astype(str) for p in parts[1:]], sep="|")
    return key.sort_values(ignore_index=True)


# ---------------------------------------------------------------------------
# Engine-side streaming compare (round-9 verdict task 1): for queries
# whose RESULT is corpus-linear (95-150M rows at ~sf100), materializing
# both sides into pandas is the verify bottleneck, not the engines.
# Instead each engine computes (count, sum(h1), sum(h2)) over a CANONICAL
# row string — columns in sorted-name order joined with '|', cells
# rendered identically on both engines — where h1/h2 are the first/second
# 60-bit halves of md5(row_str). The sums are order-insensitive
# (commutative), so no engine sorts anything and only three scalars cross
# the process boundary. Cell rendering is deliberately engine-neutral:
# floats go through floor(x*1e6 + 0.5) (identical IEEE ops on both
# engines — no printf / round() engine semantics involved), decimals are
# normalized to DECIMAL(38,9) strings, timestamps to a fixed
# microsecond format.
#
# Aliasing safety (r10 advice): the md5-halves sums are COMMUTATIVE, so
# two compensating per-row divergences could cancel if distinct
# (row, null-state) contents could render to identical bytes. Three
# guards close every such channel:
#   * string cells escape '\' -> '\\' then '|' -> '\|', so the '|'
#     column delimiter never appears raw inside a cell;
#   * NULL renders as the single token '\N' in EVERY cell type — after
#     escaping, a real string cell can never equal '\N' (its backslash
#     would be doubled), and no numeric/date rendering emits '\';
#   * DOUBLE renders ±Infinity as 'Inf'/'-Inf'; at |x| >= 9.2e12 (the
#     micro-grid's 2^63/1e6 exactness ceiling, where Spark's non-ANSI
#     floor-cast saturates to Long.MAX but DuckDB's CAST raises) it
#     switches to an 'M'-prefixed MACRO grid floor(x/1e6) — one
#     correctly-rounded IEEE division on both engines, exact to
#     |x| < 9.2e24 — and 'OVR' beyond that; magnitude overflow becomes
#     a reportable value mismatch, not a query crash, without the
#     detection blind spot a bare overflow token would open (two
#     DIFFERENT huge values both rendering 'OVR' would compare equal).

_NULL_TOK = r"\N"


def _duck_cell(col: str, typ: str) -> str:
    t = typ.upper()
    q = f'"{col}"'
    if t in ("DOUBLE", "FLOAT", "REAL"):
        # micro-grid int rendering is exact for |x| < 2^63/1e6 ~ 9.2e12;
        # a DOUBLE column beyond that magnitude is already
        # rendering-divergent on the pandas path too (the r9
        # forecast_revenue lesson) and must be a DECIMAL string instead
        return (
            f"CASE WHEN {q} IS NULL THEN '{_NULL_TOK}' "
            f"WHEN isnan({q}) THEN 'NaN' "
            f"WHEN isinf({q}) THEN (CASE WHEN {q} > 0 THEN 'Inf' ELSE '-Inf' END) "
            f"WHEN abs({q}) >= 9.2e24 THEN 'OVR' "
            f"WHEN abs({q}) >= 9.2e12 THEN "
            f"'M' || CAST(CAST(floor({q} / 1e6) AS BIGINT) AS VARCHAR) "
            f"ELSE CAST(CAST(floor({q} * 1e6 + 0.5) AS BIGINT) AS VARCHAR) END"
        )
    if t.startswith("DECIMAL"):
        return (
            f"coalesce(CAST(CAST({q} AS DECIMAL(38,9)) AS VARCHAR), "
            f"'{_NULL_TOK}')"
        )
    if t.startswith("TIMESTAMP"):
        return (
            f"coalesce(strftime({q}, '%Y-%m-%d %H:%M:%S.%f'), '{_NULL_TOK}')"
        )
    if t == "VARCHAR":
        return (
            f"coalesce(replace(replace({q}, '\\', '\\\\'), '|', '\\|'), "
            f"'{_NULL_TOK}')"
        )
    if any(
        t.startswith(p)
        for p in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
                  "UBIGINT", "UINTEGER", "BOOLEAN", "DATE")
    ):
        return f"coalesce(CAST({q} AS VARCHAR), '{_NULL_TOK}')"
    raise ValueError(f"stream-hash: unsupported DuckDB type {typ} for {col}")


def _spark_cell(col: str, dt):
    from pyspark.sql import functions as F
    import pyspark.sql.types as T

    c = F.col(col)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        rendered = F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("bigint").cast(
            "string"
        )
        return (
            F.when(c.isNull(), F.lit(_NULL_TOK))
            .when(F.isnan(c), F.lit("NaN"))
            .when(c == F.lit(float("inf")), F.lit("Inf"))
            .when(c == F.lit(float("-inf")), F.lit("-Inf"))
            .when(F.abs(c) >= F.lit(9.2e24), F.lit("OVR"))
            .when(
                F.abs(c) >= F.lit(9.2e12),
                F.concat(
                    F.lit("M"),
                    F.floor(c / F.lit(1e6)).cast("bigint").cast("string"),
                ),
            )
            .otherwise(rendered)
        )
    if isinstance(dt, T.DecimalType):
        return F.coalesce(
            c.cast("decimal(38,9)").cast("string"), F.lit(_NULL_TOK)
        )
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.coalesce(
            F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit(_NULL_TOK)
        )
    if isinstance(dt, T.StringType):
        escaped = F.replace(
            F.replace(c, F.lit("\\"), F.lit("\\\\")), F.lit("|"), F.lit("\\|")
        )
        return F.coalesce(escaped, F.lit(_NULL_TOK))
    if isinstance(
        dt,
        (T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.BooleanType,
         T.DateType),
    ):
        return F.coalesce(c.cast("string"), F.lit(_NULL_TOK))
    raise ValueError(f"stream-hash: unsupported Spark type {dt} for {col}")


def stream_compare(sdf, con, oracle: str) -> tuple[list, dict]:
    """Order-insensitive engine-side compare. Returns (mismatch list,
    detail dict with row counts)."""
    from pyspark.sql import functions as F

    scols = sorted(sdf.columns)
    desc = con.execute(f"DESCRIBE {oracle}").fetchall()
    dtypes = {r[0]: r[1] for r in desc}
    ocols = sorted(dtypes)
    if scols != ocols:
        return [f"cols {scols} != {ocols}"], {}

    row = F.concat_ws(
        "|", *[_spark_cell(c, sdf.schema[c].dataType) for c in scols]
    )
    h = F.md5(row.cast("binary"))
    agg = (
        sdf.select(h.alias("_h"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(
                F.conv(F.substring("_h", 1, 15), 16, 10).cast("decimal(38,0)")
            ).alias("s1"),
            F.sum(
                F.conv(F.substring("_h", 17, 15), 16, 10).cast("decimal(38,0)")
            ).alias("s2"),
        )
        .collect()[0]
    )
    cells = ", ".join(_duck_cell(c, dtypes[c]) for c in scols)
    osql = (
        f"WITH _q AS ({oracle}), _r AS "
        f"(SELECT md5(concat_ws('|', {cells})) AS _h FROM _q) "
        f"SELECT count(*) AS c, "
        f"sum(CAST(CAST('0x' || substring(_h, 1, 15) AS UBIGINT) AS HUGEINT)) AS s1, "
        f"sum(CAST(CAST('0x' || substring(_h, 17, 15) AS UBIGINT) AS HUGEINT)) AS s2 "
        f"FROM _r"
    )
    oc, os1, os2 = con.execute(osql).fetchone()
    status = []
    if int(agg["c"]) != int(oc):
        status.append(f"rows {agg['c']} != {oc}")
    elif (
        (agg["s1"] is None) != (os1 is None)
        or (agg["s1"] is not None and int(agg["s1"]) != int(os1))
        or (agg["s2"] is None) != (os2 is None)
        or (agg["s2"] is not None and int(agg["s2"]) != int(os2))
    ):
        status.append("stream value-hash mismatch")
    return status, {"rows": int(agg["c"])}


def value_hash(rows: pd.Series) -> str:
    """md5 over the sorted normalized row strings (chunked — a 15M-row
    frame's joined bytes would be GBs)."""
    import hashlib

    h = hashlib.md5()
    for start in range(0, len(rows), 100_000):
        h.update("\n".join(rows.iloc[start : start + 100_000]).encode())
        h.update(b"\n")
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
    scale_safe_only = "--scale-safe-only" in args or (
        os.environ.get("SPARK_GRAFT_SCALE_SAFE_ONLY") == "1"
    )
    stream_hash = "--stream-hash" in args or (
        os.environ.get("SPARK_GRAFT_STREAM_HASH") == "1"
    )
    args = [a for a in args if a not in ("--scale-safe-only", "--stream-hash")]
    only = set(args)
    results: dict[str, dict] = {}

    # 8 partitions suits the sf0.01 default; big-replica sweeps (60M-row
    # lineitem at the 100x replica) override via env
    n_shuffle = int(os.environ.get("SPARK_GRAFT_VERIFY_SHUFFLE", "8"))
    spark = get_spark("verify-local", shuffle_partitions=n_shuffle)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if os.environ.get("SPARK_GRAFT_VERIFY_ARROW") == "1":
        # Arrow-batched toPandas: collect-side speedup for multi-million
        # row results; cell values are identical for this repo's types
        # (validated by a full green sf0.01 run with the flag on)
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # row order never matters to the compare (the pandas path sorts,
    # the stream path is commutative): dropping order preservation
    # lets big-replica oracles stream instead of buffering, cutting
    # the spill high-water mark (the doremi 400M-row bigram CTE filled
    # the disk with it on)
    con.execute("SET preserve_insertion_order=false")
    # big-replica sweeps share the box with the Spark JVM (and whatever
    # else runs): give DuckDB an explicit budget + a spill directory so
    # a list-heavy oracle spills instead of dying on a transient
    # "bad allocation" when another process spikes
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "48GB")
    # per-process default: DuckDB temp files are named per-connection
    # (duckdb_temp_storage-N.tmp), so two processes sharing a spill dir
    # delete each other's blocks mid-query
    spill = os.environ.get(
        "SPARK_GRAFT_ORACLE_SPILL", f"/tmp/duckdb_spill_{os.getpid()}"
    )
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{spill}'")
    # per-thread join/sort buffers scale peak memory with thread count:
    # a giant-oracle retry can trade wall time for a lower high-water
    # mark (doremi_weights' 40M x 40M string join at the 100x replica)
    threads = os.environ.get("SPARK_GRAFT_ORACLE_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    try:
        return _run(
            entrymod, spark, con, sf_dir, args, only, json_out, results,
            scale_safe_only, stream_hash,
        )
    finally:
        # cleanup must run even when a query raises or the sweep is
        # killed mid-run — leaked /tmp/duckdb_spill_<pid> dirs were
        # accumulating across crashed runs (r9 advice)
        try:
            con.close()
        except Exception:
            pass
        if "SPARK_GRAFT_ORACLE_SPILL" not in os.environ:
            import shutil

            shutil.rmtree(spill, ignore_errors=True)


def _run(
    entrymod, spark, con, sf_dir, args, only, json_out, results,
    scale_safe_only=False, stream_hash=False,
) -> int:
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    try:
        from rag_content_spark.queries import NOT_SCALE_SAFE, STREAM_HASH
    except Exception:
        NOT_SCALE_SAFE, STREAM_HASH = set(), set()
    n_pass = n_fail = 0

    def _dump(final: bool) -> None:
        # incremental per-query flush: a killed / out-of-budget sweep
        # still leaves a readable artifact of everything that finished
        if not json_out:
            return
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
        tmp = json_out + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "git_head": head,
                    "complete": final,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": sum(
                        1 for r in results.values() if r["status"] == "rows_only"
                    ),
                    "n_skipped_not_scale_safe": sum(
                        1
                        for r in results.values()
                        if r["status"] == "skipped_not_scale_safe"
                    ),
                    "queries": results,
                },
                f,
                indent=1,
            )
        os.replace(tmp, json_out)

    # args (when given) define the EXECUTION ORDER, not just the subset —
    # big-replica sweeps run cheap queries first so a wall-clock budget
    # maximizes coverage
    ordered = [n for n in args if n in queries] if args else list(queries)
    for name in ordered:
        fn = queries[name]
        if only and name not in only:
            continue
        if scale_safe_only and name in NOT_SCALE_SAFE:
            # tier skip, recorded in the artifact so sweeps carry no
            # ad-hoc exclusion lists: the registry itself says which
            # plans are deliberate small-SF-only exact baselines
            print(f"SKIP {name}: not scale-safe (registry tier)")
            results[name] = {"status": "skipped_not_scale_safe"}
            _dump(final=False)
            continue
        t0 = time.time()
        if stream_hash and name in STREAM_HASH and name in oracles:
            # corpus-linear result: compare engine-side commutative
            # hashes (three scalars) instead of two pandas frames
            try:
                status, detail = stream_compare(
                    fn(spark, sf_dir), con, oracles[name]
                )
            except Exception as exc:
                print(f"FAIL {name}: stream error: {exc}")
                results[name] = {
                    "status": "fail", "err": f"stream error: {exc}"[:500]
                }
                n_fail += 1
                _dump(final=False)
                continue
            took = round(time.time() - t0, 1)
            if status:
                print(f"FAIL {name}: {'; '.join(status)}  [{took}s]")
                results[name] = {
                    "status": "fail", "err": "; ".join(status)[:500]
                }
                n_fail += 1
            else:
                print(
                    f"PASS {name}: {detail['rows']} rows (stream)  [{took}s]"
                )
                results[name] = {
                    "status": "pass",
                    "rows": detail["rows"],
                    "mode": "stream_hash",
                    "s": took,
                }
                n_pass += 1
            _dump(final=False)
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            results[name] = {"status": "fail", "err": f"spark error: {exc}"[:500]}
            n_fail += 1
            _dump(final=False)
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            results[name] = {
                "status": "rows_only",
                "rows": len(sdf),
                "s": round(time.time() - t0, 1),
            }
            _dump(final=False)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            results[name] = {"status": "fail", "err": f"oracle error: {exc}"[:500]}
            n_fail += 1
            _dump(final=False)
            continue
        status = []
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if len(sdf) != len(odf):
            status.append(f"rows {len(sdf)} != {len(odf)}")
        if scols != ocols:
            status.append(f"cols {scols} != {ocols}")
        if not status:
            ns, no = normalized_rows(sdf), normalized_rows(odf)
            if value_hash(ns) != value_hash(no):
                status.append("value-hash mismatch")
                diff = ns.values != no.values
                i = int(np.argmax(diff))
                print(
                    f"  first diff row {i}:\n   spark: {ns.iloc[i][:400]}"
                    f"\n   duck : {no.iloc[i][:400]}"
                )
        if status:
            print(f"FAIL {name}: {'; '.join(status)}  [{time.time()-t0:.1f}s]")
            results[name] = {"status": "fail", "err": "; ".join(status)[:500]}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            results[name] = {
                "status": "pass",
                "rows": len(sdf),
                "s": round(time.time() - t0, 1),
            }
            n_pass += 1
        _dump(final=False)
    print(f"\n{n_pass} passed, {n_fail} failed")
    _dump(final=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
