"""Build an n-times replica of sf0.1 (~sf1 at n=10, ~sf10 at n=100)
with TYPE-EXACT parquet via DuckDB — the driver ships no bigger
testdata, and Spark-side replication would rewrite events' TIMESTAMP_NS
as BIGINT (nanosAsLong) and break oracle parity. Fact tables replicate
with shifted keys, dims copy verbatim — same key-shift scheme as
tools/scale_probe.py.

At n >= 20 the builder DECORRELATES cross-replica duplicate structure
(replica 0 always stays verbatim):

- documents.text: every token gets a ``~<r>`` suffix per replica, so
  replicas are neither exact nor near duplicates of each other
  (whitespace tokenization keeps one token per token; shingle and
  MinHash signatures become independent across replicas);
- embeddings: labels shift by ``r*1000`` and vectors rotate by ``r mod
  dim`` (negated for r >= dim), so label-blocked and LSH-bucketed pair
  queries see base-sized groups.

Why: a VERBATIM 100x replica puts ~100 identical copies of every text
in every LSH band bucket — each pair-enumeration query then emits
C(100,2)/content ~ 25M candidate pairs, a 10,000x (quadratic) blowup
that measures the degenerate-duplication regime, not scale. That regime
is probed separately (tools/probe_degenerate.py drives 100k identical
docs through the capped path); the big-replica sweep's job is finding
SCALE boundary bugs (overflow, rounding, partition edges) in all 196
queries, which needs 100x the rows with realistic (non-pathological)
group sizes. The key stride also widens to 10M so synthesized twin ids
(+1M..+5M in the dedup queries) never collide with replica ids.

Usage: python tools/sweep_sf1x.py [dst_dir] [n]
Then:  SPARK_GRAFT_SF_DIR=<dst> SPARK_GRAFT_ORACLE_SF_DIR=<dst> \
         python tools/verify_local.py --json VERIFY_LOCAL_rN_*.json
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.1"


def build(
    dst: str, n: int = 10, keep_vocab: bool = False,
    tables: list | None = None, money_scale: int = 1,
    value_scale: int = 1,
) -> None:
    """``keep_vocab=True`` replicates documents VERBATIM (no per-replica
    token suffixing) even at n >= 20 — for the vocabulary-heavy oracle
    families (doremi/kn_bigram/bpe/top_bigrams) whose boundary risk is
    in the COUNT magnitudes, not the vocab: the decorrelated corpus
    grows their vocab/bigram oracle joins 1000x and prices them out of
    the decade, while a verbatim replica keeps vocab constant and
    multiplies every count by n (round-9 verdict task 2). Do NOT run
    dedup/LSH pair queries against a keep_vocab replica — 1000 identical
    copies of every text is the degenerate-duplication regime, probed
    separately by tools/probe_degenerate.py.

    ``tables`` restricts the build to the named tables (e.g. just
    ``documents`` for a vocab-preserving sibling dir; symlink the rest
    from an existing replica).

    ``money_scale`` multiplies the money columns (o_totalprice,
    l_extendedprice) — the ~sf1000 DECADE PROBE: 6B-row tables don't
    fit this box's disk, but the money family's per-decade boundary
    risk is sum MAGNITUDE (DECIMAL(38) headroom, exact-decimal
    rendering at ~3e13 micro-units), which a 1000x-row replica with
    10x values reaches honestly. Row-count-driven boundary classes
    (partition stitches, register saturation) are NOT probed by this
    mode — scope stated in the artifact.

    ``value_scale`` is the same magnitude axis for the NON-money value
    columns the r10 money probe could not reach (r10 verdict task 6):
    events.value (the rolling/locf/windowed micro-sum rail) and the
    embedding components (the 128-bit covariance rail). One
    correctly-rounded multiply per cell, so both engines read identical
    stored values."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # an in-memory connection has NO spill dir by default; big replica
    # sorts must go out-of-core instead of dying at the box limit. The
    # spill dir is PER-PROCESS: DuckDB names temp files
    # duckdb_temp_storage-N.tmp per connection, so two processes sharing
    # one temp_directory delete each other's blocks (observed: a
    # concurrent verify run crashed with "could not remove file")
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "64GB")
    spill = os.environ.get(
        "SPARK_GRAFT_ORACLE_SPILL", f"/tmp/duckdb_spill_{os.getpid()}"
    )
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{spill}'")
    try:
        _build_tables(con, dst, n, keep_vocab, tables, money_scale,
                      value_scale)
    finally:
        # even a failed/killed build must reap its per-pid spill dir
        # (r9 advice: the cleanup only ran on the normal exit path)
        try:
            con.close()
        except Exception:
            pass
        if "SPARK_GRAFT_ORACLE_SPILL" not in os.environ:
            shutil.rmtree(spill, ignore_errors=True)


def _build_tables(
    con, dst: str, n: int, keep_vocab: bool = False,
    tables: list | None = None, money_scale: int = 1,
    value_scale: int = 1,
) -> None:
    decorrelate = n >= 20 and not keep_vocab
    # stride stays wide whenever n >= 20 (keep_vocab included): the
    # dedup queries' synthesized twin ids (+1M..+5M) must never collide
    # with replica ids
    doc_stride = 10_000_000 if n >= 20 else 100_000
    # at n>=1000 the fact-table ORDER BY needs more spill than the box
    # has disk (600M-row lineitem sort > 74 GB); row order is irrelevant
    # to correctness (the harness value-hash sorts rows) so stream the
    # copy unordered instead — and don't buffer to preserve insertion
    # order either
    ordered = n < 1000
    if not ordered:
        con.execute("SET preserve_insertion_order=false")

    want = set(tables) if tables else None

    def rep(table: str, select: str) -> None:
        if want is not None and table not in want:
            return
        order = " ORDER BY 1" if ordered else ""
        con.execute(
            f"COPY (SELECT {select} "
            f"FROM read_parquet('{SRC}/{table}.parquet') "
            f"CROSS JOIN range({n}) r{order}) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )

    if decorrelate:
        text_expr = (
            "CASE WHEN r.range = 0 THEN text ELSE array_to_string("
            "list_transform(list_filter(regexp_split_to_array(text, '\\s+'),"
            " t -> t <> ''), t -> t || '~' || CAST(r.range AS VARCHAR)), ' ')"
            " END"
        )
        rep(
            "documents",
            f"doc_id + r.range * {doc_stride} AS doc_id, "
            f"{text_expr} AS text, lang, source, "
            f"CAST(length({text_expr}) AS BIGINT) AS n_chars",
        )
        emb_expr = (
            "CASE WHEN r.range = 0 THEN embedding ELSE list_transform("
            "generate_series(1, len(embedding)), i -> "
            "(CASE WHEN r.range >= len(embedding) THEN -1 ELSE 1 END) * "
            "embedding[((i - 1 + r.range) % len(embedding)) + 1]) END"
        )
        if value_scale != 1:
            emb_expr = (
                f"list_transform({emb_expr}, "
                f"x -> x * CAST({value_scale} AS FLOAT))"
            )
        rep(
            "embeddings",
            f"vec_id + r.range * {doc_stride} AS vec_id, "
            f"CAST({emb_expr} AS FLOAT[]) AS embedding, "
            f"CAST(label + r.range * 1000 AS INTEGER) AS label",
        )
    else:
        rep(
            "documents",
            f"doc_id + r.range * {doc_stride} AS doc_id, "
            "text, lang, source, n_chars",
        )
        emb_plain = (
            "embedding" if value_scale == 1 else
            f"CAST(list_transform(embedding, "
            f"x -> x * CAST({value_scale} AS FLOAT)) AS FLOAT[]) AS embedding"
        )
        rep(
            "embeddings",
            f"vec_id + r.range * {doc_stride} AS vec_id, {emb_plain}, label",
        )
    def money(c: str) -> str:
        # source money columns are DOUBLE (2-dp "nice" values); an
        # integer multiply is one correctly-rounded IEEE op, so the
        # scaled values keep the within-1e-13-of-2dp property both
        # engines' DECIMAL casts rely on, and the type stays exact
        if money_scale == 1:
            return c
        return f"CAST({c} * {money_scale} AS DOUBLE) AS {c}"
    rep(
        "orders",
        "o_orderkey + r.range * 10000000 AS o_orderkey, "
        "o_custkey + r.range * 1000000 AS o_custkey, "
        f"o_orderstatus, {money('o_totalprice')}, o_orderdate, o_orderpriority",
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
    rest = ", ".join(
        money(c) if c == "l_extendedprice" else c
        for c in li_cols
        if c != "l_orderkey"
    )
    rep(
        "lineitem",
        f"l_orderkey + r.range * 10000000 AS l_orderkey, {rest}",
    )
    val = (
        "value" if value_scale == 1
        else f"CAST(value * {value_scale} AS DOUBLE) AS value"
    )
    rep(
        "events",
        "event_id + r.range * 10000000 AS event_id, ts, "
        f"user_id + r.range * 1000000 AS user_id, event_type, {val}, props",
    )
    for small in ("part", "supplier", "nation", "region"):
        if want is not None and small not in want:
            continue
        shutil.copy(f"{SRC}/{small}.parquet", f"{dst}/{small}.parquet")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    dst = argv[0] if argv else "/tmp/sgraft_sf1x"
    n = int(argv[1]) if len(argv) > 1 else 10
    keep_vocab = "--keep-vocab" in flags
    tables = None
    money_scale = 1
    value_scale = 1
    for f in flags:
        if f.startswith("--tables="):
            tables = f.split("=", 1)[1].split(",")
        if f.startswith("--money-scale="):
            money_scale = int(f.split("=", 1)[1])
        if f.startswith("--value-scale="):
            value_scale = int(f.split("=", 1)[1])
    build(dst, n, keep_vocab=keep_vocab, tables=tables,
          money_scale=money_scale, value_scale=value_scale)
    print(f"built {dst} (x{n}{', keep-vocab' if keep_vocab else ''})")
