"""Graph operators: fixed-point PageRank (power iteration as exact
integer arithmetic).

PageRank (Page et al. 1999) over an edge DataFrame, with every rank a
SCALE-denominated BIGINT and every update floor-divided — so iteration
t+1 is a pure function of iteration t with no floating-point order
sensitivity. That is what lets an iterative algorithm be value-hash
checked against a DuckDB recursive-CTE oracle (same trick as the
dedup connected components, extended to weighted propagation).

    r_{t+1}(v) = (100 - d)% * SCALE / N  +  d% * sum_u r_t(u) / out(u)

with all divisions floor (identical for non-negative integers on both
engines). Dangling mass (nodes with no outlinks) is dropped — the
deterministic choice; renormalize downstream if the L1 norm matters.

Scale shape: each iteration is one (src) equi-join + one (dst)
map-side-combining aggregate — the standard Pregel step. The lazy plan
would grow one join per iteration; ``checkpoint_every`` (default 5)
localCheckpoints the rank table to cut lineage, so long runs have flat
per-iteration cost. N arrives as a driver scalar (same tiny-collect
pattern as the k-means centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000_000

#: Edge-count bound under which the power iteration runs inside one
#: Arrow task (exact int64 floor arithmetic, bit-identical to the
#: distributed fixed-point updates) — a row-count bound, not a
#: local-core constant; see :func:`pagerank_fixed`.
_PR_SINGLE_TASK_MAX_EDGES = 2_000_000


def _pagerank_single_task(
    e: DataFrame, iters: int, damping_pct: int
) -> DataFrame:
    """All ``iters`` fixed-point power iterations inside one
    ``mapInPandas`` task over a bounded (src, dst) edge list: the same
    integer updates (``r div out`` floor division of non-negative
    BIGINTs, ``d% * sum div 100``) on numpy int64 — bit-identical to
    the per-iteration join/aggregate plan, without 2 joins + 1
    aggregate + checkpoint lineage per round. Returns (node, r) still
    SCALE-denominated; the caller descales with the same round()
    expression as the distributed path so the rendered doubles are
    byte-equal."""
    node_t = dict(e.dtypes)["src"]

    def _pr(batches):
        import numpy as np
        import pandas as pd

        srcs: list = []
        dsts: list = []
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy())
            dsts.append(pdf["dst"].to_numpy())
        if srcs:
            src = np.concatenate(srcs)
            dst = np.concatenate(dsts)
        else:
            src = dst = np.array([], dtype=object)
        nodes = pd.unique(np.concatenate([src, dst]))
        n = len(nodes)
        if n == 0:
            yield pd.DataFrame({"node": nodes, "r": np.array([], dtype="int64")})
            return
        idx = {v: i for i, v in enumerate(nodes)}
        si = np.fromiter((idx[v] for v in src), dtype=np.int64, count=len(src))
        di = np.fromiter((idx[v] for v in dst), dtype=np.int64, count=len(dst))
        out = np.bincount(si, minlength=n)  # per-EDGE-ROW out-degree
        base = (100 - damping_pct) * SCALE // 100 // n
        r = np.full(n, SCALE // n, dtype=np.int64)
        for _ in range(iters):
            contrib = r[si] // out[si]
            s = np.zeros(n, dtype=np.int64)
            np.add.at(s, di, contrib)
            r = base + (damping_pct * s) // 100
        yield pd.DataFrame({"node": nodes, "r": r})

    return e.coalesce(1).mapInPandas(_pr, f"node {node_t}, r bigint")


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 10,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, rank6) after ``iters`` exact integer power iterations;
    rank6 is the fixed-point rank descaled to a 1e-6-rounded double.

    ``checkpoint_every`` bounds the lazy plan: every N iterations the
    rank table is localCheckpoint'ed (same lineage-cut discipline as
    ``connected_components`` in dedup.py), so a 50-iteration run is
    ~N joins deep instead of 50 — without it the static plan grows one
    join + one aggregate per iteration and the optimizer re-walks the
    whole lineage each action (the iterative-DataFrame scale trap).
    Set 0 to disable (tiny graphs / plan inspection)."""
    src, dst = F.col(src_col), F.col(dst_col)
    # materialize the edge list once: it is referenced by every
    # iteration (the lazy plan re-derived it per round — `iters` full
    # re-derivations of whatever produced it), and its size is what
    # decides the execution shape below
    e = edges.select(src.alias("src"), dst.alias("dst")).localCheckpoint(
        eager=True
    )
    n_edges = e.count()  # cheap: counts the materialized checkpoint
    if n_edges <= _PR_SINGLE_TASK_MAX_EDGES:
        # bounded edge list: run the whole power iteration inside one
        # Arrow task (guide §8 — the optimizer cannot know the graph is
        # small; exact int64 math keeps it bit-identical). Descale with
        # the SAME expression as the distributed path.
        return _pagerank_single_task(e, iters, damping_pct).select(
            "node", F.round(F.col("r").cast("double") / SCALE, 6).alias("rank6")
        )
    edges = e
    src, dst = F.col("src"), F.col("dst")
    nodes = (
        edges.select(src.alias("node"))
        .union(edges.select(dst.alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(src.alias("node")).agg(F.count(F.lit(1)).alias("out"))
    if checkpoint_every:
        # reused every iteration — pin them so the per-iteration plan
        # starts from materialized tables, not the raw-edges lineage
        nodes = nodes.localCheckpoint(eager=True)
        outdeg = outdeg.localCheckpoint(eager=True)
    n = nodes.count()  # driver scalar: the graph's node count
    base = (100 - damping_pct) * SCALE // 100 // n
    ranks = nodes.select("node", F.lit(SCALE // n).cast("bigint").alias("r"))
    for it in range(iters):
        contribs = (
            edges.select(src.alias("node"), dst.alias("_dst"))
            .join(ranks, "node")
            .join(outdeg, "node")
            .select(
                F.col("_dst").alias("node"),
                F.expr("r div out").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_sum"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"{damping_pct} * coalesce(_sum, 0) div 100")
            ).cast("bigint").alias("r"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node", F.round(F.col("r").cast("double") / SCALE, 6).alias("rank6")
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    wedge_salt: int | None = None,
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph —
    the classic clustering/spam-detection primitive (node_iterator++ /
    the Cohen MapReduce formulation): canonicalize every edge to
    ``u < v`` (self-loops dropped, duplicates collapsed), enumerate
    wedges ``a < b < c`` by joining edges on the shared middle vertex,
    then close each wedge against the edge set.

    Exactness: pure set algebra over the edge keys — no arithmetic to
    diverge; the DuckDB oracle is the same three-join SQL.

    Scale shape: two hash equi-joins on edge endpoints (the standard
    distributed triangle enumeration) + one explode/groupBy for the
    per-node rollup. Every triangle is generated exactly once (the
    a<b<c total order), so no dedup pass. Skewed high-degree vertices
    concentrate the wedge join's ``b`` key: a power-law hub of degree k
    emits ~k²/2 wedges from one partition. ``wedge_salt=S`` spreads
    each hub across S tasks (the salted-replicate join: the a-side
    wedge key becomes (b, hash(a)%S), the c-side is replicated to all
    S salts) — identical output, equality-pinned in tests; the
    power-law probe (tools/probe_graph.py, BASELINE.md round-8)
    measures when AQE's skew split alone suffices. Degree thresholding
    upstream remains the semantic mitigation when hubs should not
    count at all.
    """
    u, v = F.col(src), F.col(dst)
    e = (
        edges.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    if wedge_salt and wedge_salt > 1:
        s = int(wedge_salt)
        ab_s = ab.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("a")), F.lit(s)).cast("int")
        )
        bc_s = bc.select(
            "b",
            "c",
            F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("_salt"),
        )
        tri = ab_s.join(bc_s, ["b", "_salt"]).drop("_salt").join(
            ac, ["a", "c"]
        )
    else:
        tri = ab.join(bc, "b").join(ac, ["a", "c"])  # a < b < c by construction
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
