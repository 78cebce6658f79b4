"""Distributed sketches, all deterministic and cross-engine: a
HyperLogLog cardinality sketch (Flajolet et al. 2007), a count-min
frequency sketch (Cormode & Muthukrishnan 2005), and a bloom-filter
semi-join reducer (Bloom 1970) — each over the stable 60-bit hash.

Spark's built-in ``approx_count_distinct`` (HLL++) and DuckDB's
``approx_distinct`` use different internals, so they can't oracle-check
each other. This HLL is built from primitives BOTH engines compute
bit-identically:

- value hash: ``stable_hash64`` (md5-based, 60 bits),
- register  = low ``p`` bits, suffix w = high ``60 - p`` bits,
- rank      = leading zeros of w (+1) via ``length(bin(w))`` — integer
  string ops, no float logs,
- harmonic sum kept in INTEGER space: each register contributes
  ``2^(W + 1 - rank)`` (W = 60 - p), empty registers ``2^(W + 1)``;
  the BIGINT sum is order-independent and exact (a float 2^-rank sum
  would be accumulation-order-dependent and Spark aggregation order is
  not deterministic),
- the single float op is the final ``alpha * m^2 * 2^(W+1) / S``
  division (one IEEE op from identical literals -> identical doubles).

The small-range correction (zeros present, est <= 2.5m) uses one
``ln`` — libm implementations can differ in the last ulp across
engines, so estimates are reported rounded; everything before the final
estimate is integer-exact.

At 100 TB: per-partition register maxima combine map-side (max is the
HLL merge), so the shuffle carries at most ``m`` rows per partition —
the whole corpus's cardinality costs one tiny aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rag_content_spark.functions.hashing import stable_hash64

HLL_ALPHA_NUM = 0.7213
HLL_ALPHA_DEN = 1.079


def hll_registers(
    values: DataFrame, hash_col: str, p: int = 8, extra_cols: tuple = ()
) -> DataFrame:
    """(reg, max_rank) register table from pre-hashed values (60-bit
    nonneg BIGINTs). max over a register is the HLL merge operator.
    ``extra_cols`` adds grouping columns, so N per-shard sketches come
    out of ONE aggregation pass over the stream (r12: q_hll_merge's
    two half-corpus sketches shared one pass instead of one each)."""
    m = 1 << p
    w_bits = 60 - p
    h = F.col(hash_col)
    w = F.shiftright(h, p)
    bl = F.length(F.bin(w))
    rank = F.when(w > 0, F.lit(w_bits + 1) - bl).otherwise(
        F.lit(w_bits + 1)
    )
    return (
        values.select(
            *[F.col(c) for c in extra_cols],
            h.bitwiseAND(m - 1).alias("reg"),
            rank.alias("rank"),
        )
        .groupBy(*extra_cols, "reg")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(reg_tables: list[DataFrame]) -> DataFrame:
    """Merge register tables (the HLL mergeability property: max per
    register) — sketches built per shard/day/partition combine into the
    union's sketch with one tiny aggregation, no re-scan. This is the
    100 TB operating mode: sketch each ingest batch, keep the register
    tables, merge on demand."""
    merged = reg_tables[0]
    for t in reg_tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("reg").agg(F.max("max_rank").alias("max_rank"))


def hll_estimate(
    values: DataFrame, hash_col: str, p: int = 8
) -> DataFrame:
    """One-row (m, n_zero, est) cardinality estimate."""
    return hll_estimate_from_registers(
        hll_registers(values, hash_col, p), p
    )


def hll_estimate_from_registers(regs: DataFrame, p: int = 8) -> DataFrame:
    """Estimate from a (reg, max_rank) table — the registers are the
    mergeable state (:func:`hll_merge`), the estimate is one tiny agg."""
    m = 1 << p
    w_bits = 60 - p
    scale = 1 << (w_bits + 1)
    alpha = HLL_ALPHA_NUM / (1.0 + HLL_ALPHA_DEN / m)
    const = alpha * m * m * scale

    agg = regs.agg(
        F.count(F.lit(1)).alias("_n_regs"),
        # pyspark's shiftleft wrapper only takes a literal shift; the SQL
        # function accepts a column expression
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {w_bits + 1} - max_rank)"
            )
        ).alias("_s_data"),
    )
    n_zero = (F.lit(m) - F.col("_n_regs")).cast("bigint")
    s = F.col("_s_data") + n_zero * F.lit(scale).cast("bigint")
    raw = F.lit(const) / s.cast("double")
    est = F.when(
        (n_zero > 0) & (raw <= 2.5 * m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        n_zero.alias("n_zero"),
        F.round(est, 2).alias("est"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): fixed-size frequency
# sketch. Like the HLL above it is built only from cross-engine-stable
# primitives (stable_hash64 with per-row salts), so a DuckDB oracle
# computes the identical sketch.


def cms_cells(col: "F.Column | str" = "token", depth: int = 4, width: int = 256):
    """ARRAY<STRUCT<r, c>> of an item's count-min cells — the hashing
    stage of :func:`cms_sketch`, exposed so a multi-sketch consumer can
    hash the stream ONCE (checkpoint the exploded cells) and aggregate
    several ways (q_cms_merge builds three sketches of one stream)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (stable_hash64(c, salt=f"cms{r}") % width).alias("c"),
            )
            for r in range(depth)
        ]
    )


def cms_from_cells(cells: DataFrame) -> DataFrame:
    """Aggregate an exploded (r, c) cell stream into the sketch table."""
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_sketch(
    items: DataFrame, col: str = "token", depth: int = 4, width: int = 256
) -> DataFrame:
    """(r, c, cnt) count-min sketch of a value stream.

    Cell (r, c) counts items with stable_hash64(item, salt=f"cms{r}")
    mod width == c. The sketch is ``depth * width`` rows regardless of
    input size; cnt sums combine map-side (sum is the CMS merge), so at
    100 TB the shuffle carries at most depth*width rows per partition
    and per-day sketches union+re-aggregate into monthly ones for free.
    """
    return cms_from_cells(
        items.select(F.explode(cms_cells(col, depth, width)).alias("cell"))
        .select("cell.r", "cell.c")
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: est = min over rows of the candidate's
    cell counts (the classic one-sided overestimate: est >= true count).

    The sketch is <= depth*width rows — broadcast, so estimating any
    number of candidates is shuffle-free up to the final per-candidate
    min aggregate.
    """
    c = F.col(col)
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (stable_hash64(c, salt=f"cms{r}") % width).alias("c"),
            )
            for r in range(depth)
        ]
    )
    expanded = candidates.select(c.alias(col), F.explode(cells).alias("cell")).select(
        col, "cell.r", "cell.c"
    )
    return (
        expanded.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) as a semi-join reducer: the standard
# big-data trick for pruning a huge probe side before an expensive
# shuffle join (Spark's own runtime bloom-join does this inside the
# optimizer — spark.sql.optimizer.runtime.bloomFilter.enabled; this
# operator is the explicit, cross-engine-checkable version for when the
# build side is computed in a previous job, e.g. yesterday's key set).


def bloom_bits(
    keys: DataFrame, col: str, m: int = 4096, k: int = 5
) -> DataFrame:
    """The filter itself: the DISTINCT set bit positions (<= m rows).

    Represented as a position table instead of a packed bitset so it
    stays a DataFrame (mergeable by union+distinct, broadcastable,
    persistable as a tiny parquet)."""
    c = F.col(col).cast("string")
    bits = F.array(*[(stable_hash64(c, salt=f"bf{i}") % m) for i in range(k)])
    return keys.select(F.explode(bits).alias("bit")).distinct()


def bloom_member(
    probe: DataFrame,
    col: str,
    bits: DataFrame,
    m: int = 4096,
    k: int = 5,
) -> DataFrame:
    """Distinct probe keys with a ``bloom_pass`` flag (true iff all k
    bit positions are set — i.e. key is PROBABLY in the build set; false
    is certain absence).

    The bit table is <= m rows -> broadcast; the probe side never
    shuffles except the per-key count aggregate on already-distinct
    keys. Semi-join usage: filter on bloom_pass, then (optionally)
    verify survivors with the exact join — the bloom cuts the exact
    join's probe input by the true-negative fraction.
    """
    c = F.col(col)
    arr = F.array(
        *[(stable_hash64(c.cast("string"), salt=f"bf{i}") % m) for i in range(k)]
    )
    pk = probe.select(c.alias(col)).distinct()
    return (
        pk.select(col, F.explode(arr).alias("bit"))
        .join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy(col)
        .agg((F.count("_set") == k).alias("bloom_pass"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge count-min sketches (cell-wise sum — exact: counts are
    linear), the same per-batch operating mode as :func:`hll_merge`:
    sketch each shard/day, keep the depth*width tables, combine on
    demand with one tiny aggregation."""
    merged = sketches[0]
    for t in sketches[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


QSK_SUB_BITS = 3  # 8 linear sub-buckets per octave -> <=12.5% rel. err


def loglin_bucket(col: "F.Column | str") -> "F.Column":
    """DDSketch-flavored log-linear bucket index for NON-NEGATIVE
    integers (Masson et al., VLDB 2019 — same idea, but the bucket
    mapping is pure INTEGER arithmetic, no float log, so both engines
    bucket bit-identically): octave m = length(bin(v)) - 1 (exact
    integer log2 via the binary string — the HLL rank trick), linear
    sub-bucket = the next ``QSK_SUB_BITS`` mantissa bits, index =
    m * 2^sub_bits + sub. Division by pow(2, m - sub_bits) is exact:
    powers of two are exact doubles and the cast back is integral.

    DuckDB rendering: see queries.py _QSK_BUCKET_SQL.
    """
    v = F.col(col) if isinstance(col, str) else col
    v = v.cast("bigint")
    m = (F.length(F.bin(v)) - 1).cast("bigint")
    shift = F.greatest(m - QSK_SUB_BITS, F.lit(0))
    d = F.pow(F.lit(2.0), shift.cast("double")).cast("bigint")
    # (v - v%d)/d: the numerator is an exact BIGINT multiple of the
    # power-of-two d with <= sub_bits+1 significant bits, so the double
    # division is EXACT even for v > 2^53 (a bare v/d would misround
    # near sub-bucket boundaries there)
    sub = ((v - v % d) / d).cast("bigint") % (1 << QSK_SUB_BITS)
    return (m * (1 << QSK_SUB_BITS) + sub).alias("bucket")


def qsketch_bucket_lo(bucket: "F.Column | str") -> "F.Column":
    """Lower bound of a bucket's value range (the quantile estimate:
    relative error <= 2^-(sub_bits+1) of the true quantile by
    construction)."""
    b = F.col(bucket) if isinstance(bucket, str) else bucket
    m = (b / (1 << QSK_SUB_BITS)).cast("bigint")
    sub = b % (1 << QSK_SUB_BITS)
    hi = ((1 << QSK_SUB_BITS) + sub) * F.pow(
        F.lit(2.0), (m - QSK_SUB_BITS).cast("double")
    ).cast("bigint")
    return F.when(m < QSK_SUB_BITS, sub).otherwise(hi)


def qsketch(df: DataFrame, value_col: str) -> DataFrame:
    """(bucket, cnt) quantile sketch of a non-negative integer column.

    At 100 TB: counts combine map-side (the agg is the sketch build AND
    the merge), so the shuffle carries at most ~8 * 64 rows per
    partition regardless of data size — distributed quantiles without a
    global sort."""
    return df.select(loglin_bucket(value_col)).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def qsketch_merge(sketches: "list[DataFrame]") -> DataFrame:
    """Merge quantile sketches (bucket-wise sum — exact: counts are
    linear, same operating mode as :func:`cms_merge`)."""
    merged = sketches[0]
    for t in sketches[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def qsketch_quantiles(sk: DataFrame, pcts: "list[int]") -> DataFrame:
    """Percentile estimates from a (bucket, cnt) sketch: the p-th
    quantile is the smallest bucket whose cumulative count reaches
    ceil(p/100 * n) — all integer arithmetic (one tiny window over the
    <=512-row sketch + a broadcast percentile list)."""
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sk.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    pct_df = sk.sparkSession.createDataFrame(
        [(p,) for p in pcts], ["pct"]
    )
    target = (F.col("n") * F.col("pct") + 99) / 100
    return (
        cum.join(F.broadcast(pct_df))
        .filter(F.col("cum") >= target.cast("bigint"))
        .groupBy("pct")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            "pct",
            "bucket",
            qsketch_bucket_lo("bucket").alias("value_lo"),
        )
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch (Bar-Yossef et al. 2002; the theta-sketch set
# algebra of Dasgupta et al. / Apache DataSketches): the k minimum
# DISTINCT hash values of a set. Unlike HLL it supports INTERSECTION
# (and difference) estimates from the same mergeable state — the cheap
# path for "how many new documents does corpus B add beyond A?" at
# 100 TB, where the exact answer is a corpus-sized distinct join.
# Deterministic and cross-engine like the sketches above: the state is
# a plain sorted BIGINT list, the estimate one double division from
# identical integer literals.

KMV_DEFAULT_K = 256
_KMV_SPACE = 1 << 60  # stable_hash64 range


def kmv_state(values: DataFrame, hash_col: str, k: int = KMV_DEFAULT_K) -> DataFrame:
    """The mergeable state: k smallest DISTINCT hash values (one ``h``
    column, <= k rows).

    At 100 TB: distinct is a partial-aggregating exchange and the
    sort+limit is a per-partition TakeOrdered combine — the state that
    crosses the wire is <= k rows per partition, <= k rows out."""
    return (
        values.select(F.col(hash_col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_union(states: "list[DataFrame]", k: int = KMV_DEFAULT_K) -> DataFrame:
    """Union of sets from their states alone (k smallest of the merged
    value lists — exactly the state the union's own kmv_state would
    produce restricted to sampled values): union + distinct + top-k over
    <= len(states)*k rows."""
    merged = states[0]
    for t in states[1:]:
        merged = merged.unionByName(t)
    return merged.distinct().orderBy("h").limit(k)


def _kmv_theta(state: DataFrame, k: int) -> DataFrame:
    """One-row (n_state, theta): theta = the kth smallest value when the
    state is saturated, else 2^60 (exact mode — every value was kept)."""
    return state.agg(
        F.count(F.lit(1)).alias("n_state"), F.max("h").alias("_hmax")
    ).select(
        "n_state",
        F.when(F.col("n_state") >= k, F.col("_hmax"))
        .otherwise(F.lit(_KMV_SPACE).cast("bigint"))
        .alias("theta"),
    )


def kmv_estimate(state: DataFrame, k: int = KMV_DEFAULT_K) -> DataFrame:
    """One-row (n_state, theta, est) distinct-count estimate:
    (k-1) / (theta/2^60) when saturated (the kth value itself sits ON
    the threshold and is excluded from the below-theta count), else the
    exact kept count. Relative standard error ~1/sqrt(k-2)."""
    return _kmv_theta(state, k).select(
        "n_state",
        "theta",
        F.when(
            F.col("n_state") >= k,
            F.round(
                F.lit(float(k - 1) * float(_KMV_SPACE))
                / F.col("theta").cast("double"),
                2,
            ),
        )
        .otherwise(F.col("n_state").cast("double"))
        .alias("est"),
    )


def kmv_intersect_estimate(
    a: DataFrame, b: DataFrame, k: int = KMV_DEFAULT_K
) -> DataFrame:
    """One-row (n_common, theta, est) intersection estimate from two
    states: theta = min of the per-state thresholds, the common values
    strictly below theta are counted exactly (both states retain ALL
    their values below their own threshold, so the sub-theta overlap is
    exact), est = n_common / (theta/2^60). Everything after the state
    builds is <= k rows — broadcast joins, no corpus access."""
    ta = _kmv_theta(a, k).select(F.col("theta").alias("_ta"))
    tb = _kmv_theta(b, k).select(F.col("theta").alias("_tb"))
    theta = ta.crossJoin(F.broadcast(tb)).select(
        F.least("_ta", "_tb").alias("theta")
    )
    common = (
        a.join(F.broadcast(b), "h", "leftsemi")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return common.crossJoin(F.broadcast(theta)).select(
        "n_common",
        "theta",
        F.when(
            F.col("theta") < F.lit(_KMV_SPACE).cast("bigint"),
            F.round(
                F.col("n_common").cast("double")
                * F.lit(float(_KMV_SPACE))
                / F.col("theta").cast("double"),
                2,
            ),
        )
        .otherwise(F.col("n_common").cast("double"))
        .alias("est"),
    )
