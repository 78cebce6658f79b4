"""Distributed cardinality sketch: a deterministic, cross-engine
HyperLogLog (Flajolet et al. 2007) over the stable 60-bit hash.

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

HLL_ALPHA_NUM = 0.7213
HLL_ALPHA_DEN = 1.079


def hll_registers(
    values: DataFrame, hash_col: str, p: int = 8
) -> DataFrame:
    """(reg, max_rank) register table from pre-hashed values (60-bit
    nonneg BIGINTs). max over a register is the HLL merge operator."""
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
            h.bitwiseAND(m - 1).alias("reg"), rank.alias("rank")
        )
        .groupBy("reg")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(
    values: DataFrame, hash_col: str, p: int = 8
) -> DataFrame:
    """One-row (m, n_zero, est) cardinality estimate."""
    m = 1 << p
    w_bits = 60 - p
    scale = 1 << (w_bits + 1)
    alpha = HLL_ALPHA_NUM / (1.0 + HLL_ALPHA_DEN / m)
    const = alpha * m * m * scale

    regs = hll_registers(values, hash_col, p)
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
