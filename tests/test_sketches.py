"""Deterministic HLL sketch (operators/sketches.py)."""

from pyspark.sql import functions as F

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.operators.sketches import hll_estimate, hll_registers


def _vals(spark, n, tag=""):
    return spark.range(n).select(
        stable_hash64(F.concat(F.lit(tag), F.col("id").cast("string"))).alias("h")
    )


def test_estimate_accuracy_large(spark):
    # raw-HLL stderr at m=256 is ~6.5%; well clear of the bias hump at 100k
    r = hll_estimate(_vals(spark, 100_000), "h").collect()[0]
    assert abs(r["est"] - 100_000) / 100_000 < 0.15
    assert r["n_zero"] == 0


def test_estimate_duplicates_invariant(spark):
    once = hll_estimate(_vals(spark, 5000), "h").collect()[0]["est"]
    tripled = hll_estimate(
        _vals(spark, 5000).unionAll(_vals(spark, 5000)).unionAll(_vals(spark, 5000)),
        "h",
    ).collect()[0]["est"]
    assert once == tripled


def test_small_range_correction_branch(spark):
    # tiny set -> zeros present -> linear-counting branch, near-exact
    r = hll_estimate(_vals(spark, 30), "h").collect()[0]
    assert r["n_zero"] > 0
    assert abs(r["est"] - 30) < 8


def test_register_merge_is_max(spark):
    # merging two sketches = elementwise max of register tables — the
    # property that makes HLL map-side combinable at 100 TB
    a = hll_registers(_vals(spark, 2000, "a"), "h")
    b = hll_registers(_vals(spark, 2000, "b"), "h")
    both = hll_registers(
        _vals(spark, 2000, "a").unionAll(_vals(spark, 2000, "b")), "h"
    )
    merged = (
        a.unionAll(b)
        .groupBy("reg")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, both.collect())
    )


def test_hll_registers_on_stream(spark, tmp_path):
    # the register table is a bounded streaming aggregate: <= 2^p keys of
    # state no matter how long the stream runs (max is the merge)
    import json

    src = tmp_path / "hll_in"
    src.mkdir()
    with open(src / "v.json", "w") as fh:
        for i in range(5000):
            fh.write(json.dumps({"v": str(i)}) + "\n")
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("v", T.StringType())])
    stream = spark.readStream.schema(schema).json(str(src)).select(
        stable_hash64(F.col("v")).alias("h")
    )
    q = (
        hll_registers(stream, "h")
        .writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_regs = {
        (r["reg"], r["max_rank"])
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    batch_regs = {
        (r["reg"], r["max_rank"])
        for r in hll_registers(_vals(spark, 5000), "h").collect()
    }
    # identical register state to the batch sketch over the same values,
    # and state stays within the 2^p bound
    assert len(stream_regs) <= 256
    assert stream_regs == batch_regs


# ---------------------------------------------------------------------------
# count-min sketch


def _token_df(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["token"])


def test_cms_never_underestimates(spark):
    from rag_content_spark.operators.sketches import cms_estimate, cms_sketch

    words = ["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 5 + [f"w{i}" for i in range(200)]
    tok = _token_df(spark, words)
    sketch = cms_sketch(tok, "token", depth=4, width=64)
    exact = tok.groupBy("token").count()
    est = cms_estimate(sketch, exact.select("token"), "token", depth=4, width=64)
    rows = {r["token"]: r["est"] for r in est.collect()}
    for r in exact.collect():
        assert rows[r["token"]] >= r["count"], r["token"]
    # heavy hitter in a sparse sketch stays near-exact
    assert rows["alpha"] >= 50


def test_cms_bounded_and_mergeable(spark):
    from rag_content_spark.operators.sketches import cms_sketch

    a = _token_df(spark, [f"a{i % 7}" for i in range(100)])
    b = _token_df(spark, [f"b{i % 11}" for i in range(100)])
    sa, sb = cms_sketch(a, width=32), cms_sketch(b, width=32)
    assert sa.count() <= 4 * 32
    # CMS merge = cell-wise sum: sketch(a ∪ b) == re-agg of the two sketches
    import pyspark.sql.functions as F

    merged = (
        sa.unionAll(sb).groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_sketch(a.unionAll(b), width=32)
    assert (
        merged.exceptAll(whole).count() == 0
        and whole.exceptAll(merged).count() == 0
    )


# ---------------------------------------------------------------------------
# bloom filter


def test_bloom_no_false_negatives(spark):
    from rag_content_spark.operators.sketches import bloom_bits, bloom_member

    keys = spark.createDataFrame([(i,) for i in range(0, 500, 5)], ["key"])
    probe = spark.createDataFrame([(i,) for i in range(500)], ["key"])
    bits = bloom_bits(keys, "key", m=2048, k=5)
    out = bloom_member(probe, "key", bits, m=2048, k=5).collect()
    passed = {r["key"] for r in out if r["bloom_pass"]}
    members = set(range(0, 500, 5))
    assert members <= passed  # NEVER a false negative
    # and the filter actually prunes: false positives well under the
    # non-member count at this density (100 keys in 2048 bits)
    assert len(passed - members) < 100


def test_bloom_semi_join_reduction(spark):
    from rag_content_spark.operators.sketches import bloom_bits, bloom_member
    import pyspark.sql.functions as F

    keys = spark.createDataFrame([(i,) for i in (3, 7, 11)], ["key"])
    probe = spark.createDataFrame([(i,) for i in range(1000)], ["key"])
    bits = bloom_bits(keys, "key", m=4096, k=5)
    member = bloom_member(probe, "key", bits, m=4096, k=5)
    kept = probe.join(
        member.filter("bloom_pass").select("key"), "key", "left_semi"
    )
    survivors = {r["key"] for r in kept.collect()}
    assert {3, 7, 11} <= survivors
    assert len(survivors) < 50  # 3 keys x 5 bits in 4096 -> tiny fp rate


def test_morton_code_exact_interleave(spark):
    from rag_content_spark.functions.layout import morton_code

    # x=3 (011), y=5 (101): z bits 0..5 = x0 y0 x1 y1 x2 y2
    #  -> 1,1,1,0,0,1 -> 0b100111 = 39
    df = spark.createDataFrame([(3, 5)], ["x", "y"])
    assert df.select(morton_code("x", "y", 3).alias("z")).collect()[0]["z"] == 39


def test_morton_order_makes_both_dims_prunable(spark):
    """Split a 16x16 grid into 16 'row groups' of 16 rows each: under
    row-major order every group spans the full y range, so a y-filter
    prunes NOTHING; under Morton order groups are 4x4 blocks, so the
    same filter keeps only the groups whose y min/max covers it — the
    z-order pruning win, measured exactly like parquet stats do."""
    from rag_content_spark.functions.layout import morton_code

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    z_ordered = [
        (r["x"], r["y"]) for r in df.orderBy(morton_code("x", "y", 4)).collect()
    ]
    row_major = sorted(rows)

    def groups_containing_y(seq, y, size=16):
        hits = 0
        for i in range(0, len(seq), size):
            chunk = seq[i : i + size]
            if min(c[1] for c in chunk) <= y <= max(c[1] for c in chunk):
                hits += 1
        return hits

    assert groups_containing_y(row_major, 7) == 16   # no pruning
    assert groups_containing_y(z_ordered, 7) <= 8    # most groups pruned
    # and x stays prunable too (row-major's only strength)
    assert groups_containing_y([(y, x) for x, y in z_ordered], 7) <= 8


def test_loglin_bucket_matches_python_model(spark):
    from rag_content_spark.operators.sketches import (
        QSK_SUB_BITS,
        loglin_bucket,
    )

    def model(v):
        if v == 0:
            return 0
        m = v.bit_length() - 1
        sub = (v >> max(m - QSK_SUB_BITS, 0)) & ((1 << QSK_SUB_BITS) - 1)
        return m * (1 << QSK_SUB_BITS) + sub

    # small values, sub-bucket boundaries, and values > 2^53 where a
    # naive double division would misround near boundaries
    vals = (
        list(range(0, 40))
        + [255, 256, 257, 1023, 1024, 4095]
        + [(1 << 60) - 1, 1 << 60, (1 << 59) + (1 << 56), (1 << 57) - 1]
    )
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r["v"]: r["bucket"]
        for r in df.select("v", loglin_bucket("v")).collect()
    }
    assert got == {v: model(v) for v in vals}


def test_qsketch_quantiles_within_relative_error(spark):
    from rag_content_spark.operators.sketches import (
        qsketch,
        qsketch_quantiles,
    )

    import numpy as np

    rng = np.random.RandomState(7)
    vals = rng.lognormal(6, 1.5, size=5000).astype(int) + 1
    df = spark.createDataFrame([(int(v),) for v in vals], ["v"])
    sk = qsketch(df, "v")
    got = {
        r["pct"]: r["value_lo"]
        for r in qsketch_quantiles(sk, [50, 90, 99]).collect()
    }
    for pct in (50, 90, 99):
        exact = float(np.percentile(vals, pct, interpolation="lower"))
        lo = got[pct]
        # bucket lower bound is within one bucket width (12.5%) below,
        # never above the next bucket's start
        assert lo <= exact * 1.1251 and lo >= exact / 1.1251, (
            pct, lo, exact,
        )


def test_sketch_saturation_row_invariants(spark):
    """The saturation probe's one-row contract at the smallest SF: the
    CMS totals are exact (counts are linear), the HLL estimate is within
    its m=256 design error of the true distinct count, the harmonic sum
    sits strictly inside its provable < m*2^53 rail, and the qsketch
    quantile lower bounds are within one 12.5% bucket of the true
    quantiles of {0..n-1}."""
    from rag_content_spark.queries import QUERIES

    row = QUERIES["sketch_saturation"](spark, "/root/testdata/sf0.001").collect()[0]
    n = row["n_inserts"]
    assert row["cms_total"] == n
    assert 0 < row["cms_min_cnt"] <= row["cms_max_cnt"] < n
    # HLL: m=256 -> relative standard error ~1.04/sqrt(256) = 6.5%;
    # allow 4 sigma
    assert abs(row["hll_est"] - n) / n < 0.26
    assert 0 < row["hll_harmonic_sum"] < 256 * (1 << 53)
    assert 0 < row["hll_max_rank"] <= 53
    # quantiles of the id stream: the driver testdata's event_ids are
    # dense 0..N-1, so the stream is {0..n-1} and the p-th quantile ~
    # n*p/100 (sparse-id replicas shift these; this pin is testdata-only)
    for pct, lo in ((50, row["qsk_p50_lo"]), (99, row["qsk_p99_lo"])):
        exact = n * pct // 100
        assert exact / 1.1251 <= lo * 1.1251 and lo <= exact, (pct, lo, exact)


def test_kmv_estimates_within_design_error(spark):
    """KMV k=256 on two overlapping synthetic sets: distinct / union /
    intersection estimates all inside 4x the ~6.3% design RSE, and the
    sub-theta overlap logic is exact when nothing saturates."""
    from pyspark.sql import functions as F

    from rag_content_spark.functions.hashing import stable_hash64
    from rag_content_spark.operators.sketches import (
        kmv_estimate,
        kmv_intersect_estimate,
        kmv_state,
        kmv_union,
    )

    # A = {0..19999}, B = {10000..29999}: |A|=|B|=20000, inter=10000,
    # union=30000
    a_vals = spark.range(0, 20000).select(
        stable_hash64(F.col("id").cast("string")).alias("h")
    )
    b_vals = spark.range(10000, 30000).select(
        stable_hash64(F.col("id").cast("string")).alias("h")
    )
    sa, sb = kmv_state(a_vals, "h"), kmv_state(b_vals, "h")
    est_a = kmv_estimate(sa).collect()[0]["est"]
    est_u = kmv_estimate(kmv_union([sa, sb])).collect()[0]["est"]
    est_i = kmv_intersect_estimate(sa, sb).collect()[0]["est"]
    assert abs(est_a - 20000) / 20000 < 0.26
    assert abs(est_u - 30000) / 30000 < 0.26
    # intersection uses theta-scaled counting over <=k samples: wider
    # variance (k_eff ~ k * jaccard), allow 40%
    assert abs(est_i - 10000) / 10000 < 0.40

    # unsaturated exact mode: tiny sets -> exact counts, no scaling
    ta = spark.range(0, 50).select(
        stable_hash64(F.col("id").cast("string")).alias("h")
    )
    tb = spark.range(25, 75).select(
        stable_hash64(F.col("id").cast("string")).alias("h")
    )
    assert kmv_estimate(kmv_state(ta, "h")).collect()[0]["est"] == 50.0
    assert (
        kmv_intersect_estimate(kmv_state(ta, "h"), kmv_state(tb, "h"))
        .collect()[0]["est"]
        == 25.0
    )
