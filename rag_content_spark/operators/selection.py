"""Data-selection operators: DSIR importance resampling, bigram-LM
perplexity, and BPE merge-pair counting.

These extend the curation surface (quality.py / text_analysis.py) with
the *targeted* selection step of a training-data pipeline: given a raw
crawl and a small trusted target corpus, score every raw document by how
target-like it is and resample. The method is DSIR — Data Selection via
Importance Resampling (Xie et al., NeurIPS 2023, arXiv:2302.03169):
hashed n-gram bag-of-words features, importance weight
``log w(x) = sum_b c_b(x) * (ln p_target(b) - ln p_raw(b))`` over hash
buckets ``b``, then Gumbel top-k resampling.

Scale shapes (100 TB):

* The feature space is ``buckets`` hash cells (default 4096), so BOTH
  distribution estimates are map-side-combining aggregates to <= buckets
  rows, and the per-document scoring join is a **broadcast** of a
  <= buckets-row log-ratio table — no shuffle of the corpus beyond the
  final per-doc partial aggregate.
* The per-doc feature table is **materialized once** (localCheckpoint,
  on by default): the composed weight/select plans reference it up to
  three times, and without materialization each reference re-scans and
  re-tokenizes the corpus — the dominant cost at 100 TB.
* Log-ratios are fixed-point BIGINTs (ln * 1e6, rounded): per-document
  weights are then *integer* sums — exact, order-independent, identical
  across engines and across partitionings. A double sum would depend on
  partition order; an integer sum cannot.
* Gumbel keys derive from :func:`stable_hash64` of the doc id — the
  resample is deterministic and reproducible on any cluster layout.

The reference (lightspeed-core/rag-content) has no selection stage at
all — documents are taken as given; this module is part of the
LLM-pipeline extension surface the north star requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.functions.text import tokens

LOG_SCALE = 1_000_000  # fixed-point scale for ln-ratios (1e-6 resolution)


def _ngram_array(text_col: Column | str) -> Column:
    """Unigrams + bigrams of the whitespace tokens, one flat array.

    Bigrams via zip_with over two shifted slices — a narrow Column
    expression (whole-stage codegen), no explode until the caller needs
    per-ngram rows. The token split is let-bound so the regex runs once
    per row, not once per reference (no cross-expression CSE).
    """
    from rag_content_spark.operators.dedup import let

    def _grams(tok: Column) -> Column:
        n = F.size(tok)
        bigrams = F.zip_with(
            F.slice(tok, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(tok, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        return F.concat(tok, bigrams)

    return let(tokens(text_col), _grams)


def hashed_ngram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
) -> DataFrame:
    """Per-document hashed-ngram feature counts: (id, bucket, cnt).

    bucket = stable_hash64(ngram) mod buckets — the DSIR feature map.
    One narrow explode + a partial-aggregating groupBy; at 100 TB the
    combine step collapses each document's ngrams to <= buckets rows
    before any shuffle.
    """
    return (
        docs.select(F.col(id_col), F.explode(_ngram_array(text_col)).alias("_ng"))
        .select(
            F.col(id_col),
            F.pmod(stable_hash64(F.col("_ng")), F.lit(buckets)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_distribution(
    docs: DataFrame,
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """Corpus-level smoothed bucket distribution: (bucket, c, p).

    Add-1 smoothing over ALL ``buckets`` cells (cells the corpus never
    hits still get probability mass — exactly the DSIR estimator), so
    ``p = (c_b + 1) / (total + buckets)``. Result has at most
    ``buckets`` rows: broadcast it.
    """
    counts = (
        docs.select(F.explode(_ngram_array(text_col)).alias("_ng"))
        .select(F.pmod(stable_hash64(F.col("_ng")), F.lit(buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _smoothed(counts, buckets)


def _smoothed(counts: DataFrame, buckets: int) -> DataFrame:
    """Attach the add-1-smoothed probability to a (bucket, c) table."""
    total = counts.agg(F.sum("c").alias("_total"))
    return counts.join(F.broadcast(total)).select(
        "bucket",
        "c",
        (
            (F.col("c") + F.lit(1)).cast("double")
            / (F.col("_total") + F.lit(buckets)).cast("double")
        ).alias("p"),
        F.col("_total"),
    )


def _ratio_table(pr: DataFrame, pt: DataFrame, buckets: int) -> DataFrame:
    """(bucket, lr) — fixed-point ln(p_target/p_raw) per hash bucket.

    Built from the raw-side bucket set (a raw document can only contain
    raw-side buckets) left-joined to the target distribution; a bucket
    absent from the target gets the pure-smoothing probability
    ``1 / (total_t + buckets)``. ``lr`` is
    ``round((ln p_t - ln p_r) * 1e6)`` as BIGINT — summing these is
    exact integer math on every engine.
    """
    tt = pt.agg(F.max("_total").alias("_tt"))
    joined = (
        pr.select("bucket", F.col("p").alias("_pr"))
        # both sides are <= buckets rows by construction — broadcast
        # explicitly (pre-AQE stats would otherwise pick a sort-merge)
        .join(F.broadcast(pt.select("bucket", F.col("p").alias("_pt"))), "bucket", "left")
        .join(F.broadcast(tt))
    )
    p_t = F.coalesce(
        F.col("_pt"), F.lit(1.0) / (F.col("_tt") + F.lit(buckets)).cast("double")
    )
    lr = F.round((F.log(p_t) - F.log(F.col("_pr"))) * F.lit(LOG_SCALE)).cast("bigint")
    return joined.select("bucket", lr.alias("lr"))


def dsir_log_ratio_table(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """Standalone (bucket, lr) ratio table from two corpora — see
    :func:`_ratio_table`. :func:`dsir_log_weights` derives the raw-side
    distribution from the per-doc feature table instead, so the raw
    corpus is scanned once, not twice."""
    pr = bucket_distribution(raw, text_col, buckets)
    pt = bucket_distribution(target, text_col, buckets)
    return _ratio_table(pr, pt, buckets)


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    target_subset_of_raw: bool = False,
    materialize: bool = True,
    vectorized: bool = True,
    target_flag: Column | None = None,
) -> DataFrame:
    """Per-raw-document DSIR importance weight: (id, n_ngrams, logw).

    ``logw = sum_b c_b * (ln p_t(b) - ln p_r(b))`` — computed as an
    exact integer sum of fixed-point ratios, descaled once at the end
    (rounded to 6, the fixed-point resolution). High logw = looks like
    the target corpus.

    The raw corpus is exploded ONCE: the raw bucket distribution is the
    bucket-sum of the per-doc feature table (identical integer counts),
    not a second corpus scan — at 100 TB that second scan is the cost
    of the whole job again. With ``target_subset_of_raw=True`` (target
    rows carry ids from the raw corpus, e.g. a lang slice) the TARGET
    distribution too comes from the feature table via a semi-join —
    zero extra tokenize/explode work for the common in-corpus-target
    case; identical integer counts either way (equality-pinned in
    tests). Measured trade-off at 10x/sf0.1: for a SMALL target slice
    re-exploding it is cheaper than the semi-join + regroup (6.4 s vs
    8.3 s), so the flag is opt-in — flip it when the target is a large
    fraction of raw or expensive to re-tokenize.

    ``materialize=True`` (default) localCheckpoints the per-doc feature
    table: the lazy plan references it two-to-three times (raw bucket
    sums, optional target semi-join sums, the final scoring join), and
    without materialization Catalyst re-derives it — re-scanning and
    re-tokenizing the corpus — once per reference. At 100 TB each extra
    derivation is the cost of the whole job again; checkpointing caps
    the plan at ONE corpus scan. Pass ``materialize=False`` only to
    inspect the fully-lazy composed plan. (localCheckpoint over
    persist() for the same reason as ``jaccard_pairs``: the checkpoint
    truncates lineage and stays AQE-replannable; on a real cluster
    prefer reliable checkpoints if executor loss must not recompute.)
    """
    # r11: ``vectorized`` (default) computes the per-doc feature table
    # with the exact numpy/hashlib twin — identical integer rows, and
    # the corpus-sized ngram explode ahead of the (id, bucket) groupBy
    # disappears (counts finalize inside each batch; see
    # hashed_ngram_buckets_np). The target distribution reuses the same
    # twin summed per bucket. Equality pinned in tests/test_selection.py.
    #
    # r11 continuation: ``target_flag`` (a boolean Column over ``raw``
    # rows, e.g. ``F.col("lang") == "en"``) declares the target as a
    # row-predicate slice of raw. The flag rides through the feature
    # pass (constant per doc), so BOTH bucket distributions come out of
    # ONE aggregation over the checkpointed feature table — the second
    # feature pass over the target slice (profiled 0.58 s of
    # dsir_weights' 2.1 s at sf0.1; at 100 TB a second partial corpus
    # scan+tokenize) and the two serialized distribution-checkpoint
    # jobs disappear. Identical integer counts by construction: a
    # bucket's target count is the sum of cnt over flagged docs, which
    # is exactly the re-exploded slice's count (equality-pinned in
    # tests/test_selection.py::test_dsir_target_flag_matches_two_pass).
    if target_flag is not None:
        if not vectorized:
            raise ValueError("target_flag requires vectorized=True")
        feats = hashed_ngram_buckets_np(
            raw.withColumn("_tgt", target_flag),
            text_col,
            id_col,
            buckets,
            flag_col="_tgt",
        )
        if materialize:
            feats = feats.localCheckpoint(eager=True)
        fused = feats.groupBy("bucket").agg(
            F.sum("cnt").alias("c"),
            F.sum(F.when(F.col("_tgt"), F.col("cnt"))).alias("_ct"),
        )
        if materialize:
            # <= buckets rows; one job materializes BOTH distributions
            fused = fused.localCheckpoint(eager=True)
        rc = fused.select("bucket", "c")
        # keep exactly the old tc row set (buckets with >= 1 target
        # occurrence) so _smoothed/_ratio_table see identical tables
        tc = fused.filter(F.col("_ct").isNotNull()).select(
            "bucket", F.col("_ct").alias("c")
        )
        pr = _smoothed(rc, buckets)
        pt = _smoothed(tc, buckets)
        ratios = _ratio_table(pr, pt, buckets)
        return (
            feats.join(F.broadcast(ratios), "bucket")
            .groupBy(id_col)
            .agg(
                F.sum("cnt").alias("n_ngrams"),
                F.round(
                    F.sum(F.col("cnt") * F.col("lr")).cast("double")
                    / F.lit(LOG_SCALE),
                    6,
                ).alias("logw"),
            )
        )
    feat_fn = hashed_ngram_buckets_np if vectorized else hashed_ngram_buckets
    feats = feat_fn(raw, text_col, id_col, buckets)
    if materialize:
        feats = feats.localCheckpoint(eager=True)
    rc = feats.groupBy("bucket").agg(F.sum("cnt").alias("c"))
    pr = _smoothed(rc, buckets)
    if target_subset_of_raw:
        tids = target.select(id_col).distinct()
        tc = (
            feats.join(tids, id_col, "leftsemi")
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("c"))
        )
        pt = _smoothed(tc, buckets)
    elif vectorized:
        tc = (
            hashed_ngram_buckets_np(target, text_col, id_col, buckets)
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("c"))
        )
        pt = _smoothed(tc, buckets)
    else:
        pt = bucket_distribution(target, text_col, buckets)
    if materialize:
        # the distribution tables are <= buckets rows but _smoothed /
        # _ratio_table reference each twice (counts + total agg, join +
        # max-total) — without this the TARGET corpus is scanned and
        # re-tokenized 4x per plan. Checkpointing <= 4096 rows is free.
        pr = pr.localCheckpoint(eager=True)
        pt = pt.localCheckpoint(eager=True)
    ratios = _ratio_table(pr, pt, buckets)
    return (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_ngrams"),
            F.round(
                F.sum(F.col("cnt") * F.col("lr")).cast("double") / F.lit(LOG_SCALE), 6
            ).alias("logw"),
        )
    )


def gumbel_key(id_col: Column | str, logw_col: Column | str, salt: str = "dsir") -> Column:
    """Deterministic Gumbel-perturbed key: logw + Gumbel(0,1) noise with
    the uniform drawn from stable_hash64(id) — reproducible resampling
    (same doc -> same noise on any engine/layout). Rounded to 6 so the
    cross-engine double comparison is boundary-safe.
    """
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    lw = F.col(logw_col) if isinstance(logw_col, str) else logw_col
    u = (
        F.pmod(stable_hash64(idc.cast("string"), salt=salt), F.lit(1_000_000_000))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000_000.0)
    return F.round(lw - F.log(-F.log(u)), 6)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    salt: str = "dsir",
    target_subset_of_raw: bool = False,
    materialize: bool = True,
    vectorized: bool = True,
    target_flag: Column | None = None,
) -> DataFrame:
    """Gumbel top-k importance resample: the k raw documents to keep.

    Returns (id, logw, key) for the k largest Gumbel-perturbed weights
    (ties broken by id — fully deterministic). Top-k over a corpus is a
    partial-aggregating pattern at scale: Spark's global sort + limit
    only shuffles each partition's local top k.
    """
    w = dsir_log_weights(
        raw, target, text_col, id_col, buckets,
        target_subset_of_raw=target_subset_of_raw,
        materialize=materialize,
        vectorized=vectorized,
        target_flag=target_flag,
    )
    keyed = w.select(
        F.col(id_col),
        "logw",
        gumbel_key(id_col, "logw", salt).alias("key"),
    )
    return keyed.orderBy(F.desc("key"), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Bigram-LM cross-entropy (CCNet-style perplexity quality filter)


def _salted_model_join(big, model, keys, salt: int, id_col: str):
    """Salted-replicate equi-join of the corpus-side bigram stream
    against a vocabulary-sized model table: the corpus side carries
    ``_salt = hash(doc_id) % salt`` (spreading a hot token's rows over
    ``salt`` tasks regardless of the token key), the model side is
    replicated to every salt. Identical rows out — the model table has
    exactly one row per key, so each (row, salt) pair still matches it
    exactly once. The `wedge_salt` pattern from
    :func:`rag_content_spark.operators.graph.triangle_counts`."""
    rep = model.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(int(salt) - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return big.join(rep, [*keys, "_salt"])


def bigram_logloss(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: int | None = None,
) -> DataFrame:
    """Per-document cross-entropy under an in-plan add-1-smoothed bigram
    LM: (id, n_bigrams, xent2).

    ``p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)`` where ``c(w1·)`` counts
    w1 as a bigram *context* and V is the distinct unigram vocabulary —
    the classic conditional estimate CCNet-style perplexity filters use
    (real pipelines swap a KenLM pandas_udf at the same plan point; this
    is the engine-native estimator). Documents with < 2 tokens have no
    bigrams and drop out (same as the oracle).

    Scale: two token-key aggregates (map-side combining; vocabulary-
    sized results, far smaller than the corpus), one broadcast one-row V,
    then shuffle joins on (w1,w2) / w1. On a REAL web corpus the token
    keys are Zipf-skewed and the r10/r11 AQE probe showed Spark's
    skew-join split cannot be counted on to fire on this shape
    (BASELINE.md round-11) — ``salt=S`` is the explicit mitigation:
    the corpus side is salted by ``hash(doc_id) % S`` and each
    vocabulary-sized model table is replicated S times
    (:func:`_salted_model_join`), bounding any single task at ~1/S of a
    hot token's rows. Identical output, equality-pinned in
    tests/test_selection.py.
    """
    tok = tokens(text_col)
    n = F.size(tok)
    big = docs.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(tok, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(tok, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_b"),
    ).select(F.col(id_col), F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))

    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # c1 (context mass) as a rollup of c12 — c1(w1) = sum_w2 c12(w1,w2),
    # exact integers — instead of a second groupBy over the corpus-sized
    # bigram stream: removes one full tokenize+explode derivation of
    # `big` AND its corpus-sized w1 exchange (guide §2.3/§2.4); the
    # rollup input is the vocabulary-sized c12 table. Same trick
    # kneser_ney_logloss already uses for ctx/cont/types.
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        docs.select(F.explode(tok).alias("_t"))
        .agg(F.count_distinct("_t").alias("v"))
    )
    p = (F.col("c12") + F.lit(1)).cast("double") / (
        F.col("c1") + F.col("v")
    ).cast("double")
    # r12 (guide §2.3): consolidate the model FIRST — c12 ⨝ c1 is a
    # vocabulary-sized join, so the corpus-sized bigram stream is
    # shuffled ONCE for the model attach instead of once per model
    # table (the old big ⨝ c12 ⨝ c1 chain re-exchanged the corpus on
    # w1 after the (w1,w2) join); in the salted path this also halves
    # the salted-replicate joins. Same rows bit for bit — every c12
    # key has exactly one c1 row by construction.
    model = c12.join(c1, "w1")
    if salt and salt > 1:
        big_s = big.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(salt))).cast("int"),
        )
        joined = _salted_model_join(
            big_s, model, ["w1", "w2"], salt, id_col
        ).drop("_salt")
    else:
        joined = big.join(model, ["w1", "w2"])
    return (
        joined
        .join(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("xent2"),
        )
    )


def kneser_ney_logloss(
    docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: int | None = None,
) -> DataFrame:
    """Per-document cross-entropy under an in-plan interpolated
    Kneser-Ney bigram LM (Kneser & Ney 1995; the interpolated form of
    Chen & Goodman 1999 eq. 4.25): (id, n_bigrams, kn_xent).

    ``p(w2|w1) = max(c(w1,w2) - D, 0) / c(w1.)
                 + (D * N1+(w1,.) / c(w1.)) * (N1+(.,w2) / N1+(..))``

    where N1+(w1,.) counts distinct continuations of w1, N1+(.,w2)
    distinct left-contexts of w2 (the continuation probability that
    makes KN the strongest count-based smoother), and N1+(..) the total
    distinct bigram types. Scoring the corpus under its own LM: every
    observed bigram has c12 >= 1, the interpolation weight is > 0, so
    p > 0 always. Docs with < 2 tokens have no bigrams and drop out.

    Scale: identical shape to :func:`bigram_logloss` plus one extra
    vocabulary-sized aggregate per side — two token-key groupBys with
    map-side combining, one broadcast scalar, equi-joins on w1 / (w1,w2)
    / w2. All model tables are vocabulary-sized, never corpus-sized.
    ``salt=S`` salts the corpus side of all three model joins by
    ``hash(doc_id) % S`` (replicating each vocab-sized table S times) —
    the explicit Zipf-head mitigation, since the r10/r11 AQE probe
    showed the skew-join split cannot be counted on to fire on this
    shape (BASELINE.md round-11). Identical output, equality-pinned.
    """
    tok = tokens(text_col)
    n = F.size(tok)
    big = docs.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(tok, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(tok, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_b"),
    ).select(F.col(id_col), F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))

    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # c1 (context mass) and N1+(w1,.) from the same shuffle over c12
    ctx = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("fanout")
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n_left"))
    types = c12.agg(F.count(F.lit(1)).alias("n_types"))

    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
        + (d * F.col("fanout") / F.col("c1"))
        * (F.col("n_left").cast("double") / F.col("n_types"))
    )
    # r12 (guide §2.3): consolidate the model FIRST — c12 ⨝ ctx ⨝ cont
    # are vocabulary-sized joins, so the corpus bigram stream is
    # shuffled once for the model attach instead of three times (and
    # the salted path does ONE salted-replicate join instead of three).
    # Same rows bit for bit — every c12 key has exactly one ctx and one
    # cont row by construction.
    model = c12.join(ctx, "w1").join(cont, "w2")
    if salt and salt > 1:
        big_s = big.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(salt))).cast("int"),
        )
        joined = _salted_model_join(
            big_s, model, ["w1", "w2"], salt, id_col
        ).drop("_salt")
    else:
        joined = big.join(model, ["w1", "w2"])
    return (
        joined
        .join(F.broadcast(types))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("kn_xent"),
        )
    )


def _intdiv(a: Column, b) -> Column:
    """Exact integer division of non-negative BIGINTs without leaving the
    Column API: (a - pmod(a, b)) is an exact multiple of b, so the double
    division is exact while values stay < 2^53. A bare ``a / b`` rounds
    the quotient to the nearest double, which can land ON an integer the
    rational quotient sits just below — floor() then disagrees with the
    oracle's integer ``//`` by one."""
    bb = F.lit(b) if isinstance(b, int) else b
    return ((a - F.pmod(a, bb)) / bb).cast("bigint")


def doremi_domain_weights(
    docs: DataFrame,
    eta6: int = 200_000,
    rounds: int = 10,
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DoReMi-style domain mixture reweighting (Xie et al. 2023,
    arXiv:2305.10429), the engine-native deterministic variant:
    multiplicative-weights over domains with per-domain excess loss as
    the Group-DRO signal — high-loss (hard) domains are upweighted.

    Deviations from the paper, by construction: the per-domain loss is
    the corpus's own add-1 bigram LM cross-entropy
    (:func:`bigram_logloss`) instead of a trained proxy model, the MW
    update is the linear Hedge form ``w *= 1 + eta * excess`` instead of
    exponential, and the output is the final-round weights rather than
    the per-round average. Every step is fixed-point integer math
    (1e-6 resolution, exact integer sums / truncating divisions), so the
    weights are bit-identical on any engine and partitioning:

    * loss6(d)  = intdiv(sum over docs of round(xent2 * 1e6), n_docs)
    * excess6(d)= intdiv((loss6 - min6) * 1e6, max6 - min6)   (0 if flat)
    * T rounds of w = intdiv(w * (1e6 + intdiv(eta6 * excess6, 1e6)), 1e6)
      starting from w = 1e6; per-domain independent, so the iteration is
      one narrow fold per row — no per-round shuffle or driver loop.
    * weight(d) = round(w_T / sum w_T, 6)

    Bounds: excess6 <= 1e6, so the per-round multiplier <= 1e6 + eta6;
    with eta6 = 0.2e6 and T = 10, w_T <= 1e6 * 1.2^10 < 6.2e6 and every
    intermediate product < 2^43 — no int64 (or double-exactness) risk.

    Scale: the corpus-heavy step is the bigram LM (vocabulary-sized
    aggregates); everything after is a |domains|-row table. One
    broadcast of the 2-value min/max row and one of the weight total.
    """
    per_doc = bigram_logloss(docs, text_col=text_col, id_col=id_col)
    joined = docs.select(F.col(id_col), F.col(domain_col).alias("domain")).join(
        per_doc, id_col
    )
    dom = joined.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(F.col("xent2") * LOG_SCALE).cast("bigint")).alias("_s6"),
    )
    dom = dom.select(
        "domain", "n_docs", _intdiv(F.col("_s6"), F.col("n_docs")).alias("loss6")
    )
    mm = dom.agg(F.min("loss6").alias("_lo"), F.max("loss6").alias("_hi"))
    dom = dom.join(F.broadcast(mm)).withColumn(
        "_ex6",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("bigint")).otherwise(
            _intdiv(
                (F.col("loss6") - F.col("_lo")) * LOG_SCALE,
                F.col("_hi") - F.col("_lo"),
            )
        ),
    )
    mult = F.lit(LOG_SCALE).cast("bigint") + _intdiv(
        F.lit(int(eta6)) * F.col("_ex6"), LOG_SCALE
    )
    w_t = F.aggregate(
        F.sequence(F.lit(1), F.lit(int(rounds))),
        F.lit(LOG_SCALE).cast("bigint"),
        lambda acc, _: _intdiv(acc * mult, LOG_SCALE),
    )
    dom = dom.select("domain", "n_docs", "loss6", w_t.alias("_w"))
    tot = dom.agg(F.sum("_w").alias("_tot"))
    return dom.join(F.broadcast(tot)).select(
        "domain",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "loss6",
        F.round(F.col("_w") / F.col("_tot"), 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# BPE merge-pair counting (the distributed step of tokenizer induction)


def char_array(col: Column | str) -> Column:
    """Characters of a string as an array — sequence + substring (both
    engines index strings the same way; regex-split-on-empty differs
    between Java regex and RE2, so it is avoided).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        lambda i: F.substring(c, i, F.lit(1)),
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
) -> DataFrame:
    """Corpus-weighted adjacent-symbol-pair counts — ONE round of the
    BPE tokenizer-induction inner loop (Sennrich et al. 2016,
    arXiv:1508.07909), distributed: (left, right, cnt).

    Symbols start as characters with a ``</w>`` end-of-word marker on
    the last one. The induction loop is: count pairs (this operator) ->
    merge argmax -> recount; each iteration is the same aggregate over
    the *word-frequency table*, which is vocabulary-sized, not
    corpus-sized — the corpus is touched exactly once.

    Determinism: counts are integers; ordering (cnt DESC, lhs, rhs)
    is total. ``top_n`` limits the result (partial top-k at scale).
    """
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = char_array(F.col("word"))
    n = F.size(chars)
    symbols = F.concat(
        F.slice(chars, 1, F.greatest(n - 1, F.lit(0))),
        F.array(F.concat(F.element_at(chars, -1), F.lit("</w>"))),
    )
    pairs = F.zip_with(
        F.slice(symbols, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(symbols, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    counted = (
        words.select("freq", F.explode(pairs).alias("_p"))
        .select("freq", F.col("_p.lhs").alias("lhs"), F.col("_p.rhs").alias("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.sum("freq").alias("cnt"))
    )
    out = counted.orderBy(F.desc("cnt"), "lhs", "rhs")
    return out.limit(top_n) if top_n is not None else out


def learn_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """TRUE iterative BPE learning (Sennrich et al. 2016, Algorithm 1):
    repeatedly take the most frequent adjacent symbol pair and merge
    ALL its occurrences in the vocabulary, re-counting after each merge
    (a one-shot top-N of initial pair counts is NOT the same ranking —
    later merges depend on earlier ones).

    Pure Python over the word-frequency dict; deterministic tie-break
    (count DESC, pair ASC). Words carry the ``</w>`` marker.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs.items():
        if not word:
            continue
        syms = list(word)
        syms[-1] += "</w>"
        vocab[tuple(syms)] = vocab.get(tuple(syms), 0) + freq

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + freq
        vocab = new_vocab
    return merges


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    sample_fraction: float | None = None,
) -> list[tuple[str, str]]:
    """Distributed word-frequency count -> driver-side iterative BPE.

    The collect is VOCABULARY-sized (the documented driver-resident
    model artifact, same as the k-means centroids); at crawl scale pass
    ``sample_fraction`` — tokenizer induction on a few million sampled
    documents is the standard practice, the corpus never loops through
    Python. Use with :func:`bpe_apply`/:func:`bpe_encode_corpus` for
    encode.
    """
    src = docs
    if sample_fraction is not None:
        src = docs.sample(fraction=sample_fraction, seed=7)
    wf = {
        r["word"]: r["freq"]
        for r in (
            src.select(F.explode(tokens(text_col)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
            .collect()
        )
    }
    return learn_bpe(wf, n_merges)


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the
    lowest-ranked adjacent pair, leftmost occurrence first — the
    tiktoken/GPT-2 encode-time semantics (merge ONE occurrence, then
    re-evaluate; a merge can create a better-ranked pair).

    The word carries the same ``</w>`` end-of-word marker as
    :func:`bpe_pair_counts`, so learned pairs apply verbatim.
    """
    s = list(word)
    if s:
        s[-1] += "</w>"
    while len(s) > 1:
        best, pos = None, -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best is None or r < best):
                best, pos = r, i
        if best is None:
            break
        s[pos : pos + 2] = [s[pos] + s[pos + 1]]
    return s


def bpe_apply(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Tokenize each distinct word with a ranked merge list: adds
    ``bpe`` (array<string>) and ``n_bpe`` columns.

    ``merges`` is ordered by priority (index = rank) — e.g. the rows of
    :func:`bpe_pair_counts` ordered (cnt DESC, lhs, rhs). The loop is
    inherently sequential per word, so it runs as an Arrow-batched
    pandas UDF over the *vocabulary* table — corpus-size-independent;
    the corpus itself is only aggregated and joined, never pushed
    through Python.
    """
    import pandas as pd

    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = T.StructType(
        list(words.schema)
        + [
            T.StructField("bpe", T.ArrayType(T.StringType())),
            T.StructField("n_bpe", T.LongType()),
        ]
    )

    def _run(batches):
        for pdf in batches:
            enc = [bpe_encode_word(w, ranks) for w in pdf[word_col]]
            out = pdf.copy()
            out["bpe"] = enc
            out["n_bpe"] = pd.Series([len(e) for e in enc], dtype="int64")
            yield out

    return words.mapInPandas(_run, schema=schema)


def bpe_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary induced by the merge list over this corpus:
    (token, token_id, freq) with ids assigned by (freq DESC, token) —
    the conventional frequency-ordered id space. Ids must be globally
    dense, so they come from the distributed exact rank (operators/
    ranking.py) rather than a vocabulary-sized single-partition
    window."""
    from rag_content_spark.operators.ranking import exact_global_rank

    wc = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wfreq"))
    )
    pieces = (
        bpe_apply(wc, merges, word_col="word")
        .select("wfreq", F.explode("bpe").alias("token"))
        .groupBy("token")
        .agg(F.sum("wfreq").alias("freq"))
    )
    ranked = exact_global_rank(
        pieces, [F.desc("freq"), F.asc("token")], rank_col="_rk"
    )
    return ranked.select(
        "token", (F.col("_rk") - 1).cast("int").alias("token_id"), "freq"
    )


def bpe_encode_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Encode every document to integer token ids: (id, token_ids).

    Shape: the Python BPE loop touches each DISTINCT word once
    (:func:`bpe_apply`); documents explode to (id, pos, word), join the
    word -> ids map, and regroup with order restored via
    sort_array-of-structs (deterministic on any partitioning). The
    word join is Zipf-skewed — AQE splits the hot heads.
    """
    if vocab is None:
        vocab = bpe_vocab(docs, merges, text_col)
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .distinct()
    )
    word_ids = (
        bpe_apply(words, merges, word_col="word")
        .select("word", F.posexplode("bpe").alias("ppos", "token"))
        .join(vocab.select("token", "token_id"), "token")
        .groupBy("word")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ppos", "token_id"))),
                lambda s: s["token_id"],
            ).alias("_ids")
        )
    )
    return (
        docs.select(F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "word"))
        .join(word_ids, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "_ids"))),
                    lambda s: s["_ids"],
                )
            ).alias("token_ids")
        )
    )


def bpe_token_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token statistics under a learned merge list:
    (id, n_tokens, n_bpe, compression).

    Shape: corpus -> (id, word, cnt) aggregate -> distinct-word BPE via
    :func:`bpe_apply` -> join back -> weighted sum. The Python stage
    touches each distinct word once; the per-doc join input is the
    (id, word) aggregate, not the raw token stream. Token keys are
    Zipf-skewed — AQE splits the hot heads.
    """
    wc = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = bpe_apply(wc.select("word").distinct(), merges)
    return (
        wc.join(vocab.select("word", "n_bpe"), "word")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("n_bpe")).alias("n_bpe"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_bpe",
            F.round(
                F.col("n_bpe").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("compression"),
        )
    )


def hashed_ngram_buckets_np(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    flag_col: str | None = None,
) -> DataFrame:
    """Vectorized EXACT twin of :func:`hashed_ngram_buckets`: per-doc
    (id, bucket, cnt) computed inside each Arrow batch — tokenization
    via the byte-for-byte Java ``\\s`` class, one md5 per DISTINCT
    ngram per batch (pd.factorize), per-doc counts via bincount.

    Structural, not numerical, exactness: every output is an integer
    and the bucket map is the identical md5-mod. Beyond removing the
    interpreted expression tree, this eliminates the corpus-sized
    ngram explode ahead of the (id, bucket) aggregation entirely —
    counts are per-document-local, so they reduce to final form inside
    the batch and nothing corpus-sized ever shuffles (guide §2.3 taken
    to its limit: aggregate BEFORE the exchange, here before even
    leaving the task). Row-for-row equality with the declarative path
    is pinned in tests/test_selection.py.

    ``flag_col`` names an optional boolean column of ``docs`` carried
    through unchanged (constant per document) — the
    :func:`dsir_log_weights` ``target_flag`` path uses it so the target
    bucket distribution can be derived from the SAME feature pass
    instead of re-tokenizing the target slice.
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    import pyspark.sql.types as T

    split_re = re.compile("[ \t\n\x0b\f\r]+")
    fields = [
        T.StructField(id_col, docs.schema[id_col].dataType),
        T.StructField("bucket", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
    if flag_col is not None:
        fields.append(T.StructField(flag_col, T.BooleanType()))
    schema = T.StructType(fields)

    def _feats(batches):
        cache: dict[str, int] = {}
        for pdf in batches:
            flat: list[str] = []
            starts: list[int] = []
            ids = []
            flags = []
            row_flags = (
                pdf[flag_col] if flag_col is not None else [None] * len(pdf)
            )
            for did, text, flg in zip(pdf[id_col], pdf[text_col], row_flags):
                if text is None:
                    continue
                toks = [t for t in split_re.split(text) if t]
                starts.append(len(flat))
                flat.extend(toks)
                flat.extend(
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                )
                ids.append(did)
                flags.append(flg)
            if not ids:
                continue
            starts.append(len(flat))
            codes, vocab = pd.factorize(np.asarray(flat, dtype=object))
            vb = np.empty(len(vocab), dtype=np.int64)
            for i, g in enumerate(vocab):
                h = cache.get(g)
                if h is None:
                    h = (
                        int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                        % buckets
                    )
                    cache[g] = h
                vb[i] = h
            bkt = vb[codes]
            out_id, out_b, out_c, out_f = [], [], [], []
            for k, did in enumerate(ids):
                seg = bkt[starts[k] : starts[k + 1]]
                if len(seg) == 0:
                    continue
                counts = np.bincount(seg, minlength=0)
                nz = np.nonzero(counts)[0]
                out_id.extend([did] * len(nz))
                out_b.extend(nz.tolist())
                out_c.extend(counts[nz].tolist())
                if flag_col is not None:
                    out_f.extend([flags[k]] * len(nz))
            data = {id_col: out_id, "bucket": out_b, "cnt": out_c}
            if flag_col is not None:
                data[flag_col] = pd.array(out_f, dtype="boolean")
            yield pd.DataFrame(data)

    cols = [id_col, text_col] + ([flag_col] if flag_col is not None else [])
    return docs.select(*cols).mapInPandas(_feats, schema=schema)
