"""Training-data quality operators (north-star extension): PII scrubbing,
intra-document repetition, benchmark contamination, deterministic
stratified sampling. All declarative (no UDFs), all oracle-checkable.

These are the standard large-corpus curation steps (dedup lives in
operators/dedup.py); each is designed as a narrow map or a single
hash-key shuffle so it composes into a 100 TB curation run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.functions.text import tokens

# Conservative public patterns (emails / international-ish phone runs /
# IPv4). RE2-compatible: no lookarounds, usable verbatim in DuckDB.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9() -]{7,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(text_col: Column | str = "text") -> dict[str, Column]:
    """Per-kind PII match counts (regexp_extract_all size)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }


def scrub_pii(text_col: Column | str = "text") -> Column:
    """Redact all PII patterns with [<KIND>] placeholders. Email runs
    first so its digits/dots aren't half-eaten by phone/ip patterns."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for kind in ("email", "phone", "ipv4"):
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return c


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition measures (Gopher-style quality rules):

    - dup_token_frac   : 1 - distinct/total whitespace tokens
    - top_bigram_frac  : occurrences of the most frequent bigram / total
                         bigrams (computed via explode + groupBy — the
                         shape that scales; an in-array histogram is
                         O(n^2) per row)
    """
    tok = tokens(text_col)
    base = docs.select(
        F.col(id_col),
        F.size(tok).alias("_n_tok"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(tok)) / F.greatest(F.size(tok), F.lit(1)),
            6,
        ).alias("dup_token_frac"),
    )
    # slice BOTH sides to n-1: zip_with pads the shorter array with nulls,
    # which would fabricate a degenerate trailing "bigram"
    n_minus_1 = F.greatest(F.size(tok) - 1, F.lit(0))
    bigram = docs.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(tok, 1, n_minus_1),
                F.slice(tok, 2, n_minus_1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    top = (
        bigram.groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col)
        .agg(
            F.max("_cnt").alias("_top"),
            F.sum("_cnt").alias("_total"),
        )
        .select(
            F.col(id_col),
            F.round(F.col("_top") / F.col("_total"), 6).alias("top_bigram_frac"),
        )
    )
    return base.join(top, id_col, "left").select(
        id_col, "dup_token_frac", F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac")
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark-contamination score: fraction of a document's distinct
    shingles that appear anywhere in the benchmark set.

    Shape: explode doc shingles -> left SEMI join the (deduplicated,
    typically broadcastable) benchmark shingle set -> per-doc ratio.
    """
    from rag_content_spark.operators.dedup import hashed_shingles

    doc_sh = docs.select(
        F.col(id_col), F.explode(hashed_shingles(text_col, n=shingle_n)).alias("sh")
    )
    bench_sh = (
        benchmark.select(
            F.explode(hashed_shingles(text_col, n=shingle_n)).alias("sh")
        )
        .distinct()
    )
    totals = doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_total"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "sh", "leftsemi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.round(
                F.coalesce(F.col("_hits"), F.lit(0)) / F.col("_total"), 6
            ).alias("contamination"),
        )
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "samp",
) -> DataFrame:
    """Deterministic hash-based stratified sampling: keep a row iff
    stable_hash64(salt:id) % 10000 < rate[stratum] * 10000.

    Unlike ``df.sample`` this is reproducible across runs/engines and
    exactly restartable — the property a curation pipeline needs.
    """
    bucket = stable_hash64(F.col(id_col).cast("string"), salt=salt) % 10000
    rate = F.lit(None).cast("double")
    expr = None
    for stratum, r in rates.items():
        cond = F.col(stratum_col) == stratum
        expr = F.when(cond, F.lit(r)) if expr is None else expr.when(cond, F.lit(r))
    rate = expr.otherwise(F.lit(0.0))
    return df.filter(bucket < rate * 10000)
