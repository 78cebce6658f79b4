"""Text analysis operators (north-star extension: training-data pipeline).

Language-ID (stopword-ratio heuristic), quality scoring, token counting,
and document fingerprinting — all pure Column expressions over the
``documents`` table, each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from rag_content_spark.functions.hashing import stable_hash64
from rag_content_spark.functions.text import tokens

# Tiny deterministic stopword lists — heuristic language IDs, not real
# linguistics; the point is the operator shape (per-token set membership
# ratios, argmax across languages) which is what a real fastText-style
# scorer would replace via pandas_udf.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "de", "et", "un", "les", "des", "en", "du", "que"),
    "de": ("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"),
}

# BPE-ish word/number/symbol tokenization (reference has none; this is the
# token-counting extension).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def stopword_ratio(text_col: Column | str, lang: str) -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    tok = tokens(text_col)
    hits = F.size(F.filter(tok, lambda t: F.lower(t).isin(*STOPWORDS[lang])))
    return hits / F.greatest(F.size(tok), F.lit(1))


def lang_scores(text_col: Column | str = "text") -> Column:
    """ARRAY<STRUCT<lang, score>> of stopword ratios, one per language."""
    return F.array(
        *[
            F.struct(
                F.lit(lang).alias("lang"),
                F.round(stopword_ratio(text_col, lang), 6).alias("score"),
            )
            for lang in sorted(STOPWORDS)
        ]
    )


def detected_lang(text_col: Column | str = "text") -> Column:
    """Argmax language by stopword ratio; ties break alphabetically
    (array_max over struct(score, lang) — struct ordering is
    lexicographic in both Spark and DuckDB)."""
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.round(stopword_ratio(text_col, lang), 6).alias("score"),
                    # invert lang for alphabetical ties on max
                    F.lit(lang).alias("lang"),
                )
                for lang in sorted(STOPWORDS, reverse=True)
            ]
        )
    )
    return best["lang"]


def whitespace_token_count(text_col: Column | str = "text") -> Column:
    return F.size(tokens(text_col))


def regex_token_count(text_col: Column | str = "text") -> Column:
    """Count of BPE-ish regex tokens.

    DuckDB: len(regexp_extract_all(x, pattern))
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def quality_score(text_col: Column | str = "text") -> Column:
    """Composite quality heuristic in [0, 1]:

    0.4 * mean-token-length score (ideal 3-10 chars)
    + 0.4 * english stopword-ratio score (ideal >= 0.05)
    + 0.2 * non-alnum-ratio penalty

    A real pipeline swaps the formula; the operator shape (pure column
    math, no shuffle) is the point.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    tok = tokens(c)
    n_tok = F.greatest(F.size(tok), F.lit(1))
    mean_len = F.aggregate(
        tok, F.lit(0.0), lambda a, t: a + F.length(t).cast("double")
    ) / n_tok
    len_score = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    sw_score = F.when(stopword_ratio(c, "en") >= 0.05, F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    n_chars = F.greatest(F.length(c), F.lit(1))
    non_alnum = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    punct_score = F.lit(1.0) - F.least(
        non_alnum.cast("double") / n_chars * 5, F.lit(1.0)
    )
    return F.round(
        len_score * 0.4 + sw_score * 0.4 + punct_score * 0.2, 6
    )


def fingerprint(
    text_col: Column | str = "text", shingle_n: int = 3, k: int = 8
) -> Column:
    """Bottom-k document fingerprint: the k smallest stable hashes of the
    document's word n-gram shingles, as a sorted ARRAY<BIGINT>.

    Two documents' fingerprint overlap estimates their Jaccard similarity
    (bottom-k sketch); unlike MinHash it needs one hash pass.
    """
    tok = tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(tok) - shingle_n, F.lit(0)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(tok, i + 1, shingle_n), " "))
    )
    hashes = F.array_sort(F.transform(grams, lambda g: stable_hash64(g)))
    return F.slice(hashes, 1, k)


def zscore_lengths_grouped(docs, group_col: str = "source"):
    """Per-group z-score of document length, as a GROUPED-MAP pandas UDF
    (applyInPandas): the custom-per-group-computation shape (the same
    plumbing a per-group normalization of embeddings would use).

    Statistics use exact integer sums (population variance), so the
    result is engine-reproducible and the DuckDB oracle is a plain
    window expression.
    """
    import pandas as pd

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField(group_col, T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("z", T.DoubleType()),
        ]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        s = int(pdf["n_chars"].sum())
        sq = int((pdf["n_chars"].astype("int64") ** 2).sum())
        mean = s / n
        var = sq / n - mean * mean
        std = var**0.5 if var > 0 else 0.0
        z = (pdf["n_chars"] - mean) / std if std > 0 else pdf["n_chars"] * 0.0
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                group_col: pdf[group_col],
                "n_chars": pdf["n_chars"],
                "z": z.round(6),
            }
        )

    return (
        docs.select("doc_id", group_col, F.col("n_chars"))
        .groupBy(group_col)
        .applyInPandas(_z, schema=schema)
    )


def char_trigrams(text_col, max_chars: int = 200):
    """Distinct character trigrams of the first ``max_chars`` chars
    (lowercased). Bounded cost per row regardless of document size.

    DuckDB: list_distinct(list_transform(generate_series(1, n-2),
              i -> t[i:i+2])) over lower(substr(text,1,max_chars)).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.lower(F.substring(c, 1, max_chars))
    n = F.length(t)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
            lambda i: t.substr(i, F.lit(3)),
        )
    )


def lang_trigram_profile(lang: str) -> list[str]:
    """Deterministic per-language trigram profile: the distinct char
    trigrams of the language's stopword list (a tiny stand-in for a real
    trained profile — the operator shape is what matters)."""
    grams = set()
    for w in STOPWORDS[lang]:
        w = w.lower()
        for i in range(max(len(w) - 2, 1)):
            grams.add(w[i : i + 3])
    return sorted(grams)


def trigram_lang_score(text_col, lang: str) -> Column:
    """Fraction of the document's distinct char trigrams found in the
    language profile — array_intersect against a literal profile array
    (narrow, no shuffle; profiles are constants)."""
    doc = char_trigrams(text_col)
    profile = F.array(*[F.lit(g) for g in lang_trigram_profile(lang)])
    return F.round(
        F.size(F.array_intersect(doc, profile))
        / F.greatest(F.size(doc), F.lit(1)),
        6,
    )


def top_ngrams(
    docs,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
):
    """Corpus-wide top-k word n-grams (count desc, n-gram asc tiebreak).

    The workhorse of corpus analyses (boilerplate discovery, benchmark
    decontamination prep, quality dashboards). One narrow explode + one
    hash aggregate on the n-gram — partial (map-side) aggregation does
    the heavy lifting at 100 TB, and the final top-k is a TakeOrdered,
    not a global sort.
    """
    from rag_content_spark.operators.dedup import let

    # NB: Spark's sequence(0, stop) auto-steps DOWNWARD for stop < 0, so
    # short docs need an explicit empty-array branch, not a clamp.
    # let-bound: without it the tokens() regex split is re-evaluated PER
    # N-GRAM ELEMENT inside the transform lambda (no lambda CSE) —
    # measured 3.9 s -> sub-second on the sf0.1 top_bigrams query.
    grams = let(
        tokens(text_col),
        lambda tok: F.when(
            F.size(tok) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tok) - n),
                lambda i: F.array_join(F.slice(tok, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("ngram"))
        .limit(k)
    )


def unigram_logloss(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    probs=None,
):
    """Per-document cross-entropy under the corpus unigram LM — the
    classic perplexity-proxy quality score (high = unusual token mix;
    a real pipeline swaps in a KenLM pandas_udf at the same plan point).

    ``probs`` is an optional materialized (token, p) table — at 100 TB
    the LM is estimated once per snapshot and broadcast/shuffle-joined;
    when omitted it is estimated in-plan from the same corpus. Unseen
    tokens (only possible with a supplied LM) back off to 1/total_count.

    xent = avg over tokens of -ln p(token), rounded to 6 (float-sum
    order tolerance).
    """
    exploded = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    if probs is None:
        counts = exploded.groupBy("token").agg(
            F.count(F.lit(1)).alias("_c")
        )
        total = counts.agg(F.sum("_c").alias("_total"))
        probs = counts.join(F.broadcast(total)).select(
            "token",
            (F.col("_c").cast("double") / F.col("_total")).alias("p"),
            F.col("_total"),
        )
    elif "_total" not in probs.columns:
        raise ValueError(
            "supplied probs must carry (token, p, _total) — _total drives "
            "the 1/_total unseen-token backoff"
        )
    # the backoff total rides a broadcast one-row frame: an OOV token has
    # no probs row, so _total must NOT come from the (null) joined row
    bt = probs.agg(F.max("_total").alias("_bt"))
    joined = exploded.join(F.broadcast(bt)).join(
        probs.drop("_total"), "token", "left"
    )
    p = F.coalesce(F.col("p"), F.lit(1.0) / F.col("_bt").cast("double"))
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(p)), 6).alias("xent"),
        )
    )


def extract_code_blocks(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Markdown code-fence extraction — the step that builds a CODE
    corpus out of documentation: (id, block_index, lang, code, n_lines)
    with one row per fenced block, ``lang`` from the opening marker's
    info string (``\\`\\`\\`python`` -> ``python``, bare fence -> '').

    Fence state is the running parity of marker lines (a cumulative
    window per document — no Python in the loop): a non-marker line is
    inside a block iff the marker count before it is odd; the opening
    marker's tag rides forward via last(ignorenulls) over the same
    window. An unclosed trailing fence keeps its lines (deterministic
    choice, documented — same reading as the P3 content filter's fence
    state). Empty blocks vanish (no lines to group).

    Scale shape: one narrow explode + two window passes partitioned by
    document + one groupBy(document, block) — shuffles only on the
    document id, and AQE coalesces the tiny block table.
    """
    from pyspark.sql import DataFrame, Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_idx", "_line"),
    )
    stripped = F.regexp_replace(F.col("_line"), r"(^\s+)|(\s+$)", "")
    marker = stripped.startswith("```")
    w = (
        Window.partitionBy(id_col)
        .orderBy("_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lines.select(
        id_col,
        "_idx",
        "_line",
        F.sum(marker.cast("int")).over(w).alias("_cum"),
        F.last(
            F.when(marker, F.trim(F.substring(stripped, 4, 1_000_000))),
            ignorenulls=True,
        )
        .over(w)
        .alias("_lang"),
        marker.alias("_m"),
    )
    in_block = (~F.col("_m")) & (F.col("_cum") % 2 == 1)
    return (
        tagged.filter(in_block)
        .groupBy(id_col, ((F.col("_cum") - 1) / 2).cast("bigint").alias("block_index"))
        .agg(
            F.max("_lang").alias("lang"),  # constant within a block
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_idx"), F.col("_line")))
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("code"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# Unicode script ranges as literal-character classes — the same literal
# pattern strings work in Java regex (Spark) and RE2 (DuckDB), so both
# engines count identical characters.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z",
    "digit": "0-9",
    "cjk": "一-鿿぀-ヿ가-힯",
    "cyrillic": "Ѐ-ӿ",
    "arabic": "؀-ۿ",
    "greek": "Ͱ-Ͽ",
}


def script_counts(text_col="text"):
    """STRUCT of per-script character counts — count = length after
    deleting every char OUTSIDE the range (one regexp_replace per
    script, all JVM-side)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    fields = [
        F.length(F.regexp_replace(c, f"[^{rng}]", "")).cast("bigint").alias(name)
        for name, rng in SCRIPT_RANGES.items()
    ]
    return F.struct(*fields)


def dominant_script(text_col="text"):
    """Name of the script with the most characters; ties resolve in
    SCRIPT_RANGES declaration order (deterministic); all-zero -> 'none'.
    greatest + first-equal keeps each count expression to two uses (no
    lambda-CSE in Catalyst — see COVERAGE scale note 1)."""
    s = script_counts(text_col)
    names = list(SCRIPT_RANGES)
    maxc = F.greatest(*[s[n] for n in names])
    pick = F.when(s[names[0]] == maxc, F.lit(names[0]))
    for name in names[1:]:
        pick = pick.when(s[name] == maxc, F.lit(name))
    return F.when(maxc > 0, pick).otherwise(F.lit("none"))
