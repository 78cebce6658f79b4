"""Chunking operators — the reference's one "explode" (SURVEY §2.3).

The reference delegates to llama-index's ``SentenceSplitter`` (token-based,
chunk_size=380 / overlap=0 defaults, reference document_processor.py:113-121,
utils.py:94-95) and ``MarkdownNodeParser`` (heading-structure split,
reference document_processor.py:115-117,128-129). Those implementations are
model-tokenizer-coupled and single-process; here chunking is a deterministic,
fully declarative Spark plan:

- tokenizer   = whitespace tokens (deterministic; swap in a Pandas-UDF BPE
  tokenizer for model-exact packing without changing the plan shape)
- chunk i     = tokens[i*stride : i*stride + size], stride = size - overlap
- chunk_id    = "<doc_id>#<i>" (the reference derives chunk ids from node
  ids the same parent-child way, document_processor.py:445-457)

Scale: ``explode`` over a per-row generated index array is a narrow
transformation — no shuffle; each input partition chunks independently.
100 TB of documents chunk in one map stage.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from rag_content_spark.functions.text import tokens

DEFAULT_CHUNK_SIZE = 380  # reference utils.py:94
DEFAULT_CHUNK_OVERLAP = 0  # reference utils.py:95


def chunk_count(tok: Column, size: int, overlap: int) -> Column:
    """ceil(max(n - overlap, 1) / stride) — at least one chunk per doc."""
    stride = size - overlap
    n = F.size(tok)
    return F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride)).cast(
        "int"
    )


def chunk_fixed(
    df: DataFrame,
    text_col: str = "text",
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """Token-window chunker (C1). Adds ``chunk_index``, ``chunk_text``,
    ``chunk_tokens``; keeps all other columns.

    Equivalent DuckDB shape (for oracles): generate per-row ``i`` via a
    range cross-join bounded by the same chunk count, then
    ``array_to_string(tk[i*stride+1 : i*stride+size], ' ')``.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    tok = tokens(F.col(text_col))
    out = (
        df.withColumn("_tok", tok)
        .withColumn("_n_chunks", chunk_count(F.col("_tok"), size, overlap))
        .select(
            "*",
            F.posexplode(F.sequence(F.lit(0), F.col("_n_chunks") - 1)).alias(
                "chunk_index", "_i"
            ),
        )
        .withColumn(
            "_slice", F.slice(F.col("_tok"), F.col("chunk_index") * stride + 1, size)
        )
        .withColumn("chunk_text", F.array_join(F.col("_slice"), " "))
        .withColumn("chunk_tokens", F.size(F.col("_slice")))
        .drop("_tok", "_n_chunks", "_i", "_slice")
    )
    return out


# Sentinel used to mark heading starts before splitting; chr(1) cannot occur
# in real text and both engines can produce it (chr(1)).
_SENTINEL = ""


def split_markdown(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Markdown heading splitter (C2, reference MarkdownNodeParser usage at
    document_processor.py:128-129): one chunk per heading-delimited section;
    a leading section without a heading is kept.

    Adds ``section_index``, ``section_text`` (trimmed), drops empty sections.
    Implementation: tag heading lines with a sentinel and split on it —
    pure narrow ops, no shuffle. Fence-aware like MarkdownNodeParser
    (and the exact P3 filter): a ``#`` line inside a code fence is
    content, not a section break. Fence state per line is the parity of
    fence-opener lines before it — a prefix count over the line array
    (O(lines^2) integer ops per doc; docs are line-bounded upstream).
    """
    from rag_content_spark.operators.dedup import let

    def _tag(ls):
        marks = F.transform(
            ls,
            lambda l: F.when(
                F.ltrim(l).startswith(F.lit("```")), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        return let(
            marks,
            lambda mk: F.array_join(
                F.transform(
                    ls,
                    lambda l, i: F.when(
                        l.rlike(r"^#{1,6} ")
                        & (
                            F.aggregate(
                                F.slice(mk, 1, i),
                                F.lit(0),
                                lambda a, x: a + x,
                            )
                            % 2
                            == 0
                        ),
                        F.concat(F.lit(_SENTINEL), l),
                    ).otherwise(l),
                ),
                "\n",
            ),
        )

    # fast path: no fence anywhere -> the O(lines^2) prefix count is
    # pure overhead (measured +20% on the fence-free build pipeline);
    # the regex tag is per-row conditional so only fence docs pay
    tagged = F.when(
        F.col(text_col).contains("```"),
        let(F.split(F.col(text_col), "\n"), _tag),
    ).otherwise(
        F.regexp_replace(
            F.col(text_col), r"(?m)^(#{1,6} )", _SENTINEL + "$1"
        )
    )
    # trim(col) strips only spaces in both Spark and DuckDB; pass the full
    # whitespace set explicitly so sections don't keep trailing newlines.
    sections = F.filter(
        F.transform(F.split(tagged, _SENTINEL), lambda s: F.trim(s, F.lit(" \t\r\n"))),
        lambda s: s != "",
    )
    return (
        df.withColumn("_sections", sections)
        .select(
            "*",
            F.posexplode(F.col("_sections")).alias("section_index", "section_text"),
        )
        .drop("_sections")
    )


def section_title(section_col: Column | str = "section_text") -> Column:
    """Heading text of a markdown section ('' for preamble sections)."""
    c = F.col(section_col) if isinstance(section_col, str) else section_col
    return F.regexp_replace(
        F.regexp_extract(c, r"^(#{1,6} [^\n]*)", 1), r"^#{1,6} ", ""
    )


# --------------------------------------------------------------------------
# C1 sentence-aware packing (SentenceSplitter semantics, reference
# document_processor.py:113-121). llama-index packs whole sentences into
# token-budget chunks, window-splits oversized sentences by words, and
# carries a sentence tail of up to `overlap` tokens into the next chunk.
# Re-expressed deterministically: sentence boundary = [.!?] followed by
# whitespace; tokens = whitespace tokens (swap chunk_sentences_with_
# tokenizer for model-BPE counting). Punkt-exact boundaries are out of
# scope (llama-index/nltk not in scope); the packing rules are the spec.

_SENT_SENTINEL = "\x02"


def sentence_array(col: Column | str) -> Column:
    """Split text into sentences: break after [.!?]+ followed by
    whitespace; trims each sentence, drops empties.

    DuckDB: regexp_replace(x, '([.!?])\\s+', '\\1' || chr(2), 'g') then
    split on chr(2), trim ' \\t\\r\\n', filter non-empty."""
    c = F.col(col) if isinstance(col, str) else col
    tagged = F.regexp_replace(c, r"([.!?])\s+", "$1" + _SENT_SENTINEL)
    return F.filter(
        F.transform(
            F.split(tagged, _SENT_SENTINEL),
            lambda s: F.trim(s, F.lit(" \t\r\n")),
        ),
        lambda s: s != "",
    )


def _sentence_items(sents: Column, size: int) -> Column:
    """(text, token_count) items; sentences over ``size`` tokens are
    window-split into <= size-token word pieces (llama-index recursively
    splits oversized sentences by words; the merge step then packs the
    remainder piece with following sentences, which the fold reproduces)."""

    def pieces(s: Column) -> Column:
        tk = tokens(s)
        n = F.size(tk)
        nw = F.ceil(n / F.lit(size)).cast("int")
        whole = F.array(F.struct(s.alias("t"), n.alias("k")))
        windows = F.transform(
            F.sequence(F.lit(0), nw - 1),
            lambda w: F.struct(
                F.array_join(F.slice(tk, w * size + 1, size), " ").alias("t"),
                F.least(F.lit(size), n - w * size).alias("k"),
            ),
        )
        return F.when(n <= size, whole).otherwise(windows)

    return F.flatten(F.transform(sents, pieces))


def _pack_fold(items: Column, size: int, overlap: int) -> Column:
    """Greedy sentence packing as one aggregate fold (JVM-side, no UDF).

    State: (chunks: closed chunk texts, cur: open chunk's (t, k) items,
    cur_toks). Closing a chunk seeds the next one with the maximal
    sentence suffix whose token sum fits the overlap budget — the
    suffix-sum condition is monotone, so a per-element filter computes
    the same tail a reverse scan would."""
    empty_cur = F.array().cast("array<struct<t:string,k:int>>")

    def _st(chunks: Column, cur: Column, cur_toks: Column) -> Column:
        return F.struct(
            chunks.alias("chunks"), cur.alias("cur"), cur_toks.alias("cur_toks")
        )

    def _toksum(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0), lambda a, y: a + y["k"])

    def _tail(cur: Column) -> Column:
        if overlap <= 0:
            return empty_cur
        return F.filter(
            cur,
            lambda y, i: _toksum(F.slice(cur, i + 1, F.size(cur)))
            <= F.lit(overlap),
        )

    def step(acc: Column, x: Column) -> Column:
        close = (F.size(acc["cur"]) > 0) & (
            acc["cur_toks"] + x["k"] > F.lit(size)
        )
        tail = _tail(acc["cur"])
        joined = F.array_join(
            F.transform(acc["cur"], lambda y: y["t"]), " "
        )
        return F.when(
            close,
            _st(
                F.concat(acc["chunks"], F.array(joined)),
                F.concat(tail, F.array(x)),
                _toksum(tail) + x["k"],
            ),
        ).otherwise(
            _st(
                acc["chunks"],
                F.concat(acc["cur"], F.array(x)),
                acc["cur_toks"] + x["k"],
            )
        )

    def finish(acc: Column) -> Column:
        last = F.array_join(F.transform(acc["cur"], lambda y: y["t"]), " ")
        return F.when(
            F.size(acc["cur"]) > 0,
            F.concat(acc["chunks"], F.array(last)),
        ).otherwise(acc["chunks"])

    init = _st(F.array().cast("array<string>"), empty_cur, F.lit(0))
    return F.aggregate(items, init, step, finish)


def chunk_sentences(
    df: DataFrame,
    text_col: str = "text",
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """C1 with SentenceSplitter packing semantics. Adds ``chunk_index``,
    ``chunk_text``, ``chunk_tokens``; keeps other columns. Narrow plan:
    sentence split + fold + explode, no shuffle."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    sents = sentence_array(F.col(text_col))
    chunks = _pack_fold(_sentence_items(sents, size), size, overlap)
    return (
        df.withColumn("_chunks", chunks)
        .select(
            "*",
            F.posexplode(F.col("_chunks")).alias("chunk_index", "chunk_text"),
        )
        .withColumn("chunk_tokens", F.size(tokens(F.col("chunk_text"))))
        .drop("_chunks")
    )


def chunk_sentences_py(
    text: str, size: int, overlap: int = 0
) -> list[str]:
    """Plain-Python twin of :func:`chunk_sentences` (tests / driver-side).
    ``tokenizer`` counting = whitespace split, same packing rules."""
    import re

    tagged = re.sub(r"([.!?])\s+", "\\1" + _SENT_SENTINEL, text or "")
    sents = [
        s.strip(" \t\r\n")
        for s in tagged.split(_SENT_SENTINEL)
        if s.strip(" \t\r\n")
    ]
    items: list[tuple[str, int]] = []
    for s in sents:
        tk = [t for t in re.split(r"\s+", s) if t]
        if len(tk) <= size:
            items.append((s, len(tk)))
        else:
            for w in range(0, len(tk), size):
                piece = tk[w : w + size]
                items.append((" ".join(piece), len(piece)))
    chunks: list[str] = []
    cur: list[tuple[str, int]] = []
    cur_toks = 0
    for t, k in items:
        if cur and cur_toks + k > size:
            chunks.append(" ".join(p for p, _ in cur))
            tail: list[tuple[str, int]] = []
            ssum = 0
            for p, kk in reversed(cur):
                if overlap > 0 and ssum + kk <= overlap:
                    tail.insert(0, (p, kk))
                    ssum += kk
                else:
                    break
            cur = tail + [(t, k)]
            cur_toks = ssum + k
        else:
            cur.append((t, k))
            cur_toks += k
    if cur:
        chunks.append(" ".join(p for p, _ in cur))
    return chunks


def chunk_sentences_with_tokenizer(
    df: DataFrame,
    tokenizer,
    text_col: str = "text",
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """Sentence packing with a pluggable token counter (Arrow-batched
    pandas UDF) — plug the embedding model's BPE tokenizer for
    model-exact budgets (reference packs by model tokenizer, max 384,
    sentence_bert_config.json). Packing rules identical to
    :func:`chunk_sentences`; only token counting differs."""
    import re

    from pyspark.sql.functions import pandas_udf

    if overlap >= size:
        raise ValueError("overlap must be < size")

    def _chunk_one(text: str) -> list[str]:
        tagged = re.sub(r"([.!?])\s+", "\\1" + _SENT_SENTINEL, text or "")
        sents = [
            s.strip(" \t\r\n")
            for s in tagged.split(_SENT_SENTINEL)
            if s.strip(" \t\r\n")
        ]
        items: list[tuple[str, int]] = []
        for s in sents:
            tk = list(tokenizer(s))
            if len(tk) <= size:
                items.append((s, len(tk)))
            else:
                for w in range(0, len(tk), size):
                    piece = tk[w : w + size]
                    items.append((" ".join(piece), len(piece)))
        chunks: list[str] = []
        cur: list[tuple[str, int]] = []
        cur_toks = 0
        for t, k in items:
            if cur and cur_toks + k > size:
                chunks.append(" ".join(p for p, _ in cur))
                tail: list[tuple[str, int]] = []
                ssum = 0
                for p, kk in reversed(cur):
                    if overlap > 0 and ssum + kk <= overlap:
                        tail.insert(0, (p, kk))
                        ssum += kk
                    else:
                        break
                cur = tail + [(t, k)]
                cur_toks = ssum + k
            else:
                cur.append((t, k))
                cur_toks += k
        if cur:
            chunks.append(" ".join(p for p, _ in cur))
        return chunks

    @pandas_udf("array<string>")
    def _chunks(texts: pd.Series) -> pd.Series:
        return texts.map(_chunk_one)

    return (
        df.withColumn("_chunks", _chunks(F.col(text_col)))
        .select(
            "*",
            F.posexplode(F.col("_chunks")).alias("chunk_index", "chunk_text"),
        )
        .drop("_chunks")
    )


def chunk_with_tokenizer(
    df: DataFrame,
    tokenizer,
    text_col: str = "text",
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """Chunker with a pluggable Python tokenizer (Arrow-batched pandas
    UDF) — the swap point for model-exact token packing (the reference
    packs by the embedding model's tokenizer, max 384 tokens,
    sentence_bert_config.json). ``tokenizer(text) -> list[str]`` runs
    once per document inside the UDF; chunk assembly stays declarative
    (same explode plan as chunk_fixed, still no shuffle).

    With ``tokenizer=str.split`` this produces exactly chunk_fixed's
    output (tested) — plug a BPE/sentencepiece callable for model parity
    without changing the plan shape.
    """
    from pyspark.sql.functions import pandas_udf

    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap

    @pandas_udf("array<string>")
    def _tokenize(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: list(tokenizer(t or "")))

    out = (
        df.withColumn("_tok", _tokenize(F.col(text_col)))
        .withColumn("_n_chunks", chunk_count(F.col("_tok"), size, overlap))
        .select(
            "*",
            F.posexplode(F.sequence(F.lit(0), F.col("_n_chunks") - 1)).alias(
                "chunk_index", "_i"
            ),
        )
        .withColumn(
            "_slice", F.slice(F.col("_tok"), F.col("chunk_index") * stride + 1, size)
        )
        .withColumn("chunk_text", F.array_join(F.col("_slice"), " "))
        .withColumn("chunk_tokens", F.size(F.col("_slice")))
        .drop("_tok", "_n_chunks", "_i", "_slice")
    )
    return out


def chunk_semantic(
    docs: DataFrame,
    threshold6: int = 0,
    dim: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Semantic chunking: break a document where the embedding cosine
    between ADJACENT sentences drops below ``threshold6`` (fixed-point
    1e-6) — the modern RAG splitter that keeps topically-coherent spans
    together instead of cutting at a token count. Returns
    (id, segment_index, seg_text, n_sentences).

    Embeddings here are the deterministic mock Column twin (swap the
    real encoder's pandas UDF on a model path — the boundary algebra is
    identical); the adjacent-pair comparison is a lag window per
    document and the segment id is a cumulative boundary sum — one
    shuffle on the document id, everything else narrow. Fixed-point
    rounding before the threshold keeps the boundary decision
    engine-exact (same discipline as MMR/SemDeDup).
    """
    from pyspark.sql import Window

    from rag_content_spark.embedding.mock import mock_embedding_expr
    from rag_content_spark.functions.vector import cosine

    sents = docs.select(
        F.col(id_col),
        F.posexplode(sentence_array(text_col)).alias("si", "sent"),
    ).withColumn("_e", mock_embedding_expr("sent", dim=dim))
    w = Window.partitionBy(id_col).orderBy("si")
    prev = F.lag("_e").over(w)
    tagged = sents.withColumn(
        "_cos6",
        F.round(cosine(F.col("_e"), prev) * F.lit(1_000_000)).cast("bigint"),
    ).withColumn(
        "_b",
        F.when(F.col("_cos6").isNull(), 1)  # first sentence opens seg 0
        .when(F.col("_cos6") < threshold6, 1)
        .otherwise(0),
    )
    seg = (
        F.sum("_b").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1
    )
    return (
        tagged.withColumn("segment_index", seg.cast("bigint"))
        .groupBy(id_col, "segment_index")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("si"), F.col("sent")))
                    ),
                    lambda s: s["sent"],
                ),
                " ",
            ).alias("seg_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
        )
    )
