from pyspark.sql import functions as F

from rag_content_spark.operators.chunking import chunk_fixed, section_title, split_markdown


def _one(spark, text):
    return spark.createDataFrame([(text,)], ["text"])


def test_chunk_fixed_exact_windows(spark):
    df = _one(spark, " ".join(f"t{i}" for i in range(10)))
    rows = chunk_fixed(df, size=4, overlap=0).orderBy("chunk_index").collect()
    assert [r["chunk_text"] for r in rows] == [
        "t0 t1 t2 t3",
        "t4 t5 t6 t7",
        "t8 t9",
    ]
    assert [r["chunk_tokens"] for r in rows] == [4, 4, 2]


def test_chunk_overlap_stride(spark):
    df = _one(spark, " ".join(f"t{i}" for i in range(10)))
    rows = chunk_fixed(df, size=4, overlap=2).orderBy("chunk_index").collect()
    assert [r["chunk_text"] for r in rows] == [
        "t0 t1 t2 t3",
        "t2 t3 t4 t5",
        "t4 t5 t6 t7",
        "t6 t7 t8 t9",
    ]


def test_short_doc_single_chunk(spark):
    rows = chunk_fixed(_one(spark, "only three tokens"), size=380, overlap=0).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "only three tokens"


def test_whitespace_runs_collapse(spark):
    rows = chunk_fixed(_one(spark, "a\t b\n\nc   d"), size=10, overlap=0).collect()
    assert rows[0]["chunk_text"] == "a b c d"


def test_markdown_split_sections(spark):
    md = "intro text\n# One\nbody one\n## Two\nbody two"
    rows = (
        split_markdown(_one(spark, md))
        .select("section_index", "section_text", section_title().alias("t"))
        .orderBy("section_index")
        .collect()
    )
    assert [r["section_text"] for r in rows] == [
        "intro text",
        "# One\nbody one",
        "## Two\nbody two",
    ]
    assert [r["t"] for r in rows] == ["", "One", "Two"]


def test_markdown_split_no_headings(spark):
    rows = split_markdown(_one(spark, "no headings at all")).collect()
    assert len(rows) == 1 and rows[0]["section_index"] == 0


def test_html_entity_decode(spark):
    from rag_content_spark.functions.text import html_entity_decode

    df = spark.createDataFrame(
        [("a &amp;&#8212;&gt; b &quot;x&quot; &#8217;y&#8217;",)], ["text"]
    )
    got = df.select(html_entity_decode("text").alias("t")).first()["t"]
    assert got == 'a &--> b "x" \'y\''


def test_tokenizer_udf_chunker_matches_expr_path(spark):
    from rag_content_spark.operators.chunking import chunk_with_tokenizer

    df = spark.createDataFrame(
        [(" ".join(f"t{i}" for i in range(23)),), ("one two",)], ["text"]
    )
    via_expr = {
        (r["text"], r["chunk_index"]): (r["chunk_text"], r["chunk_tokens"])
        for r in chunk_fixed(df, size=5, overlap=2).collect()
    }
    via_udf = {
        (r["text"], r["chunk_index"]): (r["chunk_text"], r["chunk_tokens"])
        for r in chunk_with_tokenizer(df, str.split, size=5, overlap=2).collect()
    }
    assert via_expr == via_udf


def test_tokenizer_udf_custom_tokenizer(spark):
    import re

    from rag_content_spark.operators.chunking import chunk_with_tokenizer

    bpe_ish = lambda t: re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", t)
    df = spark.createDataFrame([("ab12,cd ef!",)], ["text"])
    rows = chunk_with_tokenizer(df, bpe_ish, size=3, overlap=0).orderBy(
        "chunk_index"
    ).collect()
    assert [r["chunk_text"] for r in rows] == ["ab 12 ,", "cd ef !"]


def test_invalid_overlap_rejected(spark):
    import pytest

    from rag_content_spark.operators.chunking import chunk_with_tokenizer

    df = _one(spark, "a b c")
    with pytest.raises(ValueError):
        chunk_fixed(df, size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_with_tokenizer(df, str.split, size=4, overlap=5)


# ------------------------- sentence-aware packing (C1 parity) -------------


def test_chunk_sentences_whole_sentences_packed(spark):
    from rag_content_spark.operators.chunking import chunk_sentences

    # 3 sentences of 3/4/2 tokens; size 7 packs s1+s2, then s3.
    text = "One two three. Four five six seven. Eight nine."
    rows = (
        chunk_sentences(_one(spark, text), size=7, overlap=0)
        .orderBy("chunk_index")
        .collect()
    )
    assert [r["chunk_text"] for r in rows] == [
        "One two three. Four five six seven.",
        "Eight nine.",
    ]
    assert [r["chunk_tokens"] for r in rows] == [7, 2]


def test_chunk_sentences_never_splits_fitting_sentence(spark):
    from rag_content_spark.operators.chunking import chunk_sentences

    # A sentence that doesn't fit the open chunk moves whole to the next.
    text = "A b c d. E f g h i."
    rows = (
        chunk_sentences(_one(spark, text), size=6, overlap=0)
        .orderBy("chunk_index")
        .collect()
    )
    assert [r["chunk_text"] for r in rows] == ["A b c d.", "E f g h i."]


def test_chunk_sentences_oversized_sentence_window_split(spark):
    from rag_content_spark.operators.chunking import chunk_sentences

    text = " ".join(f"w{i}" for i in range(10))  # one 10-token "sentence"
    rows = (
        chunk_sentences(_one(spark, text), size=4, overlap=0)
        .orderBy("chunk_index")
        .collect()
    )
    assert [r["chunk_tokens"] for r in rows] == [4, 4, 2]


def test_chunk_sentences_overlap_tail_carried(spark):
    from rag_content_spark.operators.chunking import chunk_sentences

    # Closing chunk [s1(3), s2(2)] with overlap 2 carries s2 into chunk 2.
    text = "One two three. Four five. Six seven eight nine."
    rows = (
        chunk_sentences(_one(spark, text), size=5, overlap=2)
        .orderBy("chunk_index")
        .collect()
    )
    assert [r["chunk_text"] for r in rows] == [
        "One two three. Four five.",
        "Four five. Six seven eight nine.",
    ]


def test_chunk_sentences_matches_python_twin(spark):
    from rag_content_spark.operators.chunking import (
        chunk_sentences,
        chunk_sentences_py,
    )

    texts = [
        "One two three. Four five six seven. Eight nine! Ten eleven? Twelve.",
        "A single enormous sentence " + " ".join(f"w{i}" for i in range(30)),
        "Short.",
        "",
        "No terminal punctuation just words flowing on and on and on",
        "Mr. X said hi. Dr.Y did not.  Trailing spaces.   ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    for size, overlap in [(8, 0), (8, 3), (5, 2)]:
        out = (
            chunk_sentences(df, size=size, overlap=overlap)
            .select("id", "chunk_index", "chunk_text")
            .collect()
        )
        got = {}
        for r in out:
            got.setdefault(r.id, []).append((r.chunk_index, r.chunk_text))
        for i, t in enumerate(texts):
            exp = chunk_sentences_py(t, size, overlap)
            act = [c for _, c in sorted(got.get(i, []))]
            assert act == exp, (size, overlap, i)


def test_chunk_sentences_with_tokenizer_char_budget(spark):
    from rag_content_spark.operators.chunking import (
        chunk_sentences_with_tokenizer,
    )

    # Token = single character (BPE stand-in): budgets count chars.
    df = _one(spark, "abc de. fg hi jk. lm.")
    rows = (
        chunk_sentences_with_tokenizer(
            df, tokenizer=lambda s: list(s.replace(" ", "")), size=8, overlap=0
        )
        .orderBy("chunk_index")
        .collect()
    )
    # "abc de." = 6 chars, "fg hi jk." = 7, "lm." = 3 -> [s1], [s2], [s3]?
    # 6+7 > 8 so s2 opens chunk 2; 7+3 > 8 so s3 opens chunk 3.
    assert [r["chunk_text"] for r in rows] == ["abc de.", "fg hi jk.", "lm."]


def test_chunk_sentences_invalid_overlap_rejected(spark):
    import pytest

    from rag_content_spark.operators.chunking import chunk_sentences

    with pytest.raises(ValueError):
        chunk_sentences(_one(spark, "x"), size=4, overlap=4)


def test_markdown_split_fence_aware(spark):
    """MarkdownNodeParser contract: a heading-looking line inside a
    ``` fence is content, not a section break."""
    from rag_content_spark.operators.chunking import split_markdown

    text = (
        "# Real Heading\n"
        "intro line\n"
        "```\n"
        "# not a heading, just a comment\n"
        "```\n"
        "tail line\n"
        "## Second Section\n"
        "body"
    )
    df = spark.createDataFrame([("d1", text)], ["doc_id", "text"])
    sections = [
        r["section_text"]
        for r in split_markdown(df).orderBy("section_index").collect()
    ]
    assert len(sections) == 2
    assert sections[0].startswith("# Real Heading")
    assert "# not a heading" in sections[0]  # stayed inside section 1
    assert sections[1].startswith("## Second Section")


def test_chunk_semantic_boundaries_and_coverage(spark):
    from rag_content_spark.operators.chunking import chunk_semantic

    text = (
        "alpha beta gamma. alpha beta delta. "
        "xyz qrs tuv. completely different words here."
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    segs = chunk_semantic(df, threshold6=0).orderBy("segment_index").collect()
    # segments partition the sentences: indexes contiguous from 0 and
    # every sentence appears exactly once in order
    assert [r["segment_index"] for r in segs] == list(range(len(segs)))
    joined = " ".join(r["seg_text"] for r in segs)
    assert joined.split() == text.split()
    assert sum(r["n_sentences"] for r in segs) == 4
    # a permissive threshold merges everything into one segment
    one = chunk_semantic(df, threshold6=-2_000_000).collect()
    assert len(one) == 1 and one[0]["n_sentences"] == 4
    # a demanding threshold splits every adjacent pair
    allsplit = chunk_semantic(df, threshold6=1_000_001).collect()
    assert len(allsplit) == 4
