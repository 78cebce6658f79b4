from pyspark.sql import functions as F

from rag_content_spark.operators.quality import (
    contamination,
    repetition_stats,
    scrub_pii,
    stratified_sample,
)


def test_scrub_pii_redacts_all_kinds(spark):
    df = spark.createDataFrame(
        [("mail a@b.com phone +1 555 0100 200 ip 10.0.0.1 end",)], ["text"]
    )
    got = df.select(scrub_pii("text").alias("t")).first()["t"]
    assert "[EMAIL]" in got and "[PHONE]" in got and "[IPV4]" in got
    assert "a@b.com" not in got and "10.0.0.1" not in got


def test_repetition_stats_flags_repeats(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"), (2, "all words here are unique")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["dup_token_frac"] > 0.8 and got[1]["top_bigram_frac"] == 1.0
    assert got[2]["dup_token_frac"] == 0.0


def test_contamination_detects_benchmark_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content with other words"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(99, "quick brown fox jumps over")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["contamination"] for r in contamination(docs, bench).collect()}
    assert got[1] > 0.3 and got[2] == 0.0


def test_contamination_broadcast_guard(spark):
    # small benchmark -> broadcast hint in the plan; over-threshold
    # benchmark -> shuffle semi join, identical results (the guard only
    # changes the physical strategy, never the answer)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content with other words"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(99, "quick brown fox jumps over")], ["doc_id", "text"]
    )
    small = contamination(docs, bench)
    assert "Broadcast" in small._jdf.queryExecution().executedPlan().toString()
    big = contamination(docs, bench, max_broadcast_rows=0)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert {r["doc_id"]: r["contamination"] for r in big.collect()} == {
        r["doc_id"]: r["contamination"] for r in small.collect()
    }


def test_stratified_sample_rates(spark):
    df = spark.range(0, 4000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'zz' END AS lang"
    )
    kept = stratified_sample(df, {"en": 0.5}, stratum_col="lang").collect()
    langs = {r["lang"] for r in kept}
    assert langs == {"en"}  # zz rate defaults to 0
    frac = len(kept) / 2000
    assert 0.4 < frac < 0.6  # hash-uniform ~0.5
    # deterministic: same result on re-run
    again = stratified_sample(df, {"en": 0.5}, stratum_col="lang").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in kept}


def test_stamp_document_file_id(spark):
    from rag_content_spark.operators.rollup import stamp_document_file_id

    chunks = spark.createDataFrame(
        [("c1", "d1"), ("c2", "d1"), ("c3", "d2")], ["chunk_id", "document_id"]
    )
    got = stamp_document_file_id(chunks).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["document_id"], set()).add(r["file_id"])
    # one stable file_id per document, shared by all its chunks
    assert all(len(v) == 1 for v in by_doc.values())
    assert by_doc["d1"] != by_doc["d2"]


def test_trigram_langid_separates_languages(spark):
    from rag_content_spark.operators.text_analysis import trigram_lang_score

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("the cat is in the house and it is that",), ("der hund ist von den und zu",)],
        ["text"],
    )
    rows = df.select(
        trigram_lang_score("text", "en").alias("en"),
        trigram_lang_score("text", "de").alias("de"),
    ).collect()
    assert rows[0]["en"] > rows[0]["de"]
    assert rows[1]["de"] > rows[1]["en"]


def test_check_urls_distinct_ping_and_join_back(spark):
    from rag_content_spark.operators.metadata import check_urls

    df = spark.createDataFrame(
        [
            ("d1", "https://ok.example.com"),
            ("d2", "https://ok.example.com"),  # same URL: must ping once
            ("d3", "https://bad.example.com"),
            ("d4", "not-a-url"),
        ],
        ["doc_id", "docs_url"],
    )

    def fake_prober(urls):
        return [isinstance(u, str) and "ok" in u for u in urls]

    got = {r["doc_id"]: r["url_reachable"] for r in check_urls(df, prober=fake_prober).collect()}
    assert got == {"d1": True, "d2": True, "d3": False, "d4": False}


def test_psi_drift_identical_and_shifted(spark):
    from rag_content_spark.operators.quality import psi_drift

    same = spark.createDataFrame([(i / 100,) for i in range(100)], ["score"])
    r = psi_drift(same, same).collect()[0]
    assert r["psi"] == 0.0 and r["n_a"] == 100 and r["n_b"] == 100
    # a strong shift (low scores vs high scores) must alarm (> 0.25)
    lo = spark.createDataFrame([(0.05 + (i % 10) / 100,) for i in range(100)], ["score"])
    hi = spark.createDataFrame([(0.85 + (i % 10) / 100,) for i in range(100)], ["score"])
    r2 = psi_drift(lo, hi).collect()[0]
    assert r2["psi"] > 0.25
    # symmetric: psi(a,b) == psi(b,a)
    r3 = psi_drift(hi, lo).collect()[0]
    assert abs(r2["psi"] - r3["psi"]) < 1e-9


def test_line_stats_signals(spark):
    from rag_content_spark.operators.quality import line_stats

    text = (
        "A proper sentence ends here.\n"
        "- bullet one\n"
        "* bullet two\n"
        "NAV MENU\n"
        "NAV MENU\n"
        "  \n"            # blank after trim -> dropped
        "Question line?\n"
    )
    df = spark.createDataFrame([(1, text), (2, "")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in line_stats(df).collect()}
    r = got[1]
    assert r["n_lines"] == 6
    assert abs(r["frac_bullet"] - 2 / 6) < 1e-6
    assert abs(r["frac_end_punct"] - 2 / 6) < 1e-6   # '.' and '?'
    assert abs(r["frac_dup_lines"] - 1 / 6) < 1e-6   # one dup NAV MENU
    exp_mean = (28 + 12 + 12 + 8 + 8 + 14) / 6
    assert abs(r["mean_line_chars"] - exp_mean) < 1e-4
    # empty doc: zero lines, all-zero signals (no div-by-zero)
    assert got[2]["n_lines"] == 0 and got[2]["mean_line_chars"] == 0.0


def test_c4_line_filter_rules(spark):
    from rag_content_spark.operators.quality import c4_line_filter

    text = (
        "This line survives the filter just fine.\n"
        "short.\n"                          # < 3 words
        "no terminal punctuation here\n"
        "Uses javascript so it is dropped.\n"
        "Contains a { brace so dropped.\n"
        "lorem ipsum filler is dropped too.\n"
        "Another good line stays here!\n"
        "A third keeper makes the doc pass?\n"
    )
    df = spark.createDataFrame([(1, text), (2, "tiny.\n")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    r = got[1]
    assert r["n_kept"] == 3 and r["keep"] is True
    assert r["clean_text"].splitlines() == [
        "This line survives the filter just fine.",
        "Another good line stays here!",
        "A third keeper makes the doc pass?",
    ]
    assert got[2]["keep"] is False and got[2]["n_kept"] == 0


def test_line_stats_zero_nonempty_lines_yields_zero_means(spark):
    # a doc of only blank lines: Spark's fold gives 0 total chars and the
    # safe_n guard makes every stat 0.0 — the DuckDB oracle coalesces
    # list_sum([]) (NULL) to 0 to agree (ADVICE r4)
    from rag_content_spark.operators.quality import line_stats

    # NB only spaces: trim() strips ' ' (not \t) on BOTH engines
    docs = spark.createDataFrame(
        [(1, "\n   \n  \n"), (2, "real line.\n")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in line_stats(docs).collect()}
    assert got[1]["n_lines"] == 0
    assert got[1]["mean_line_chars"] == 0.0
    assert got[1]["frac_end_punct"] == 0.0
    assert got[2]["n_lines"] == 1 and got[2]["mean_line_chars"] == 10.0
