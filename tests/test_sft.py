"""SFT / FIM operator tests (operators/sft.py)."""


def test_parse_chat_turns_roles_and_content(spark):
    from rag_content_spark.operators.sft import parse_chat_turns

    d = spark.createDataFrame(
        [
            (1, "user: hello world\nassistant: hi"),
            (2, "System: be nice\nuser:\nweird line"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r["doc_id"], r["turn_index"]): r
        for r in parse_chat_turns(d).collect()
    }
    assert rows[(1, 0)]["role"] == "user"
    assert rows[(1, 0)]["content"] == "hello world"
    assert rows[(1, 0)]["n_tokens"] == 2
    assert rows[(1, 1)]["role"] == "assistant" and rows[(1, 1)]["content"] == "hi"
    assert rows[(2, 0)]["role"] == "system"  # case-insensitive marker
    assert rows[(2, 1)]["role"] == "user" and rows[(2, 1)]["content"] == ""
    assert rows[(2, 2)]["role"] is None  # no marker -> surfaced, not dropped
    assert rows[(2, 2)]["content"] == "weird line"


def test_validate_dialogs_all_violation_classes(spark):
    from rag_content_spark.operators.sft import parse_chat_turns, validate_dialogs

    cases = {
        1: ("user: hi\nassistant: hello", True, None),
        2: ("system: x\nuser: hi\nassistant: yo", True, None),
        3: ("assistant: hi\nuser: yo", False, "bad_start"),
        4: ("user: a\nuser: b\nassistant: c", False, "bad_alternation"),
        5: ("user: a\nassistant: b\nuser: c", False, "bad_end"),
        6: ("user: a\nassistant:", False, "empty_turn"),
        7: ("user: a\nrandom text\nassistant: b", False, "unknown_role"),
        8: ("user: only one turn", False, "too_short"),
        9: ("user: a\nsystem: late\nassistant: b", False, "unknown_role"),
    }
    d = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r
        for r in validate_dialogs(parse_chat_turns(d)).collect()
    }
    for k, (_, valid, violation) in cases.items():
        assert got[k]["valid"] == valid, (k, got[k])
        assert got[k]["first_violation"] == violation, (k, got[k])
    assert got[1]["n_turns"] == 2 and got[2]["n_user"] == 1


def test_fim_transform_partition_and_determinism(spark):
    from rag_content_spark.operators.sft import (
        FIM_MIDDLE,
        FIM_PREFIX,
        FIM_SUFFIX,
        fim_transform,
    )

    text = " ".join(f"tok{i}" for i in range(40))
    d = spark.createDataFrame(
        [(i, text) for i in range(30)] + [(99, "too short")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in fim_transform(d, fim_pct=100).collect()}
    assert out[99]["fim_applied"] is False and out[99]["fim_text"] == "too short"
    applied = [r for i, r in out.items() if i != 99]
    assert all(r["fim_applied"] for r in applied)
    for r in applied:
        assert r["n_prefix"] >= 1 and r["n_middle"] >= 1 and r["n_suffix"] >= 1
        assert r["n_prefix"] + r["n_middle"] + r["n_suffix"] == 40
        body = r["fim_text"]
        assert body.startswith(FIM_PREFIX)
        p = body[len(FIM_PREFIX):body.index(FIM_SUFFIX)]
        s = body[body.index(FIM_SUFFIX) + len(FIM_SUFFIX):body.index(FIM_MIDDLE)]
        m = body[body.index(FIM_MIDDLE) + len(FIM_MIDDLE):]
        # PSM reassembly reproduces the original token stream
        assert (p + " " + m + " " + s).split() == text.split()
    # cuts vary across doc ids (hash-driven), and rerun is identical
    assert len({(r["n_prefix"], r["n_middle"]) for r in applied}) > 5
    again = {r["doc_id"]: r["fim_text"] for r in fim_transform(d, fim_pct=100).collect()}
    assert all(again[i] == out[i]["fim_text"] for i in out)


def test_fim_rate_knob(spark):
    from rag_content_spark.operators.sft import fim_transform

    text = " ".join(f"t{i}" for i in range(20))
    d = spark.createDataFrame([(i, text) for i in range(200)], ["doc_id", "text"])
    frac = (
        fim_transform(d, fim_pct=50)
        .filter("fim_applied")
        .count()
    ) / 200
    assert 0.35 < frac < 0.65  # hash-sampled, not exact
    assert fim_transform(d, fim_pct=0).filter("fim_applied").count() == 0


def test_extract_code_blocks_handmade(spark):
    from rag_content_spark.operators.text_analysis import extract_code_blocks

    docs = [
        (1, "intro\n```python\nx = 1\nprint(x)\n```\nafter\n```\nplain\n```"),
        (2, "no fences here"),
        (3, "text\n```js\ndangling()"),          # unclosed: lines kept
        (4, "```\n```\nempty block vanishes"),    # empty block -> no rows
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {
        (r["doc_id"], r["block_index"]): r
        for r in extract_code_blocks(df).collect()
    }
    assert rows[(1, 0)]["lang"] == "python"
    assert rows[(1, 0)]["code"] == "x = 1\nprint(x)"
    assert rows[(1, 0)]["n_lines"] == 2
    assert rows[(1, 1)]["lang"] == "" and rows[(1, 1)]["code"] == "plain"
    assert rows[(3, 0)]["lang"] == "js" and rows[(3, 0)]["code"] == "dangling()"
    assert not any(d == 2 or d == 4 for d, _ in rows)


def test_dominant_script_and_counts(spark):
    from rag_content_spark.operators.text_analysis import (
        dominant_script,
        script_counts,
    )

    rows = [
        (1, "hello world"),
        (2, "统计数据处理"),
        (3, "Привет мир"),
        (4, "   \n\t "),
        (5, "abc 统计数据处理引擎"),   # cjk outnumbers latin
        (6, "123 456 789"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            script_counts("text").alias("s"),
            dominant_script("text").alias("d"),
        ).collect()
    }
    assert got[1]["d"] == "latin" and got[1]["s"]["latin"] == 10
    assert got[2]["d"] == "cjk" and got[2]["s"]["cjk"] == 6
    assert got[3]["d"] == "cyrillic"
    assert got[4]["d"] == "none"
    assert got[5]["d"] == "cjk"
    assert got[6]["d"] == "digit"


def test_skew_report_handmade(spark):
    from rag_content_spark.operators.rollup import skew_report

    # key 'a' x 8, 'b' x 1, 'c' x 1 -> n_keys=3, total=10, max=8
    rows = [("a",)] * 8 + [("b",)] + [("c",)]
    df = spark.createDataFrame(rows, ["k"])
    r = skew_report(df, "k", top_n=2).collect()[0]
    assert r["n_keys"] == 3 and r["total_rows"] == 10 and r["max_count"] == 8
    assert abs(r["skew_ratio"] - 2.4) < 1e-9     # 8 * 3 / 10
    assert r["p50_count"] == 1                   # ceil(1.5)=2nd ascending -> 1
    assert r["p99_count"] == 8                   # ceil(2.97)=3rd ascending -> 8
    assert r["top_keys"] == "a:8|b:1"
