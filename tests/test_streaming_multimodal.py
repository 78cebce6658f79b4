import time

from rag_content_spark.operators.multimodal import (
    extract_image_features,
    sample_video_frames,
)


def test_streaming_ingest_available_now(spark, tmp_path):
    from rag_content_spark.plans.build_pipeline import BuildConfig
    from rag_content_spark.streaming.ingest import start_index_stream

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.md").write_text("# Stream Doc\n\nstreaming body content here")
    out = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    q = start_index_stream(
        spark,
        str(src),
        out,
        ckpt,
        cfg=BuildConfig(chunk_size=8, chunk_overlap=0),
        embedder=None,
        available_now=True,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    texts = [r["text"] for r in got.collect()]
    assert any("streaming body content" in t for t in texts)
    # exactly-once: rerunning with the same checkpoint adds nothing
    q2 = start_index_stream(
        spark, str(src), out, ckpt,
        cfg=BuildConfig(chunk_size=8, chunk_overlap=0), available_now=True,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(texts)


def _media_df(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNGfakebytes"), 13, {"fmt": "png"}),
        ("m2", "video", bytearray(b"\x00\x00ftypmp4fake"), 12, {"fmt": "mp4"}),
    ]
    from rag_content_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_feature_plumbing(spark):
    out = extract_image_features(_media_df(spark)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {"m1", "m2"}
    r = by_id["m1"]
    assert r["width"] >= 64 and r["height"] >= 64 and len(r["feature"]) == 8
    # deterministic across runs
    again = {x["media_id"]: x for x in extract_image_features(_media_df(spark)).collect()}
    assert again["m1"]["feature"] == r["feature"]


def test_video_frame_sampling(spark):
    out = sample_video_frames(_media_df(spark), every_n_seconds=1.0).collect()
    m2 = [r for r in out if r["media_id"] == "m2"]
    assert m2 and [r["frame_index"] for r in m2] == list(range(len(m2)))


def test_converters_fallback(spark):
    from rag_content_spark.sources.converters import convert_binary_documents

    rows = [
        ("/x/a.html", "html", "d1", bytearray(b"<html><body><p>Hello <b>world</b></p></body></html>")),
        ("/x/b.pdf", "pdf", "d2", bytearray(b"%PDF-1.4 fake")),
    ]
    df = spark.createDataFrame(rows, ["file_path", "doc_type", "doc_id", "content"])
    out = {r["doc_id"]: r for r in convert_binary_documents(df).collect()}
    assert out["d1"]["text"] == "Hello world"
    # scanned-PDF warning path (reference pdf_reader.py:67,133-141)
    assert out["d2"]["conversion_warning"] is not None


def test_asciidoc_fallback_downgrade(spark):
    from rag_content_spark.sources.converters import convert_asciidoc

    df = spark.createDataFrame(
        [("= Title\n\n== Section\n\nbody text here",)], ["text"]
    )
    out = convert_asciidoc(df).collect()[0]["text"]
    # without the asciidoctor binary: deterministic heading downgrade
    assert out.startswith("# Title") and "\n## Section" in out
