"""WARC source reader (sources/warc.py): record parsing, gzip
multistream, HTTP splitting, Spark scan, documents shaping."""

import gzip
import os

from pyspark.sql import functions as F


def _record(warc_type: str, uri: str, payload: bytes, extra: str = "") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{warc_type}-1>\r\n"
        f"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + extra
        + f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http_response(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _sample_warc() -> bytes:
    info = _record("warcinfo", "", b"software: test\r\n")
    resp = _record(
        "response",
        "http://example.com/page",
        _http_response(b"<html><head><script>x=1</script></head>"
                       b"<body><h1>Title</h1><p>Hello  world</p></body></html>"),
        extra="Content-Type: application/http; msgtype=response\r\n",
    )
    req = _record("request", "http://example.com/page", b"GET /page HTTP/1.1\r\n\r\n")
    return info + resp + req


def test_parse_warc_bytes_plain():
    from rag_content_spark.sources.warc import parse_warc_bytes

    recs = list(parse_warc_bytes(_sample_warc()))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "request"]
    resp = recs[1]
    assert resp["target_uri"] == "http://example.com/page"
    assert resp["http_status"] == 200
    assert resp["content_type"] == "text/html"
    assert b"<h1>Title</h1>" in resp["payload"]
    assert not resp["payload"].startswith(b"HTTP/")  # HTTP head stripped


def test_parse_warc_bytes_gzip_multistream():
    from rag_content_spark.sources.warc import parse_warc_bytes

    # record-at-time compression: one gzip member per record
    data = b"".join(
        gzip.compress(part)
        for part in (
            _record("warcinfo", "", b"software: test\r\n"),
            _record("response", "http://a.example/x",
                    _http_response(b"<p>hi</p>"),
                    extra="Content-Type: application/http\r\n"),
        )
    )
    recs = list(parse_warc_bytes(data))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["payload"] == b"<p>hi</p>"


def test_parse_warc_truncated_tail_dropped():
    from rag_content_spark.sources.warc import parse_warc_bytes

    whole = _sample_warc()
    cut = whole[: len(whole) - 30]  # chop inside the last record
    recs = list(parse_warc_bytes(cut))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]


def test_read_warc_records_spark(spark, tmp_path):
    from rag_content_spark.sources.warc import read_warc_records

    (tmp_path / "a.warc").write_bytes(_sample_warc())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_sample_warc()))

    df = read_warc_records(spark, str(tmp_path))  # default: responses only
    rows = df.orderBy("file_path").collect()
    assert len(rows) == 2
    assert all(r["warc_type"] == "response" for r in rows)
    assert all(r["http_status"] == 200 for r in rows)

    all_df = read_warc_records(spark, str(tmp_path), types=())
    assert all_df.count() == 6


def test_warc_responses_to_documents(spark, tmp_path):
    from rag_content_spark.sources.warc import (
        read_warc_records,
        warc_responses_to_documents,
    )

    (tmp_path / "a.warc").write_bytes(_sample_warc())
    docs = warc_responses_to_documents(read_warc_records(spark, str(tmp_path)))
    row = docs.collect()[0]
    assert row["source"] == "http://example.com/page"
    # script stripped, tags stripped, whitespace collapsed
    assert row["text"] == "Title Hello world"
    assert row["doc_id"] and row["n_bytes"] > 0


def test_wet_to_documents(spark, tmp_path):
    # WET = WARC whose 'conversion' records carry pre-extracted text
    from rag_content_spark.sources.warc import read_warc_records, wet_to_documents

    data = (
        _record("warcinfo", "", b"software: test")
        + _record("conversion", "http://a.example/page", b"plain text body one")
        + _record("conversion", "http://b.example/doc", b"second document text")
        + _record("response", "http://c.example/html", _http_response(b"<p>skip</p>"))
    )
    p = tmp_path / "crawl.warc.wet"
    p.write_bytes(data)
    from rag_content_spark.sources.warc import read_wet_documents

    docs = read_wet_documents(spark, str(tmp_path))
    rows = {r["source"]: r for r in docs.collect()}
    assert set(rows) == {"http://a.example/page", "http://b.example/doc"}
    assert rows["http://a.example/page"]["text"] == "plain text body one"
    assert all(len(r["doc_id"]) == 32 for r in rows.values())
