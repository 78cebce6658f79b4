"""WARC (Web ARChive, ISO 28500) source reader — the Common Crawl
ingest format for web-scale LLM training corpora.

The reference (lightspeed-core/rag-content) reads curated documentation
folders only; a 100 TB pretraining pipeline starts from WARC dumps, so
this source is part of the extension surface. Format per the public
spec: each record is

    WARC/1.0\\r\\n
    <header: value>\\r\\n ...
    \\r\\n
    <Content-Length payload bytes>\\r\\n\\r\\n

``.warc.gz`` files concatenate one gzip member per record (the spec's
``record-at-time`` compression), which is what makes the format
splittable with an offset index; this reader works at FILE granularity
— the standard Common Crawl layout is ~1 GB per file and tens of
thousands of files per crawl, so one-file-one-task already saturates a
1000-executor cluster without an index.

Spark face: ``binaryFile`` scan -> Arrow-batched ``mapInPandas`` that
parses records and, for HTTP ``response`` records, splits the HTTP
status/headers from the body. Pure stdlib (zlib) — no external WARC
library.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "file_path string, warc_type string, record_id string, "
    "warc_date string, target_uri string, content_type string, "
    "http_status int, payload binary, n_bytes bigint"
)


def gunzip_members(data: bytes) -> bytes:
    """Decompress a multistream gzip blob (one member per WARC record —
    the spec's record-at-time compression) into one contiguous buffer.
    Plain (uncompressed) input is returned unchanged."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = []
    while data:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record: headers lower-cased, payload as
    bytes, HTTP response payloads split into (status, body).

    Tolerant of trailing garbage / truncated tails (a partial final
    record is dropped, matching how crawl processors skip short reads).
    """
    buf = gunzip_members(data)
    pos = 0
    n = len(buf)
    while pos < n:
        # find the record header block
        start = buf.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = buf.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        header_lines = buf[start:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for line in header_lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + 4
        if body_start + length > n:
            return  # truncated tail
        payload = buf[body_start : body_start + length]
        pos = body_start + length

        http_status = None
        content_type = headers.get("content-type", "")
        # response records wrap an HTTP message: split status + headers
        if headers.get("warc-type") == "response" and payload.startswith(b"HTTP/"):
            http_end = payload.find(b"\r\n\r\n")
            if http_end >= 0:
                http_head = payload[:http_end].decode("utf-8", "replace")
                status_parts = http_head.split("\r\n", 1)[0].split()
                if len(status_parts) >= 2 and status_parts[1].isdigit():
                    http_status = int(status_parts[1])
                for line in http_head.split("\r\n")[1:]:
                    if line.lower().startswith("content-type:"):
                        content_type = line.split(":", 1)[1].strip()
                payload = payload[http_end + 4 :]
        yield {
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", ""),
            "warc_date": headers.get("warc-date", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "content_type": content_type,
            "http_status": http_status,
            "payload": payload,
        }


def read_warc_records(
    spark: SparkSession,
    folder: str,
    glob: str = "*.warc*",
    types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Scan a folder of WARC files into a records DataFrame.

    ``types`` filters record types executor-side BEFORE rows
    materialize (a crawl is ~3x request/metadata overhead per response;
    shipping only responses cuts the exchange by that factor). Pass
    ``types=()`` to keep everything.
    """
    import pandas as pd

    binary = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(folder)
        .select("path", "content")
    )

    keep = set(types)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    if keep and rec["warc_type"] not in keep:
                        continue
                    rows.append(
                        (
                            path,
                            rec["warc_type"],
                            rec["record_id"],
                            rec["warc_date"],
                            rec["target_uri"],
                            rec["content_type"],
                            rec["http_status"],
                            rec["payload"],
                            len(rec["payload"]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_path",
                    "warc_type",
                    "record_id",
                    "warc_date",
                    "target_uri",
                    "content_type",
                    "http_status",
                    "payload",
                    "n_bytes",
                ],
            )

    return binary.mapInPandas(_parse, schema=WARC_SCHEMA)


def warc_responses_to_documents(records: DataFrame) -> DataFrame:
    """Shape HTTP-200 text/html responses into the ``documents`` schema
    (doc_id, text, source): naive tag-strip text extraction as a Column
    expression — the docling converter (sources/converters.py) is the
    high-fidelity path; this is the crawl-scale cheap pass.
    """
    from pyspark.sql import functions as F

    html = F.col("payload").cast("string")
    # RE2-safe alternation (no backreference) — the exact form the
    # oracle-checked html_plain query replays
    text = F.regexp_replace(
        html, r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " "
    )
    text = F.regexp_replace(text, r"(?s)<[^>]+>", " ")
    text = F.trim(F.regexp_replace(text, r"\s+", " "))
    return (
        records.filter(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
        )
        .select(
            F.md5(F.col("target_uri")).alias("doc_id"),
            text.alias("text"),
            F.col("target_uri").alias("source"),
            "warc_date",
            "n_bytes",
        )
    )


def read_wet_documents(
    spark: SparkSession, folder: str, glob: str = "*.wet*"
) -> DataFrame:
    """One-call WET ingest: scan ``folder`` keeping only ``conversion``
    records and shape them as documents."""
    return wet_to_documents(
        read_warc_records(spark, folder, glob=glob, types=("conversion",))
    )


def wet_to_documents(records: DataFrame) -> DataFrame:
    """WET path: Common Crawl's ``*.warc.wet`` files are ordinary WARC
    streams whose ``conversion`` records carry pre-extracted plain text
    — the cheapest crawl-scale text source (no HTML parsing at all).
    Shapes them into the ``documents`` schema; the generic record
    parser above handles the container, so this is a filter + cast.
    """
    from pyspark.sql import functions as F

    return (
        records.filter(F.col("warc_type") == "conversion")
        .select(
            F.md5(F.col("target_uri")).alias("doc_id"),
            F.col("payload").cast("string").alias("text"),
            F.col("target_uri").alias("source"),
            "warc_date",
            "n_bytes",
        )
    )
