import time

from pyspark.sql import functions as F

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


HTML_DOC = b"""<html><head><title>x</title><style>p {color: red}</style>
<script>var a = 1 < 2;</script></head><body>
<h1>Install &amp; Setup</h1>
<p>First paragraph with <b>bold</b> text.</p>
<h2>Steps</h2>
<ul><li>step <i>one</i></li><li>step two</li></ul>
<p>Done.</p>
</body></html>"""


def test_html_fallback_is_markdown_shaped(spark):
    from rag_content_spark.sources.converters import convert_binary_documents

    df = spark.createDataFrame(
        [("/x/c.html", "html", "d3", bytearray(HTML_DOC))],
        ["file_path", "doc_type", "doc_id", "content"],
    )
    text = convert_binary_documents(df).collect()[0]["text"]
    lines = text.split("\n")
    # headings survive as markdown, entities decoded, script/style gone
    assert "# Install & Setup" in lines
    assert "## Steps" in lines
    assert "- step one" in lines and "- step two" in lines
    assert "color" not in text and "var a" not in text
    assert "First paragraph with bold text." in lines


def test_html_fallback_drives_markdown_split(spark):
    from rag_content_spark.operators.chunking import split_markdown
    from rag_content_spark.sources.converters import convert_binary_documents

    df = spark.createDataFrame(
        [("/x/c.html", "html", "d3", bytearray(HTML_DOC))],
        ["file_path", "doc_type", "doc_id", "content"],
    )
    sections = (
        split_markdown(convert_binary_documents(df))
        .orderBy("section_index")
        .collect()
    )
    # C2 heading split sees two heading sections (reference contract:
    # HTML -> markdown so downstream chunking is structure-aware).
    titles = [r["section_text"].split("\n")[0] for r in sections]
    assert titles == ["# Install & Setup", "## Steps"]


def test_asciidoc_fallback_downgrade(spark):
    from rag_content_spark.sources.converters import convert_asciidoc

    df = spark.createDataFrame(
        [("= Title\n\n== Section\n\nbody text here",)], ["text"]
    )
    out = convert_asciidoc(df).collect()[0]["text"]
    # without the asciidoctor binary: the reference text-converter
    # contract (asciidoc_text_converter.rb) — doc title '# ', '=='
    # section is asciidoctor level 1 -> '# ' too
    assert out == "# Title\n\n# Section\n\nbody text here"


def _png(w, h):
    import struct, zlib
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _jpeg(w, h):
    import struct
    # SOI + APP0 (JFIF stub) + SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def _wav(sample_rate, channels, seconds):
    import struct
    byte_rate = sample_rate * channels * 2
    data = b"\x00" * int(byte_rate * seconds)
    fmt = (
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    )
    payload = b"WAVE" + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def test_probe_media_header_formats():
    from rag_content_spark.operators.multimodal import probe_media_header

    png = probe_media_header(_png(640, 480))
    assert (png["format"], png["width"], png["height"]) == ("png", 640, 480)

    jpg = probe_media_header(_jpeg(1920, 1080))
    assert (jpg["format"], jpg["width"], jpg["height"]) == ("jpeg", 1920, 1080)

    wav = probe_media_header(_wav(16000, 2, 1.5))
    assert wav["format"] == "wav"
    assert wav["sample_rate"] == 16000 and wav["channels"] == 2
    assert abs(wav["duration_s"] - 1.5) < 1e-6

    gif = probe_media_header(b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little"))
    assert (gif["format"], gif["width"], gif["height"]) == ("gif", 320, 200)

    assert probe_media_header(b"not media")["format"] is None
    assert probe_media_header(b"")["format"] is None


def test_probe_media_dataframe(spark):
    from rag_content_spark.operators.multimodal import probe_media

    rows = [
        ("m1", "image", bytearray(_png(10, 20)), 0, {}),
        ("m2", "audio", bytearray(_wav(8000, 1, 2.0)), 0, {}),
        ("m3", "image", bytearray(b"garbage"), 0, {}),
    ]
    from rag_content_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in probe_media(df).collect()}
    assert got["m1"]["format"] == "png" and got["m1"]["width"] == 10
    assert got["m2"]["format"] == "wav" and got["m2"]["duration_s"] == 2.0
    assert got["m3"]["format"] is None


def test_streaming_dedup_against_corpus(spark, tmp_path):
    """Stream-static anti-join: streamed docs colliding with the static
    corpus band table are dropped; fresh docs pass through."""
    from rag_content_spark.operators.dedup import minhash_band_table
    from rag_content_spark.streaming.aggregate import (
        streaming_dedup_against_corpus,
    )

    corpus = spark.createDataFrame(
        [
            ("c1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            ("c2", "one two three four five six seven eight nine ten"),
        ],
        ["doc_id", "text"],
    )
    bands_path = str(tmp_path / "bands")
    minhash_band_table(corpus).write.parquet(bands_path)
    corpus_bands = spark.read.parquet(bands_path)  # materialized snapshot

    src = tmp_path / "stream"
    src.mkdir()
    # near-dup of c1 (one token dropped) and a genuinely fresh doc
    (src / "dup.md").write_text(
        "alpha beta gamma delta epsilon zeta eta theta iota"
    )
    (src / "new.md").write_text(
        "completely different words about another topic entirely here"
    )
    stream = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(str(src))
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("doc_id"),
            F.col("value").alias("text"),
        )
    )
    out = str(tmp_path / "out")
    q = (
        streaming_dedup_against_corpus(stream, corpus_bands)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert kept == ["new.md"]


def _make_wav(freq=440.0, rate=8000, seconds=1.0, channels=1):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        n = int(rate * seconds)
        frames = b"".join(
            struct.pack(
                "<" + "h" * channels,
                *([int(20000 * math.sin(2 * math.pi * freq * i / rate))] * channels),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_wav_pcm16_real():
    from rag_content_spark.operators.multimodal import decode_wav_pcm16

    samples, rate = decode_wav_pcm16(_make_wav(rate=8000, seconds=0.5))
    assert rate == 8000 and len(samples) == 4000
    assert abs(float(samples.max()) - 20000 / 32768) < 0.01
    assert decode_wav_pcm16(b"not audio") == (None, None)


def test_extract_audio_features_real_decode(spark):
    from rag_content_spark.operators.multimodal import extract_audio_features

    rows = [
        ("a1", "audio", bytearray(_make_wav(seconds=1.0)), 0, {}),
        ("a2", "audio", bytearray(b"garbage"), 0, {}),
        ("a3", "audio", bytearray(_make_wav(seconds=1.0, channels=2)), 0, {}),
    ]
    from rag_content_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    # 1 s @ 8 kHz, 0.5 s frames -> 2 frames; a 440 Hz tone has high ZCR
    assert got["a1"]["n_samples"] == 8000
    assert got["a1"]["duration_s"] == 1.0
    assert len(got["a1"]["rms"]) == 2
    assert all(r > 0.3 for r in got["a1"]["rms"])
    assert all(z > 0.05 for z in got["a1"]["zcr"])
    # stereo mixes down identically for identical channels
    assert got["a3"]["n_samples"] == 8000
    # non-WAV routes to the empty row, not an error
    assert got["a2"]["n_samples"] == 0 and got["a2"]["rms"] == []


def _make_bmp24(width, height, rgb_rows):
    """Minimal 24-bit BI_RGB BMP from a height x width x 3 nested list."""
    import struct

    row_bytes = (width * 3 + 3) & ~3
    pad = row_bytes - width * 3
    pixel = b""
    for row in reversed(rgb_rows):  # bottom-up
        for (r, g, b) in row:
            pixel += bytes((b, g, r))
        pixel += b"\x00" * pad
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixel), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel), 2835, 2835, 0, 0)
    return header + info + pixel


def test_decode_bmp24_real():
    import numpy as np

    from rag_content_spark.operators.multimodal import decode_bmp24

    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    img = decode_bmp24(_make_bmp24(3, 2, rows))
    assert img.shape == (2, 3, 3)
    assert img[0, 0].tolist() == [255, 0, 0]       # top-left red
    assert img[1, 2].tolist() == [70, 80, 90]
    import pytest

    with pytest.raises(ValueError):
        decode_bmp24(b"nope")


def test_extract_bmp_features_partial_failure(spark):
    from rag_content_spark.operators.multimodal import extract_bmp_features

    good = _make_bmp24(2, 2, [[(100, 100, 100), (100, 100, 100)],
                              [(100, 100, 100), (100, 100, 100)]])
    df = spark.createDataFrame(
        [("ok", bytearray(good)), ("bad", bytearray(b"JUNKJUNK" * 10))],
        ["media_id", "content"],
    )
    out = {r["media_id"]: r for r in extract_bmp_features(df).collect()}
    assert out["ok"]["width"] == 2 and out["ok"]["height"] == 2
    assert abs(out["ok"]["brightness"] - 100.0) < 1e-6
    assert out["ok"]["err"] is None
    assert out["bad"]["err"] is not None and out["bad"]["width"] is None


def _ppm(width, height, pixels):
    """8-bit raw PPM bytes from a nested [[(r,g,b)...]...] list."""
    body = bytes(v for row in pixels for px in row for v in px)
    return (f"P6\n# test\n{width} {height}\n255\n").encode() + body


def test_decode_netpbm_ppm_roundtrip():
    from rag_content_spark.operators.multimodal import decode_netpbm

    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    w, h, c, arr = decode_netpbm(_ppm(2, 2, px))
    assert (w, h, c) == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[1, 1].tolist() == [10, 20, 30]


def test_decode_netpbm_pgm_and_rejects():
    from rag_content_spark.operators.multimodal import decode_netpbm

    pgm = b"P5\n2 1\n255\n" + bytes([7, 200])
    w, h, c, arr = decode_netpbm(pgm)
    assert (w, h, c) == (2, 1, 1) and arr[0, 1, 0] == 200
    assert decode_netpbm(b"nonsense") is None
    assert decode_netpbm(b"P6\n2 2\n65535\n" + b"\0" * 24) is None  # 16-bit
    assert decode_netpbm(b"P6\n4 4\n255\n" + b"\0" * 5) is None     # truncated


def test_extract_netpbm_features_spark(spark):
    from rag_content_spark.operators.multimodal import extract_netpbm_features

    red = _ppm(2, 2, [[(255, 0, 0)] * 2] * 2)
    rows = [("img1", bytearray(red)), ("bad", bytearray(b"oops"))]
    df = spark.createDataFrame(rows, ["media_id", "content"])
    got = {r["media_id"]: r for r in extract_netpbm_features(df).collect()}
    r = got["img1"]
    assert (r["img_width"], r["img_height"], r["img_channels"]) == (2, 2, 3)
    assert r["mean_rgb"] == [255.0, 0.0, 0.0]
    assert abs(r["luma_mean"] - 0.299 * 255) < 0.1
    assert r["edge_density"] == 0.0
    assert got["bad"]["img_width"] is None


def _encode_png(img, color_type, filters, palette=None, trns=None):
    """Minimal test-side PNG encoder: applies the requested filter type
    per scanline (computing filtered bytes from the raw pixels with the
    RFC 2083 formulas), so decode_png's unfilter paths are each driven
    by a true round-trip."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    n_ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * n_ch).astype(np.int64)
    bpp = n_ch
    out_lines = []
    prev = np.zeros(w * n_ch, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        f = filters[y % len(filters)]
        if f == 0:
            filt = cur % 256
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            filt = (cur - left) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            filt = (cur - (left + prev) // 2) % 256
        elif f == 4:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (cur - pred) % 256
        out_lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = cur
    raw = b"".join(out_lines)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    parts = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
    if palette is not None:
        parts.append(chunk(b"PLTE", bytes(palette.reshape(-1))))
    if trns is not None:
        parts.append(chunk(b"tRNS", bytes(trns)))
    parts.append(chunk(b"IDAT", zlib.compress(raw)))
    parts.append(chunk(b"IEND", b""))
    return b"".join(parts)


def test_decode_png_roundtrip_all_filters():
    import numpy as np

    from rag_content_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(7)
    # RGB image, every filter type exercised across scanlines
    img = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _encode_png(img, color_type=2, filters=filters)
        got = decode_png(data)
        assert got.shape == (7, 5, 3)
        assert np.array_equal(got, img), f"filters={filters}"
    # grayscale and RGBA
    gray = rng.randint(0, 256, size=(4, 6), dtype=np.uint8)
    got = decode_png(_encode_png(gray, color_type=0, filters=[4]))
    assert got.shape == (4, 6, 1) and np.array_equal(got[:, :, 0], gray)
    rgba = rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8)
    got = decode_png(_encode_png(rgba, color_type=6, filters=[1, 3]))
    assert np.array_equal(got, rgba)


def test_decode_png_palette_and_rejects():
    import numpy as np
    import pytest as _pytest

    from rag_content_spark.operators.multimodal import decode_png

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    got = decode_png(_encode_png(idx, color_type=3, filters=[0], palette=palette))
    assert np.array_equal(got, palette[idx])
    # tRNS expands to RGBA
    got = decode_png(
        _encode_png(idx, color_type=3, filters=[0], palette=palette,
                    trns=bytes([10, 20]))
    )
    assert got.shape == (2, 2, 4)
    assert got[0, 0, 3] == 10 and got[0, 1, 3] == 20 and got[1, 0, 3] == 255
    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_extract_image_features_real_png(spark):
    # a REAL PNG row gets its true dimensions + a luma histogram that
    # sums to 1; a non-decodable row falls back to the marked fake
    import numpy as np

    from rag_content_spark.operators.multimodal import extract_image_features

    img = np.zeros((10, 8, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    png = _encode_png(img, color_type=2, filters=[0, 1, 2, 3, 4])
    df = spark.createDataFrame(
        [("png1", "image", bytearray(png), len(png), {}),
         ("junk", "image", bytearray(b"\xff\xd8 jpeg-ish"), 9, {})],
        schema="media_id string, media_type string, content binary, "
               "n_bytes long, meta map<string,string>",
    )
    rows = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert rows["png1"]["width"] == 8 and rows["png1"]["height"] == 10
    assert abs(sum(rows["png1"]["feature"]) - 1.0) < 1e-6
    # pure red -> luma 0.2126*255 = 54.2 -> second of 8 bins [32,64)
    assert rows["png1"]["feature"][1] == 1.0
    assert rows["junk"]["width"] is not None  # fake path still plumbs


def test_convert_html_string_to_markdown():
    # string-in/string-out convenience API: same markdown-shaped output
    # as the binary fallback path; "" passes through; headings survive
    from rag_content_spark.sources.converters import (
        _html_to_markdown,
        convert_html_string_to_markdown,
    )

    html = "<html><head><title>x</title></head><body><h1>Title</h1><p>Body para</p><ul><li>a</li><li>b</li></ul></body></html>"
    got = convert_html_string_to_markdown(html, document_name="doc1")
    assert got == _html_to_markdown(html)
    assert "# Title" in got and "- a" in got and "Body para" in got
    assert convert_html_string_to_markdown("") == ""


# --- GIF decode ---------------------------------------------------------


def _encode_gif(indices, palette, interlace=False):
    """Minimal spec-true GIF writer for decoder tests: literal LZW codes
    with a CLEAR before each one (the classic 'uncompressed GIF' trick —
    the table never grows, so the code width stays min_code_size+1),
    LSB-first bit packing, 255-byte sub-blocks."""
    import numpy as np

    h, w = indices.shape
    n = len(palette)
    mcs = max(2, (n - 1).bit_length())
    clear, end = 1 << mcs, (1 << mcs) + 1
    rows = indices
    if interlace:
        order = [y for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(s, h, st)]
        rows = indices[order]
    codes = []
    for px in rows.reshape(-1):
        codes += [clear, int(px)]
    codes.append(end)
    buf = bytearray()
    acc = nbits = 0
    for c in codes:
        acc |= c << nbits
        nbits += mcs + 1
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gct_bits = max(1, (n - 1).bit_length())
    out += bytes([0x80 | (gct_bits - 1), 0, 0])
    for i in range(1 << gct_bits):
        out += bytes(palette[i] if i < n else (0, 0, 0))
    out += b"\x2c" + b"\x00" * 4
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0, mcs])
    for i in range(0, len(buf), 255):
        chunk = buf[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_decode_gif_roundtrip_and_interlace():
    import numpy as np

    from rag_content_spark.operators.multimodal import decode_gif

    rng = np.random.RandomState(3)
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30), (200, 200, 200)]
    idx = rng.randint(0, len(palette), size=(13, 9)).astype(np.uint8)
    want = np.array(palette, np.uint8)[idx]
    got = decode_gif(_encode_gif(idx, palette))
    assert got.shape == (13, 9, 3) and (got == want).all()
    got_i = decode_gif(_encode_gif(idx, palette, interlace=True))
    assert (got_i == want).all()


def test_decode_gif_real_encoder_goldens():
    """GIFs produced by real encoders (Python-distribution icons):
    table-growth LZW with codesize bumps — the width-sync path the
    literal-code roundtrip never exercises. Dimensions are from the
    files' headers; the pixel md5s pin the decode output."""
    import hashlib
    import os

    import numpy as np

    from rag_content_spark.operators.multimodal import decode_gif

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    tk = decode_gif(open(os.path.join(fix, "tk.gif"), "rb").read())
    assert tk.shape == (11, 14, 3)
    # 2-color icon: every pixel is one of the two palette entries
    assert len(np.unique(tk.reshape(-1, 3), axis=0)) == 2
    py = decode_gif(open(os.path.join(fix, "python.gif"), "rb").read())
    assert py.shape == (16, 16, 3)
    assert hashlib.md5(py.tobytes()).hexdigest() == "4853155c8d541412966389d2c696576d"
    assert hashlib.md5(tk.tobytes()).hexdigest() == "c7530818219d7dcec3036344c48c1f9a"


def test_real_decode_routes_gif():
    import os

    from rag_content_spark.operators.multimodal import _real_decode

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    img = _real_decode(open(os.path.join(fix, "python.gif"), "rb").read())
    assert img is not None and img.shape == (16, 16, 3)


# --- JPEG decode --------------------------------------------------------


def _encode_jpeg_gray(img, restart_interval=0):
    """Minimal spec-true baseline JPEG writer (grayscale, quant=1, one
    custom canonical huffman table per class) — an independent encoder
    path for decoder roundtrips: forward DCT + the spec's DC-diff /
    AC-run-length coding, MSB-first bits with 0xFF stuffing, optional
    DRI/RSTn restarts."""
    import numpy as np

    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    x, u = np.meshgrid(np.arange(8), np.arange(8))
    C = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    C[0, :] /= np.sqrt(2.0)
    zig = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]

    def category(v):
        return abs(v).bit_length()

    # pass 1: quantized blocks + symbol inventory
    blocks, dc_syms, ac_syms = [], set(), set()
    pred = 0
    mcu = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                pred = 0
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)
            F = C @ (blk - 128.0) @ C.T
            # zigzag order: zz[k] = natural[zig[k]] (the decoder's
            # inverse is blk[zig] = zz)
            q = np.round(F).astype(int).reshape(64)[zig]
            blocks.append(q)
            dc_syms.add(category(int(q[0]) - pred))
            pred = int(q[0])
            run = 0
            for k in range(1, 64):
                if q[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)
                    run -= 16
                ac_syms.add((run << 4) | category(int(q[k])))
                run = 0
            if run:
                ac_syms.add(0x00)  # EOB
            mcu += 1

    def canonical(symbols):
        syms = sorted(symbols)
        L = max(2, len(syms).bit_length() + 1)  # 2^L > nsym: no all-1s code
        counts = [0] * 16
        counts[L - 1] = len(syms)
        code = {}
        c = 0
        for length in range(1, 17):
            for s in syms[: counts[length - 1]] if counts[length - 1] else []:
                code[s] = (length, c)
                c += 1
            c <<= 1
        return bytes(counts), bytes(syms), code

    dc_counts, dc_list, dc_code = canonical(dc_syms)
    ac_counts, ac_list, ac_code = canonical(ac_syms)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    out += (
        b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x01" + bytes([1, 0x11, 0])
    )
    for cls, counts, lst in ((0, dc_counts, dc_list), (1, ac_counts, ac_list)):
        out += (
            b"\xff\xc4" + (3 + 16 + len(lst)).to_bytes(2, "big")
            + bytes([cls << 4]) + counts + lst
        )
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart_interval.to_bytes(2, "big")
    out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00"

    acc, nbits = 0, 0
    body = bytearray()

    def put(length, code):
        nonlocal acc, nbits
        acc = (acc << length) | code
        nbits += length
        while nbits >= 8:
            byte = (acc >> (nbits - 8)) & 0xFF
            body.append(byte)
            if byte == 0xFF:
                body.append(0x00)
            nbits -= 8

    def put_val(v):
        s = category(v)
        if s:
            put(s, v if v >= 0 else v + (1 << s) - 1)
        return s

    pred = 0
    for mcu, q in enumerate(blocks):
        if restart_interval and mcu and mcu % restart_interval == 0:
            if nbits:
                put(8 - nbits, (1 << (8 - nbits)) - 1)  # pad with 1s
            body += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
            pred = 0
        diff = int(q[0]) - pred
        pred = int(q[0])
        s = category(diff)
        put(*dc_code[s])
        if s:
            put(s, diff if diff >= 0 else diff + (1 << s) - 1)
        run = 0
        for k in range(1, 64):
            if q[k] == 0:
                run += 1
                continue
            while run > 15:
                put(*ac_code[0xF0])
                run -= 16
            v = int(q[k])
            put(*ac_code[(run << 4) | category(v)])
            put_val(v)
            run = 0
        if run:
            put(*ac_code[0x00])
    if nbits:
        put(8 - nbits, (1 << (8 - nbits)) - 1)
    out += body + b"\xff\xd9"
    return bytes(out)


def test_decode_jpeg_gray_roundtrip():
    import numpy as np

    from rag_content_spark.operators.multimodal import decode_jpeg

    rng = np.random.RandomState(11)
    # smooth image: quant=1 keeps DCT rounding error ~1-2 levels
    yy, xx = np.mgrid[0:24, 0:32]
    img = (
        128 + 80 * np.sin(xx / 6.0) * np.cos(yy / 5.0)
        + rng.randint(-4, 5, size=(24, 32))
    ).clip(0, 255).astype(np.uint8)
    got = decode_jpeg(_encode_jpeg_gray(img))
    assert got.shape == (24, 32, 3)
    err = np.abs(got[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 3, err.max()


def test_decode_jpeg_restart_markers():
    import numpy as np

    from rag_content_spark.operators.multimodal import decode_jpeg

    rng = np.random.RandomState(5)
    img = rng.randint(60, 196, size=(16, 40)).astype(np.uint8)
    got = decode_jpeg(_encode_jpeg_gray(img, restart_interval=3))
    err = np.abs(got[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 3, err.max()


def test_decode_jpeg_real_golden_cross_codec():
    """python.jpg and python.gif are renders of the same 16x16 logo:
    two independent codecs must reconstruct strongly-correlated pixels
    (JPEG quantization accounts for the residual)."""
    import os

    import numpy as np

    from rag_content_spark.operators.multimodal import decode_gif, decode_jpeg

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    j = decode_jpeg(open(os.path.join(fix, "python.jpg"), "rb").read())
    assert j.shape == (16, 16, 3) and j.dtype == np.uint8
    g = decode_gif(open(os.path.join(fix, "python.gif"), "rb").read())
    corr = np.corrcoef(
        j.astype(float).ravel(), g.astype(float).ravel()
    )[0, 1]
    assert corr > 0.9, corr


def test_extract_image_features_corrupt_streams_fall_back(spark):
    """Corrupt/truncated payloads with VALID magic bytes raise
    IndexError/zlib.error/struct.error inside the decoders — the UDF
    must fall back to the deterministic fake, not fail the job."""
    import os
    import zlib

    from rag_content_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _fake_decode,
        extract_image_features,
    )

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    trunc_jpeg = open(os.path.join(fix, "python.jpg"), "rb").read()[:40]
    trunc_gif = open(os.path.join(fix, "python.gif"), "rb").read()[:30]
    # PNG with a corrupt IDAT payload (bad zlib stream)
    import struct as _s

    def _chunk(tag, data):
        return (
            _s.pack(">I", len(data)) + tag + data
            + _s.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    bad_png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", b"\x00not-zlib")
        + _chunk(b"IEND", b"")
    )
    payloads = [
        ("j", trunc_jpeg),
        ("g", trunc_gif),
        ("p", bad_png),
        ("b", b"BM" + b"\x01"),  # truncated BMP header
    ]
    df = spark.createDataFrame(
        [(mid, "image", c, len(c), {}) for mid, c in payloads],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert set(rows) == {"j", "g", "p", "b"}
    for mid, content in payloads:
        w, h, feat = _fake_decode(content)
        assert (rows[mid]["width"], rows[mid]["height"]) == (w, h)
        # feature column is float32 — compare at 1e-5
        assert all(
            abs(float(x) - f) < 1e-5
            for x, f in zip(rows[mid]["feature"], feat)
        )


def _encode_animated_gif(frames, palette, delays_cs):
    """Spec-true ANIMATED GIF: graphic-control extension (delay in
    1/100 s) before each frame's image descriptor; pixel data uses the
    same uncompressed-LZW trick as _encode_gif."""
    import numpy as np

    h, w = frames[0].shape
    n = len(palette)
    mcs = max(2, (n - 1).bit_length())
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gct_bits = max(1, (n - 1).bit_length())
    out += bytes([0x80 | (gct_bits - 1), 0, 0])
    for i in range(1 << gct_bits):
        out += bytes(palette[i] if i < n else (0, 0, 0))
    for idx, delay in zip(frames, delays_cs):
        out += b"\x21\xf9\x04\x00" + int(delay).to_bytes(2, "little") + b"\x00\x00"
        out += b"\x2c" + b"\x00" * 4
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0, mcs])
        codes = []
        for px in idx.reshape(-1):
            codes += [clear, int(px)]
        codes.append(end)
        buf = bytearray()
        acc = nbits = 0
        for c in codes:
            acc |= c << nbits
            nbits += mcs + 1
            while nbits >= 8:
                buf.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            buf.append(acc & 0xFF)
        for i in range(0, len(buf), 255):
            chunk = buf[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_frame_schedule_real_delays():
    import numpy as np

    from rag_content_spark.operators.multimodal import (
        decode_gif,
        gif_frame_schedule,
    )

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    frames = [np.full((4, 4), i % 3, dtype=np.uint8) for i in range(3)]
    gif = _encode_animated_gif(frames, palette, delays_cs=[10, 20, 30])
    sched = gif_frame_schedule(gif)
    assert [(round(a, 9), round(b, 9)) for a, b in sched] == [
        (0.0, 0.1), (0.1, 0.2), (0.3, 0.3)
    ]
    # the pixel decoder still reads the FIRST frame of the animation
    img = decode_gif(gif)
    assert img.shape == (4, 4, 3) and tuple(img[0, 0]) == (255, 0, 0)
    # single-frame GIFs from the non-animated encoder: one zero-delay frame
    single = _encode_gif(frames[0], palette)
    assert gif_frame_schedule(single) == [(0.0, 0.0)]


def test_video_frame_sampling_real_gif(spark):
    import numpy as np

    from rag_content_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_video_frames,
    )

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    frames = [np.full((4, 4), i % 3, dtype=np.uint8) for i in range(3)]
    gif = _encode_animated_gif(frames, palette, delays_cs=[10, 20, 30])
    static = _encode_gif(frames[0], palette)
    df = spark.createDataFrame(
        [
            ("anim", "video", gif, len(gif), {}),
            ("stat", "video", static, len(static), {}),
            ("mp4", "video", b"\x00\x00ftypmp4fake", 12, {}),
        ],
        MEDIA_SCHEMA,
    )
    rows = sample_video_frames(df, every_n_seconds=0.25).collect()
    anim = sorted(
        (r["frame_time_s"], r["frame_index"])
        for r in rows
        if r["media_id"] == "anim"
    )
    # duration 0.6 s, grid 0.25 s: the frame ON SCREEN at 0 / 0.25 / 0.5
    assert anim == [(0.0, 0), (0.25, 1), (0.5, 2)]
    stat = [r for r in rows if r["media_id"] == "stat"]
    assert [(r["frame_time_s"], r["frame_index"]) for r in stat] == [(0.0, 0)]
    # non-GIF containers keep the documented deterministic fake
    assert any(r["media_id"] == "mp4" for r in rows)


def test_audio_quality_stats_real_signals(spark):
    import io
    import struct as _s
    import wave

    from rag_content_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_quality_stats,
    )

    def _pcm(vals, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"".join(_s.pack("<h", v) for v in vals))
        return buf.getvalue()

    import math

    rate = 8000
    sine = _pcm(
        [
            int(20000 * math.sin(2 * math.pi * 440.0 * i / rate))
            for i in range(rate)
        ]
    )
    # hard-clipped square wave at full scale (max clipping)
    square = _pcm(
        [32767 if (i // 10) % 2 == 0 else -32768 for i in range(rate)]
    )
    silent = _pcm([0] * rate)
    df = spark.createDataFrame(
        [
            ("sine", "audio", sine, len(sine), {}),
            ("sq", "audio", square, len(square), {}),
            ("zero", "audio", silent, len(silent), {}),
            ("junk", "audio", b"not audio", 9, {}),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in audio_quality_stats(df).collect()}
    # pure 440 Hz tone: spectral centroid within a few Hz of the tone
    assert abs(rows["sine"]["spectral_centroid_hz"] - 440.0) < 5.0
    assert rows["sine"]["clip_frac"] == 0.0
    assert rows["sine"]["silence_frac"] < 0.05  # near-zero-crossing samples only
    # square wave: heavily clipped, wideband (centroid >> 440)
    assert rows["sq"]["clip_frac"] > 0.9
    assert rows["sq"]["spectral_centroid_hz"] > 440.0
    # digital silence: fully silent, zero spectrum
    assert rows["zero"]["silence_frac"] == 1.0
    assert rows["zero"]["spectral_centroid_hz"] == 0.0
    # non-WAV bytes: nulls for the decoder-gated stage
    assert rows["junk"]["duration_s"] is None


def test_resize_array_exact_box_filter():
    import numpy as np

    from rag_content_spark.operators.multimodal import resize_array

    # 2x2 checkerboard area-averaged to 1x1 == the exact mean
    cb = np.array([[[0], [100]], [[200], [100]]], dtype=np.uint8)
    out = resize_array(cb, 1, 1, method="area")
    assert out.shape == (1, 1, 1) and int(out[0, 0, 0]) == 100
    # integer 2x downscale of a constant image stays constant
    const = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = resize_array(const, 4, 4, method="area")
    assert out.shape == (4, 4, 3) and np.all(out == 77)
    # nearest on a gradient picks source pixels exactly
    grad = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    near = resize_array(grad, 2, 2, method="nearest")
    assert near[:, :, 0].tolist() == [[5, 7], [13, 15]]
    # non-integer ratio (3 -> 2): fractional boundary cells average
    tri = np.array([[0, 90, 180]], dtype=np.uint8).reshape(1, 3, 1)
    out = resize_array(tri, 2, 1, method="area")
    # cells cover [0,1.5) and [1.5,3): means (0*1 + 90*0.5)/1.5 = 30,
    # (90*0.5 + 180*1)/1.5 = 150
    assert out[0, :, 0].tolist() == [30, 150]


def test_encode_png_roundtrip():
    import numpy as np

    from rag_content_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, size=(9, 5, c), dtype=np.uint8)
        back = decode_png(encode_png(img))
        if back.ndim == 2:
            back = back[:, :, None]
        assert np.array_equal(back, img), c


def test_resize_images_stage(spark):
    import numpy as np

    from rag_content_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        encode_png,
        resize_images,
    )

    big = np.full((128, 64, 3), 9, dtype=np.uint8)
    small = np.full((16, 16, 3), 5, dtype=np.uint8)
    rows = [
        ("big", "image", encode_png(big), 0, {}),
        ("small", "image", encode_png(small), 0, {}),
        ("junk", "image", b"not an image", 12, {}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(df, max_side=32).collect()}
    # aspect preserved: 128x64 -> 32x16
    assert (out["big"]["width"], out["big"]["height"]) == (16, 32)
    thumb = decode_png(bytes(out["big"]["content"]))
    assert thumb.shape == (32, 16, 3) and int(thumb[0, 0, 0]) == 9
    # never upscaled
    assert (out["small"]["width"], out["small"]["height"]) == (16, 16)
    # undecodable -> null content
    assert out["junk"]["content"] is None


# ------------------- progressive JPEG (round-8: de-faked) -----------------


class _PBits:
    """MSB-first bit writer with 0xFF stuffing (shared by the
    progressive test encoder)."""

    def __init__(self):
        self.body = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, length, code):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.body.append(byte)
            if byte == 0xFF:
                self.body.append(0x00)
            self.n -= 8

    def pad(self):
        if self.n:
            self.put(8 - self.n, (1 << (8 - self.n)) - 1)


def _canonical_table(symbols):
    syms = sorted(symbols)
    L = max(2, len(syms).bit_length() + 1)
    counts = [0] * 16
    counts[L - 1] = len(syms)
    code = {}
    c = 0
    for length in range(1, 17):
        for s in syms[: counts[length - 1]] if counts[length - 1] else []:
            code[s] = (length, c)
            c += 1
        c <<= 1
    return bytes(counts), bytes(syms), code


def _trunc_shift(v, al):
    """T.81 AC point transform: v / 2^Al truncated toward zero."""
    return -((-v) >> al) if v < 0 else v >> al


def _encode_jpeg_gray_progressive(img):
    """Spec-true progressive (SOF2) grayscale encoder for decoder
    parity tests: libjpeg's default band progression at one bit of
    successive approximation — DC first (Al=1), AC 1-5 first (Al=1),
    AC 6-63 first (Al=1), DC refine (1->0), AC 1-63 refine (1->0).
    quant=1, one canonical huffman table per scan, EOB runs of 1.
    Correction bits in refinement are associated per the DECODER's walk
    (an event queue of zero-history / correction positions), which is
    the T.81 G.1.2.3 contract."""
    import numpy as np

    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    x, u = np.meshgrid(np.arange(8), np.arange(8))
    C = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    C[0, :] /= np.sqrt(2.0)
    zig = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    blocks = []
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)
            Fq = C @ (blk - 128.0) @ C.T
            blocks.append(np.round(Fq).astype(int).reshape(64)[zig])

    def category(v):
        return abs(v).bit_length()

    # ---- per-scan bit generators (collect symbols on a dry run) ----
    def dc_first(al, code, bits):
        pred = 0
        syms = set()
        for q in blocks:
            v = int(q[0]) >> al  # arithmetic shift per spec
            diff = v - pred
            pred = v
            s = category(diff)
            syms.add(s)
            if code:
                bits.put(*code[s])
                if s:
                    bits.put(s, diff if diff >= 0 else diff + (1 << s) - 1)
        return syms

    def dc_refine(al, code, bits):
        for q in blocks:
            if code is not None:
                bits.put(1, (int(q[0]) >> al) & 1)
        return set()

    def ac_first(ss, se, al, code, bits):
        syms = set()
        for q in blocks:
            run = 0
            for k in range(ss, se + 1):
                v = _trunc_shift(int(q[k]), al)
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    syms.add(0xF0)
                    if code:
                        bits.put(*code[0xF0])
                    run -= 16
                s = category(v)
                syms.add((run << 4) | s)
                if code:
                    bits.put(*code[(run << 4) | s])
                    bits.put(s, v if v >= 0 else v + (1 << s) - 1)
                run = 0
            if run:
                syms.add(0x00)
                if code:
                    bits.put(*code[0x00])  # EOB run of 1
        return syms

    def ac_refine(ss, se, ah, al, code, bits):
        syms = set()
        for q in blocks:
            # event queue since the last emitted symbol: "z" for a
            # zero-history position with no new significance, (bit,)
            # for a correction bit at an already-significant position
            events = []
            placed_any = False
            for k in range(ss, se + 1):
                hist = _trunc_shift(int(q[k]), ah)
                now = _trunc_shift(int(q[k]), al)
                if hist != 0:
                    events.append((abs(now) & 1,))
                elif now == 0:
                    events.append("z")
                else:
                    # newly significant: |now| == 1 by construction
                    run = sum(1 for e in events if e == "z")
                    while run > 15:
                        syms.add(0xF0)
                        zeros = 0
                        pending = []
                        while zeros < 16:
                            ev = events.pop(0)
                            if ev == "z":
                                zeros += 1
                            else:
                                pending.append(ev[0])
                        if code:
                            bits.put(*code[0xF0])
                            for pb in pending:
                                bits.put(1, pb)
                        run -= 16
                    syms.add((run << 4) | 1)
                    if code:
                        bits.put(*code[(run << 4) | 1])
                        bits.put(1, 1 if now > 0 else 0)
                        for ev in events:
                            if ev != "z":
                                bits.put(1, ev[0])
                    events = []
                    placed_any = True
            if events or not placed_any:
                # EOB (run of 1) + trailing correction bits in band order
                syms.add(0x00)
                if code:
                    bits.put(*code[0x00])
                    for ev in events:
                        if ev != "z":
                            bits.put(1, ev[0])
        return syms

    scans = [
        ("dc", 0, 0, 0, 1, lambda c, b: dc_first(1, c, b)),
        ("ac", 1, 5, 0, 1, lambda c, b: ac_first(1, 5, 1, c, b)),
        ("ac", 6, 63, 0, 1, lambda c, b: ac_first(6, 63, 1, c, b)),
        ("dc", 0, 0, 1, 0, lambda c, b: dc_refine(0, c, b)),
        ("ac", 1, 63, 1, 0, lambda c, b: ac_refine(1, 63, 1, 0, c, b)),
    ]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    out += (
        b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x01" + bytes([1, 0x11, 0])
    )
    for kind, ss, se, ah, al, gen in scans:
        syms = gen(None, None)
        cls = 0 if kind == "dc" else 1
        if syms:
            counts, lst, code = _canonical_table(syms)
            out += (
                b"\xff\xc4" + (3 + 16 + len(lst)).to_bytes(2, "big")
                + bytes([cls << 4]) + counts + lst
            )
        else:
            code = {}
        out += (
            b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01"
            + bytes([1, 0x00]) + bytes([ss, se, (ah << 4) | al])
        )
        bits = _PBits()
        gen(code if syms else {}, bits)
        bits.pad()
        out += bits.body
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_progressive_jpeg_matches_baseline():
    """A progressively-encoded image must decode pixel-identical to its
    baseline encoding (same quantized coefficients, same back end) —
    exercises DC first/refine, banded AC first, cross-band AC
    refinement with ZRL + correction bits + EOB runs."""
    import numpy as np

    from rag_content_spark.operators.multimodal import decode_jpeg

    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, size=(24, 16)).astype(np.uint8)
    base = decode_jpeg(_encode_jpeg_gray(img))
    prog = decode_jpeg(_encode_jpeg_gray_progressive(img))
    assert prog.shape == base.shape == (24, 16, 3)
    np.testing.assert_array_equal(prog, base)


def test_decode_progressive_jpeg_smooth_image():
    """Smooth gradient (long zero runs -> EOB-run + ZRL paths) and a
    constant image (every AC band empty)."""
    import numpy as np

    from rag_content_spark.operators.multimodal import decode_jpeg

    grad = np.tile(np.arange(32, dtype=np.uint8) * 8, (16, 1))
    np.testing.assert_array_equal(
        decode_jpeg(_encode_jpeg_gray_progressive(grad)),
        decode_jpeg(_encode_jpeg_gray(grad)),
    )
    flat = np.full((8, 8), 130, np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(_encode_jpeg_gray_progressive(flat)),
        decode_jpeg(_encode_jpeg_gray(flat)),
    )


def test_decode_progressive_noninterleaved_dc_subsampled():
    """T.81 A.2.2: a single-component (Ns=1) DC scan walks the
    COMPONENT'S own bw x bh raster grid, not the MCU-padded interleaved
    grid (round-8 ADVICE). Hand-crafted 8x8 4:2:0 stream: Y is 2x2
    subsampling -> one MCU covers the image, so the MCU walk would read
    FOUR Y blocks where the spec-true component walk reads ONE. The
    stream encodes exactly one DC value per component (Y: diff 8 ->
    pixel 129; Cb/Cr: 0 -> 128) followed by empty AC bands, so the
    correct decode is a flat 129-gray image."""
    import numpy as np

    from rag_content_spark.operators.multimodal import decode_jpeg

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    b = b"\xff\xd8"
    b += seg(0xDB, bytes([0x00]) + bytes([1] * 64))        # DQT all-ones
    # SOF2: 8x8, Y id1 h2v2, Cb id2 h1v1, Cr id3 h1v1, all tq0
    b += seg(
        0xC2,
        bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    # DC table 0: canonical {4: '0', 0: '10'}; AC table 0: {0x00: '0'}
    b += seg(0xC4, bytes([0x00, 1, 1] + [0] * 14 + [4, 0]))
    b += seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0x00]))

    def sos(comp_id, ss, se):
        return seg(0xDA, bytes([1, comp_id, 0x00, ss, se, 0x00]))

    # DC-first scans (Ss=0, Ah=Al=0), one per component, Ns=1 each:
    # Y: code('0' for cat 4) + '1000' (diff 8), pad 1s -> 0x47 — ONE
    # block's worth of bits; the MCU walk would demand four
    b += sos(1, 0, 0) + bytes([0x47])
    b += sos(2, 0, 0) + bytes([0xBF])  # cat 0 ('10'), pad -> 0xBF
    b += sos(3, 0, 0) + bytes([0xBF])
    # AC-first scans 1-63: EOB ('0'), pad -> 0x7F
    for cid in (1, 2, 3):
        b += seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0x00])) + bytes([0x7F])
    b += b"\xff\xd9"

    out = decode_jpeg(b)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out, np.full((8, 8, 3), 129, np.uint8))
