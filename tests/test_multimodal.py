"""Real (non-fake) multimodal decode: pure-stdlib decoders on crafted bytes
with known pixels/samples, plus the distributed mapInPandas path."""

import struct
import zlib

import pytest


def make_png(pixels, filters=None):
    """A valid RGB8 PNG from a row-major [[(r,g,b)]] grid. ``filters`` picks
    the per-scanline filter byte (default all 0 / None-filter); the encoder
    applies the matching forward filter so the decoder must undo it."""
    h, w = len(pixels), len(pixels[0])
    filters = filters or [0] * h
    raw = bytearray()
    prev = bytes(w * 3)
    for row, f in zip(pixels, filters):
        line = bytes(v for px in row for v in px)
        if f == 0:
            enc = line
        elif f == 1:  # sub
            enc = bytes((line[x] - (line[x - 3] if x >= 3 else 0)) & 0xFF for x in range(len(line)))
        elif f == 2:  # up
            enc = bytes((line[x] - prev[x]) & 0xFF for x in range(len(line)))
        else:
            raise ValueError(f)
        raw += bytes([f]) + enc
        prev = line

    def chunk(ctype, payload):
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


PIXELS = [
    [(0, 0, 0), (255, 255, 255), (10, 20, 30), (40, 50, 60)],
    [(1, 2, 3), (4, 5, 6), (7, 8, 9), (100, 150, 200)],
]
EXPECTED_MEAN = sum(v for row in PIXELS for px in row for v in px) / (2 * 4 * 3)


def test_decode_png_real():
    from ffn_polars_spark.operators.multimodal import decode_image

    for filters in ([0, 0], [0, 2], [1, 1], [1, 2]):
        out = decode_image(make_png(PIXELS, filters), fake=False)
        assert out["width"] == 4 and out["height"] == 2 and out["channels"] == 3
        assert out["mean_intensity"] == pytest.approx(EXPECTED_MEAN), filters


def test_decode_jpeg_gif_bmp_headers():
    from ffn_polars_spark.operators.multimodal import decode_image

    sof = b"\xff\xc0" + struct.pack(">H", 8 + 3 * 3) + b"\x08" + struct.pack(">HH", 99, 150) + b"\x03" + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    jpeg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00" + sof + b"\xff\xd9"
    out = decode_image(jpeg, fake=False)
    assert (out["width"], out["height"], out["channels"]) == (150, 99, 3)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 20
    out = decode_image(gif, fake=False)
    assert (out["width"], out["height"]) == (320, 200)

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, -48) + b"\x00\x00" + struct.pack("<H", 24) + b"\x00" * 10
    out = decode_image(bmp, fake=False)
    assert (out["width"], out["height"], out["channels"]) == (64, 48, 3)

    with pytest.raises(NotImplementedError):
        decode_image(b"not an image at all", fake=False)


def make_wav(n_samples=4000, rate=8000, amplitude=16384):
    """16-bit PCM mono square wave; RMS is exactly amplitude/32768."""
    import array

    samples = array.array("h", [amplitude if i % 2 else -amplitude for i in range(n_samples)])
    pcm = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_real():
    from ffn_polars_spark.operators.multimodal import decode_audio

    out = decode_audio(make_wav(), fake=False)
    assert out["sample_rate"] == 8000
    assert out["duration_s"] == pytest.approx(0.5)  # 4000 samples @ 8 kHz
    assert out["rms"] == pytest.approx(16384 / 32768.0)

    with pytest.raises(NotImplementedError):
        decode_audio(b"definitely not audio", fake=False)


def test_extract_image_features_real_distributed(spark):
    """The VERDICT acceptance line: extract_image_features returns real
    width/height on actual PNG bytes, through the Spark mapInPandas path."""
    from ffn_polars_spark.operators.multimodal import extract_image_features

    png = make_png(PIXELS)
    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(make_png([[(9, 9, 9)]])))],
                               "doc_id long, content binary")
    rows = {r["doc_id"]: r for r in extract_image_features(df, fake=False).collect()}
    assert rows[1]["width"] == 4 and rows[1]["height"] == 2
    assert rows[1]["mean_intensity"] == pytest.approx(EXPECTED_MEAN)
    assert rows[2]["width"] == 1 and rows[2]["height"] == 1
    assert rows[2]["mean_intensity"] == pytest.approx(9.0)
    assert rows[1]["n_bytes"] == len(png)


def test_extract_audio_features_real_distributed(spark):
    from ffn_polars_spark.operators.multimodal import extract_audio_features

    df = spark.createDataFrame([(7, bytearray(make_wav(800, rate=16000)))],
                               "doc_id long, content binary")
    row = extract_audio_features(df, fake=False).collect()[0]
    assert row["sample_rate"] == 16000
    assert row["duration_s"] == pytest.approx(800 / 16000)


def test_decode_jpeg_fill_byte_padding():
    """Legal 0xFF fill bytes between segments (ITU T.81 B.1.1.2) must not
    derail the SOF walk."""
    from ffn_polars_spark.operators.multimodal import decode_image

    sof = b"\xff\xc0" + struct.pack(">H", 8 + 3 * 3) + b"\x08" + struct.pack(">HH", 99, 150) + b"\x03" + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
    # padding before the APP0 marker and before the SOF marker
    jpeg = b"\xff\xd8" + b"\xff\xff" + app0[1:] + b"\xff\xff\xff" + sof[1:] + b"\xff\xd9"
    out = decode_image(jpeg, fake=False)
    assert (out["width"], out["height"], out["channels"]) == (150, 99, 3)


def test_decode_wav_zero_byte_rate_falls_through():
    """byte_rate=0 in a malformed fmt chunk must not raise
    ZeroDivisionError — it falls through to the unrecognized-format path."""
    from ffn_polars_spark.operators.multimodal import decode_audio

    pcm = b"\x00\x00" * 100
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 0, 2, 16)  # byte_rate = 0
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(NotImplementedError):
        decode_audio(wav, fake=False)


def test_extractors_null_row_on_corrupt_records(spark):
    """One malformed blob in a corpus must not fail the Spark job: the
    default on_error='null' emits the row with null feature columns while
    good records decode normally; on_error='raise' propagates."""
    from ffn_polars_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
    )

    good = make_png(PIXELS)
    truncated = good[:20]  # dies inside the IDAT/chunk walk
    not_image = b"definitely not an image"
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(truncated)), (3, bytearray(not_image))],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in extract_image_features(df, fake=False).collect()}
    assert rows[1]["width"] == 4  # good row still decodes
    assert rows[2]["width"] is None and rows[2]["mean_intensity"] is None
    assert rows[3]["width"] is None
    # provenance columns survive for the bad rows
    assert rows[2]["n_bytes"] == len(truncated) and rows[2]["sha256"]

    with pytest.raises(Exception):
        extract_image_features(df, fake=False, on_error="raise").collect()
    with pytest.raises(ValueError):
        extract_image_features(df, fake=False, on_error="bogus")

    bad_wav = make_wav()[:30]
    adf = spark.createDataFrame(
        [(1, bytearray(make_wav(800, rate=16000))), (2, bytearray(bad_wav))],
        "doc_id long, content binary",
    )
    arows = {r["doc_id"]: r for r in extract_audio_features(adf, fake=False).collect()}
    assert arows[1]["sample_rate"] == 16000
    assert arows[2]["duration_s"] is None and arows[2]["sample_rate"] is None
