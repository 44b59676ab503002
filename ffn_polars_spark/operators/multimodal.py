"""Multimodal (image/audio/video) column handling.

Convention: media content is an opaque ``binary`` column plus a typed
metadata struct — the layout a 100 TB multimodal corpus actually ships with
(bytes in parquet/lance, metadata columns alongside). Decode / feature
extraction / resize / frame sampling run as Arrow-batched ``mapInPandas``
stages so each executor processes whole record batches with a real decoder.

Decode strategy (``fake=False``, the real path):

1. **Pure-stdlib decoders** for the common container formats — PNG (IHDR
   header + full zlib-inflate/unfilter pixel decode at 8-bit depth), JPEG
   (SOF marker scan), GIF, BMP headers, and RIFF/WAV PCM (fmt chunk +
   real RMS over 16-bit samples). No third-party library needed.
2. **PIL / soundfile** when installed, for formats outside that set
   (import-guarded — absent in this container).
3. ``NotImplementedError`` for unrecognized bytes.

``fake=True`` derives deterministic pseudo-features from the bytes
themselves — that path is what the DuckDB oracle pins (the oracle cannot
inflate PNGs), while unit tests pin the real decoders on crafted PNG/WAV
bytes with known pixels/samples.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ffn_polars_spark.registry import register

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),      # png, wav, mp4, ...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, content_col: str = "content", media_type: str = "image", fmt: str = "bin"
) -> DataFrame:
    """Typed metadata struct for a binary column — native expressions only."""
    c = F.col(content_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.octet_length(c).cast("long").alias("n_bytes"),
            F.sha2(c, 256).alias("sha256"),
        ),
    )


def text_as_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: treat a text column's utf-8 bytes as media content
    (the driver testdata has no binary table)."""
    return df.withColumn("content", F.encode(F.col(text_col), "utf-8"))


# PNG color_type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(data: bytes) -> dict:
    """Full PNG decode with the stdlib: IHDR header, then (at 8-bit depth,
    non-interlaced, non-palette) zlib-inflate of the IDAT stream and scanline
    unfiltering (filters 0-4 per the PNG spec) for a real mean intensity."""
    width, height = struct.unpack(">II", data[16:24])
    bit_depth, color_type, _comp, _filt, interlace = data[24:29]
    channels = _PNG_CHANNELS.get(color_type, 3)
    mean = None
    if bit_depth == 8 and interlace == 0 and color_type in (0, 2, 4, 6):
        idat = bytearray()
        i = 8
        while i + 8 <= len(data):
            (clen,) = struct.unpack(">I", data[i : i + 4])
            ctype = data[i + 4 : i + 8]
            if ctype == b"IDAT":
                idat += data[i + 8 : i + 8 + clen]
            if ctype == b"IEND":
                break
            i += 12 + clen  # len + type + payload + crc
        raw = zlib.decompress(bytes(idat))
        stride = width * channels
        prev = bytearray(stride)
        total = 0
        for y in range(height):
            off = y * (stride + 1)
            f = raw[off]
            line = bytearray(raw[off + 1 : off + 1 + stride])
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                if f == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif f == 2:
                    line[x] = (line[x] + b) & 0xFF
                elif f == 3:
                    line[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    c = prev[x - channels] if x >= channels else 0
                    line[x] = (line[x] + _paeth(a, b, c)) & 0xFF
            total += sum(line)
            prev = line
        mean = total / float(height * stride) if height * stride else 0.0
    return {
        "width": int(width),
        "height": int(height),
        "channels": int(channels),
        "mean_intensity": mean,
    }


# JPEG start-of-frame markers (all SOFn except DHT/JPG/DAC at C4/C8/CC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _decode_jpeg(data: bytes) -> Optional[dict]:
    n = len(data)
    i = 2
    while i < n:
        if data[i] != 0xFF:
            return None
        # consecutive 0xFF bytes are legal fill padding before a marker
        # (ITU T.81 B.1.1.2) — skip them all, then read the marker byte
        while i < n and data[i] == 0xFF:
            i += 1
        if i >= n:
            return None
        marker = data[i]
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            height, width = struct.unpack(">HH", data[i + 4 : i + 8])
            return {
                "width": int(width),
                "height": int(height),
                "channels": int(data[i + 8]),
                "mean_intensity": None,  # entropy decode is out of scope
            }
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone, no length
            i += 1
            continue
        if i + 3 > n:
            return None
        (seg_len,) = struct.unpack(">H", data[i + 1 : i + 3])
        if seg_len < 2:
            return None
        i += 1 + seg_len
    return None


def decode_image(data: bytes, fake: bool = False) -> dict:
    """Decode one image's dimensions/channels (and, for PNG, real mean
    intensity) from actual bytes.

    Real path: pure-stdlib decoders for PNG / JPEG / GIF / BMP; PIL handles
    anything else when installed; otherwise NotImplementedError. The
    ``fake=True`` stub derives deterministic pseudo-dimensions from the byte
    content — kept for the SQL oracle, which cannot run a decoder."""
    if not fake:
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(data)
        if data[:2] == b"\xff\xd8":
            out = _decode_jpeg(data)
            if out:
                return out
        if data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return {"width": w, "height": h, "channels": 3, "mean_intensity": None}
        if data[:2] == b"BM" and len(data) >= 30:
            w, h = struct.unpack("<ii", data[18:26])
            (bits,) = struct.unpack("<H", data[28:30])
            return {
                "width": int(w),
                "height": abs(int(h)),
                "channels": max(1, bits // 8),
                "mean_intensity": None,
            }
        try:
            import io

            from PIL import Image  # type: ignore

            img = Image.open(io.BytesIO(data))  # pragma: no cover
            return {  # pragma: no cover
                "width": img.width,
                "height": img.height,
                "channels": len(img.getbands()),
                "mean_intensity": None,
            }
        except ImportError:
            raise NotImplementedError(
                "unrecognized image format: the stdlib decoders cover "
                "PNG/JPEG/GIF/BMP and PIL is not installed; pass fake=True "
                "for the deterministic stub"
            )
    n = len(data)
    first = data[0] if n else 0
    return {
        "width": 16 + (n % 64),
        "height": 16 + (first % 64),
        "channels": 3,
        "mean_intensity": float((n * 31 + first) % 256),
    }


@register(namespace="eod", kind="df", context="dataframe", alias="extract_image_features")
def extract_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
    on_error: str = "null",
) -> DataFrame:
    """Image feature extraction over Arrow batches (``mapInPandas``).

    Each executor receives whole record batches (bytes stay off the driver),
    decodes, and emits a typed feature row — the shape a real
    thumbnail/CLIP-preprocess stage takes. Decode itself is the stub above.

    ``on_error`` governs undecodable records (truncated/corrupt bytes,
    unrecognized formats): ``"null"`` (default) emits the row with null
    feature columns — one bad blob in a 100 TB corpus must not fail the
    whole job — while ``"raise"`` propagates the decode error.

    Parallelism guard (r12 scale-decade find): the Python stage chains on
    the scan's partitioning, and a single-row-group parquet file (the
    pyarrow/pandas writer default) feeds ONE task no matter how many
    byte-splits it reports — the 50k-doc decade point ran the whole
    decode single-threaded. Same ``spread_scan`` gate as the text
    pipelines: no-op whenever the scan's effective parallelism already
    covers half the cluster's slots (measured 2.7x at the 50k-doc point).
    The per-batch loop builds columns with a plain zip over the two input
    columns (measured 4.3x over the previous ``iterrows``+dict-per-row
    shape at 5M docs, 18.3 s -> 4.3 s — pandas row boxing, not decode,
    dominated).
    """
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise'; got {on_error!r}")

    _NULL_IMG = (None, None, None, None)

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].tolist()
            n_bytes, shas, feats = [], [], []
            for raw in pdf[content_col]:
                data = bytes(raw) if raw is not None else b""
                n_bytes.append(len(data))
                shas.append(hashlib.sha256(data).hexdigest())
                try:
                    f = decode_image(data, fake=fake)
                    feats.append(
                        (f["width"], f["height"], f["channels"], f["mean_intensity"])
                    )
                except Exception:
                    if on_error == "raise":
                        raise
                    feats.append(_NULL_IMG)
            w, h, ch, mi = zip(*feats) if feats else ((), (), (), ())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": n_bytes,
                    "sha256": shas,
                    "width": w,
                    "height": h,
                    "channels": ch,
                    "mean_intensity": mi,
                }
            )

    from ffn_polars_spark.operators._scanmeta import spread_scan

    staged = spread_scan(df.select(id_col, content_col), id_col)
    return staged.mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling plumbing: emit (doc_id, frame_idx, byte_offset)
    rows for downstream decode — pure native expressions (the real decoder
    would be another mapInPandas stage on the offsets)."""
    n = F.octet_length(F.col(content_col)).cast("long")
    n_frames = F.least(F.lit(max_frames), (n / F.lit(every_n_bytes)).cast("int") + 1)
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i * F.lit(every_n_bytes),
            )
        ).alias("frame_idx", "byte_offset"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _decode_wav(data: bytes) -> Optional[dict]:
    """RIFF/WAVE chunk walk: fmt -> sample rate / byte rate, data -> real
    duration and (for 16-bit PCM) real RMS over the samples. Pure stdlib."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    sample_rate = byte_rate = bits = None
    pcm = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (clen,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            _fmt, _nch, sample_rate, byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif cid == b"data":
            pcm = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    # not byte_rate: a malformed fmt chunk with byte_rate=0 must fall
    # through to soundfile/NotImplementedError, not ZeroDivisionError
    if sample_rate is None or pcm is None or not byte_rate:
        return None
    rms = 0.0
    if bits == 16 and len(pcm) >= 2:
        import array

        samples = array.array("h")
        samples.frombytes(pcm[: len(pcm) // 2 * 2])
        rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 / 32768.0
    return {
        "duration_s": len(pcm) / float(byte_rate),
        "sample_rate": int(sample_rate),
        "rms": rms,
    }


def decode_audio(data: bytes, fake: bool = False) -> dict:
    """Decode one audio clip's duration / sample rate / RMS from actual
    bytes: stdlib RIFF/WAV PCM decoder; soundfile for other formats when
    installed; else NotImplementedError. ``fake=True`` keeps the
    deterministic byte-derived stub for the SQL oracle."""
    if not fake:
        out = _decode_wav(data)
        if out:
            return out
        try:
            import io

            import soundfile as sf  # type: ignore

            with sf.SoundFile(io.BytesIO(data)) as f:  # pragma: no cover
                return {  # pragma: no cover
                    "duration_s": len(f) / float(f.samplerate),
                    "sample_rate": int(f.samplerate),
                    "rms": 0.0,
                }
        except ImportError:
            raise NotImplementedError(
                "unrecognized audio format: the stdlib decoder covers "
                "RIFF/WAV PCM and soundfile is not installed; pass fake=True "
                "for the deterministic stub"
            )
    n = len(data)
    first = data[0] if n else 0
    sample_rate = 8000 * (1 + first % 3)  # 8/16/24 kHz
    return {
        "duration_s": float(n) / sample_rate,
        "sample_rate": sample_rate,
        "rms": float((n * 17 + first) % 1000) / 1000.0,
    }


@register(namespace="eod", kind="df", context="dataframe", alias="extract_audio_features")
def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
    on_error: str = "null",
) -> DataFrame:
    """Audio feature extraction over Arrow batches (``mapInPandas``) — same
    plumbing shape as :func:`extract_image_features`, with the same
    ``on_error`` null-row contract for undecodable records, the same
    ``spread_scan`` parallelism guard, and the same column-zip batch loop
    (the iterrows row boxing measured 4.3x the decode on the image twin).
    """
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise'; got {on_error!r}")

    _NULL_AUDIO = (None, None, None)

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].tolist()
            n_bytes, feats = [], []
            for raw in pdf[content_col]:
                data = bytes(raw) if raw is not None else b""
                n_bytes.append(len(data))
                try:
                    f = decode_audio(data, fake=fake)
                    feats.append((f["duration_s"], f["sample_rate"], f["rms"]))
                except Exception:
                    if on_error == "raise":
                        raise
                    feats.append(_NULL_AUDIO)
            dur, sr, rms = zip(*feats) if feats else ((), (), ())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": n_bytes,
                    "duration_s": dur,
                    "sample_rate": sr,
                    "rms": rms,
                }
            )

    from ffn_polars_spark.operators._scanmeta import spread_scan

    staged = spread_scan(df.select(id_col, content_col), id_col)
    return staged.mapInPandas(_extract, AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


@register(namespace="eod", kind="df", context="dataframe", alias="resize_images")
def resize_images(
    df: DataFrame,
    target: int = 32,
    content_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Image resize over Arrow batches (``mapInPandas``), emitting new binary
    content — the thumbnail stage of a training-data pipeline. The real
    resample needs an imaging library; the fake path truncates/pads bytes to
    ``target*target*3`` deterministically so batch shapes, binary output and
    schema are exercised for real."""
    if not fake:
        raise NotImplementedError(
            "real image resize needs an imaging library; pass fake=True"
        )

    size = int(target) * int(target) * 3
    tgt = int(target)

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].tolist()
            content = [
                ((bytes(raw) if raw is not None else b"")
                 * (size // max(len(raw) if raw is not None else 0, 1) + 1))[:size]
                for raw in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": [tgt] * len(ids),
                    "height": [tgt] * len(ids),
                    "content": content,
                }
            )

    from ffn_polars_spark.operators._scanmeta import spread_scan

    staged = spread_scan(df.select(id_col, content_col), id_col)
    return staged.mapInPandas(_resize, RESIZED_SCHEMA)
