"""Multimodal (image/audio/video) column handling.

Convention: media content is an opaque ``binary`` column plus a typed
metadata struct — the layout a 100 TB multimodal corpus actually ships with
(bytes in parquet/lance, metadata columns alongside). Decode / feature
extraction / resize / frame sampling run as Arrow-batched ``mapInPandas``
stages so each executor processes whole record batches with a real decoder.

This container has no image/audio libraries, so the decoders are STUBS: the
Spark-side plumbing (schemas, batch iteration, partitioning) is real and
tested; ``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
a deterministic fake decode is requested (``fake=True``), which derives
pseudo-features from the bytes themselves and is what the tests/oracle pin.
"""

from __future__ import annotations

import hashlib
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


def decode_image(data: bytes, fake: bool = False) -> dict:
    """Decode one image. Real decode requires an imaging library that is not
    in this container → NotImplementedError (clearly-marked stub, per
    BASELINE.json). ``fake=True`` derives deterministic pseudo-dimensions from
    the byte content so the distributed plumbing can be exercised and
    oracle-checked end to end."""
    if not fake:
        try:
            from PIL import Image  # type: ignore  # pragma: no cover
            import io  # pragma: no cover

            img = Image.open(io.BytesIO(data))  # pragma: no cover
            return {  # pragma: no cover
                "width": img.width,
                "height": img.height,
                "channels": len(img.getbands()),
                "mean_intensity": 0.0,
            }
        except ImportError:
            raise NotImplementedError(
                "real image decode needs an imaging library (PIL) not present "
                "in this environment; pass fake=True for the deterministic stub"
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
) -> DataFrame:
    """Image feature extraction over Arrow batches (``mapInPandas``).

    Each executor receives whole record batches (bytes stay off the driver),
    decodes, and emits a typed feature row — the shape a real
    thumbnail/CLIP-preprocess stage takes. Decode itself is the stub above.
    """

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                data = bytes(row[content_col]) if row[content_col] is not None else b""
                feats = decode_image(data, fake=fake)
                out.append(
                    {
                        "doc_id": row[id_col],
                        "n_bytes": len(data),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        **feats,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "sha256",
                    "width",
                    "height",
                    "channels",
                    "mean_intensity",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


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


def decode_audio(data: bytes, fake: bool = False) -> dict:
    """Decode one audio clip — STUB like :func:`decode_image` (no audio
    library in this container). ``fake=True`` derives deterministic
    pseudo-features from the bytes."""
    if not fake:
        raise NotImplementedError(
            "real audio decode needs an audio library (soundfile/librosa) not "
            "present in this environment; pass fake=True for the stub"
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
) -> DataFrame:
    """Audio feature extraction over Arrow batches (``mapInPandas``) — same
    plumbing shape as :func:`extract_image_features`."""

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                data = bytes(row[content_col]) if row[content_col] is not None else b""
                feats = decode_audio(data, fake=fake)
                out.append({"doc_id": row[id_col], "n_bytes": len(data), **feats})
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "duration_s", "sample_rate", "rms"]
            )

    return df.select(id_col, content_col).mapInPandas(_extract, AUDIO_FEATURES_SCHEMA)


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

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                data = bytes(row[content_col]) if row[content_col] is not None else b""
                resized = (data * (size // max(len(data), 1) + 1))[:size]
                out.append(
                    {
                        "doc_id": row[id_col],
                        "width": int(target),
                        "height": int(target),
                        "content": resized,
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "content"])

    return df.select(id_col, content_col).mapInPandas(_resize, RESIZED_SCHEMA)
