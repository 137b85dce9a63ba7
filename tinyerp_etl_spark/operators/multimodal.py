"""Multimodal column plumbing: binary payloads + typed metadata.

Policy for image/audio/video at 100 TB: the *bytes* are an opaque
``binary`` column (parquet stores them page-compressed; Spark never
interprets them JVM-side), and every derived signal lives in typed
metadata columns so filters/joins prune without touching payloads.
Decode/resize/frame-sample run as Arrow-batched ``mapInPandas``
stages — the only place Python touches data, in columnar batches.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are stubbed: ``decode=fake`` produces a
deterministic byte-derived pseudo-decode (so the full pipeline —
schema, batching, partitioning — is testable), ``decode=real`` raises
NotImplementedError where the codec call would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def pack_media(
    df: DataFrame, id_col: str, payload_col: str, mime: str
) -> DataFrame:
    """Wrap a binary/string payload column into the media schema.

    Metadata (size, checksum) is computed JVM-side — payload bytes are
    only ever *carried*, never parsed, until an explicit decode stage.
    """
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("checksum"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic pseudo-decode: dims + an 8-dim feature from bytes.

    Stands in for PIL.Image.open / cv2.imdecode so the surrounding
    Spark plumbing is real and testable in this container.
    """
    h = hashlib.sha256(payload or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 3
    feature = [round(b / 255.0, 6) for b in h[3:11]]
    return width, height, channels, feature


def decode_media(df: DataFrame, mode: str = "fake", batch_hint: int | None = None) -> DataFrame:
    """Decode stage: mapInPandas over Arrow batches of media rows.

    ``mode='real'`` marks where the codec integration goes; this
    container has no image/audio libs, so it raises.
    """
    if mode == "real":
        raise NotImplementedError(
            "codec libs (PIL/ffmpeg) not available in this container; "
            "use mode='fake' for the deterministic pseudo-decoder"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (mid, *_fake_decode(bytes(content) if content is not None else b""))
                for mid, content in zip(pdf["media_id"], pdf["content"])
            ]
            out = pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "feature"]
            )
            yield out

    return df.select("media_id", "content").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: which frames to keep.

    Pure metadata arithmetic (no decode): given frame counts derived
    from payload size, emit (media_id, frame_index) rows. The actual
    frame extraction would be a mapInPandas kernel like decode_media.
    """
    n_frames = (F.col("meta.n_bytes") / 1024).cast("int") + 1
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))
        ).alias("frame_index"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, max_side: int = 256, mode: str = "fake"
) -> DataFrame:
    """Resize stage: aspect-preserving fit into a max_side box.

    The Spark plumbing — Arrow batch shape, binary in/out columns,
    deterministic output dims — is real; the pixel kernel is the
    stubbed part (``mode='real'`` marks the PIL/ffmpeg integration
    point; this container has no image libs). The fake kernel
    truncates the payload proportionally to the area ratio so
    downstream size accounting behaves like a real resize.

    Input: decoded dims joined back onto payloads —
    (media_id, width, height, content).
    """
    if mode == "real":
        raise NotImplementedError(
            "codec libs (PIL/ffmpeg) not available in this container; "
            "use mode='fake' for the deterministic stub kernel"
        )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, w, h, content in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["content"]
            ):
                w, h = int(w), int(h)
                scale = min(1.0, max_side / max(w, h, 1))
                # round, not truncate: int(w * (max_side/w)) can land on
                # max_side−1 through float error
                ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
                payload = bytes(content) if content is not None else b""
                keep = max(1, int(len(payload) * (ow * oh) / max(w * h, 1)))
                rows.append((mid, w, h, ow, oh, payload[:keep]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "out_width", "out_height", "content",
                ],
            )

    return df.select("media_id", "width", "height", "content").mapInPandas(
        resize_batches, schema=RESIZED_SCHEMA
    )
