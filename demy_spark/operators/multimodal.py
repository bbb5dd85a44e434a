"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` payloads
next to structured metadata; decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects. The media codec libraries (Pillow/ffmpeg/librosa) are NOT
in this environment, so the actual decode step is stubbed behind
``NotImplementedError`` with a deterministic byte-level feature path
(magic sniffing, sizes, digests) that keeps the Spark-side plumbing —
schema, batching, partitioning — real and tested.
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
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG", "image/png"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
]

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("sniffed_mime", T.StringType()),
        T.StructField("entropy_proxy", T.DoubleType()),
    ]
)


def _sniff(b: bytes | None) -> str:
    if not b:
        return "application/octet-stream"
    for magic, mime in _MAGIC:
        if b.startswith(magic):
            return mime
    return "application/octet-stream"


def extract_byte_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic byte-level features per media row (the decode-free
    path): size, sha1, magic-sniffed mime, distinct-byte entropy proxy.
    Arrow-batched — one pandas frame per partition batch, no per-row
    Python overhead beyond the hash itself."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "sha1": payloads.map(
                        lambda b: hashlib.sha1(b or b"").hexdigest()
                    ),
                    "sniffed_mime": payloads.map(_sniff),
                    "entropy_proxy": payloads.map(
                        lambda b: 0.0 if not b else len(set(b)) / 256.0
                    ),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — image decode requires Pillow/opencv, not present in this
    environment. The production implementation is a mapInPandas with
    the same batch shape as extract_byte_features returning
    (media_id, height, width, channels, pixels array<float>)."""
    raise NotImplementedError(
        "image decode needs a codec library (Pillow/opencv); not available "
        "in this environment — use extract_byte_features for the tested path"
    )


def sample_video_frames(
    df: DataFrame, payload_col: str = "payload", every_ms: int = 1000
) -> DataFrame:
    """STUB — frame sampling requires ffmpeg bindings (see decode_image)."""
    raise NotImplementedError(
        "video frame sampling needs ffmpeg bindings; not available here"
    )


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes
    derived from the id (stable across runs), magic headers rotated
    across mime types."""
    magics = [m for m, _ in _MAGIC]

    rows = []
    for i in range(n):
        body = hashlib.sha256(str(i).encode()).digest() * (1 + i % 7)
        payload = magics[i % len(magics)] + body
        rows.append(
            (
                i,
                bytearray(payload),
                (_sniff(bytes(payload)), 64 + i % 512, 64 + (i * 3) % 512, 1000 * (i % 90)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
