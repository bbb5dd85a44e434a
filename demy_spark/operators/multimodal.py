"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` payloads
next to structured metadata; decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects. Image decode auto-detects Pillow at runtime
(``pillow_available()``): when present, ``decode_image`` decodes real
JPEG/PNG bytes; when absent (this container), it falls back to a
clearly-marked deterministic fake keystream with the identical
schema/batch shape, so the Spark-side plumbing — schema, batching,
partitioning — is real and tested either way. Video/audio codecs
(ffmpeg/librosa) remain faked the same way.
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
        T.StructField("sha256", T.StringType()),
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
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "sniffed_mime": payloads.map(_sniff),
                    "entropy_proxy": payloads.map(
                        lambda b: 0.0 if not b else len(set(b)) / 256.0
                    ),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes | None, h: int, w: int, c: int = 3) -> list[float]:
    """DETERMINISTIC FAKE decoder (this container has no codec libs):
    pixels in [0,1] derived from a sha256 keystream over the payload —
    stable across runs/executors, shaped exactly like a real decode.
    Swap for Pillow/opencv in production; nothing else changes."""
    n = h * w * c
    out: list[float] = []
    counter = 0
    seed = hashlib.sha256(payload or b"").digest()
    while len(out) < n:
        block = hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in block)
        counter += 1
    return out[:n]


def pillow_available() -> bool:
    """True when Pillow is importable in this interpreter — decides
    whether ``decode_image`` decodes real bytes or the deterministic
    fake. Checked on the DRIVER; executors share the environment in
    every supported deployment (same image/venv)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _pillow_decode(payload: bytes | None, h: int, w: int, c: int = 3) -> list[float]:
    """REAL image decode via Pillow: parse the payload bytes, convert
    to the requested channel count (L/RGB/RGBA), nearest-resize to the
    requested (h, w) when the encoded size differs, scale to [0,1]
    row-major HWC floats. Raises on undecodable bytes — a production
    pipeline wants the error surfaced (route through a try/filter
    stage upstream to quarantine corrupt media)."""
    from io import BytesIO

    import numpy as np
    from PIL import Image

    mode = {1: "L", 3: "RGB", 4: "RGBA"}[c]
    img = Image.open(BytesIO(payload or b"")).convert(mode)
    if img.size != (w, h):
        img = img.resize((w, h), Image.NEAREST)
    return (np.asarray(img, dtype=np.float32) / 255.0).ravel().tolist()


def default_image_decoder():
    """Pillow-backed decode when the library is present, else the
    deterministic fake — the operator is production-real the moment
    the dependency exists, with no code change."""
    return _pillow_decode if pillow_available() else _fake_decode


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    channels: int = 3,
    default_hw: tuple[int, int] = (8, 8),
    decoder=None,
) -> DataFrame:
    """Decode media payloads to flat pixel arrays (media_id, height,
    width, channels, pixels array<float>, row-major HWC).

    Arrow-batched ``mapInPandas``; height/width come from the typed
    ``meta`` struct when present (``default_hw`` otherwise). The
    ``decoder(payload, h, w, c) -> list[float]`` defaults to
    ``default_image_decoder()``: REAL Pillow decode when the library
    is importable, else the clearly-marked deterministic fake
    ``_fake_decode`` — so the schema, batching and downstream ops
    (resize, feature extraction) are identical and tested either way.
    Pass an explicit decoder (opencv, the fake for reproducible CI)
    to override detection."""
    dec = decoder or default_image_decoder()
    dh, dw = default_hw

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["meta"] if "meta" in pdf.columns else None
            hs, ws, px = [], [], []
            for i in range(len(pdf)):
                m = meta.iloc[i] if meta is not None else None
                h = int(m["height"]) if m is not None and m["height"] else dh
                w = int(m["width"]) if m is not None and m["width"] else dw
                hs.append(h)
                ws.append(w)
                px.append(dec(pdf[payload_col].iloc[i], h, w, channels))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": hs,
                    "width": ws,
                    "channels": channels,
                    "pixels": px,
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


def resize_image(
    decoded: DataFrame, out_h: int, out_w: int, *, pixels_col: str = "pixels"
) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel arrays to (out_h,
    out_w) — REAL math (numpy fancy-indexing per Arrow batch), no codec
    needed, so the full decode → resize → train-tensor path is
    exercised end to end. Output schema matches DECODED_SCHEMA with the
    new dimensions."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = []
            for i in range(len(pdf)):
                h, w, c = int(pdf["height"].iloc[i]), int(pdf["width"].iloc[i]), int(
                    pdf["channels"].iloc[i]
                )
                img = np.asarray(pdf[pixels_col].iloc[i], dtype=np.float32).reshape(
                    h, w, c
                )
                ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                res.append(img[ri][:, ci].ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": out_h,
                    "width": out_w,
                    "channels": pdf["channels"],
                    "pixels": res,
                }
            )

    return decoded.mapInPandas(batches, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    every_ms: int = 1000,
    frame_size: int = 256,
) -> DataFrame:
    """Sample frames from video payloads at ``every_ms`` intervals —
    a fan-out (1 → N rows) mapInPandas, the plan shape a real ffmpeg
    sampler has. Without codec libs the payload is treated as
    fixed-size frame chunks against the meta duration (DETERMINISTIC
    FAKE, clearly marked); swap the chunker for ffmpeg bindings in
    production — the schema, batch fan-out and timestamps stay."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for i in range(len(pdf)):
                payload = pdf[payload_col].iloc[i] or b""
                meta = pdf["meta"].iloc[i] if "meta" in pdf.columns else None
                duration = (
                    int(meta["duration_ms"]) if meta is not None and meta["duration_ms"] else 0
                )
                n_frames = max(duration // every_ms, 1) if payload else 0
                for k in range(n_frames):
                    off = (k * frame_size) % max(len(payload), 1)
                    ids.append(pdf["media_id"].iloc[i])
                    idxs.append(k)
                    tss.append(k * every_ms)
                    frames.append(bytes(payload[off : off + frame_size]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_bytes": frames,
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


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
