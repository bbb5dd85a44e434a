"""Round-11 media/archive scale ladder (VERDICT r10 task 4): the r10
scale ladder covers the text/relational paths; this probe measures the
payload-count scaling of the r10/r11 media operators and the archive
count scaling of the q145 crawl path, instead of arguing linearity
from plan shape.

Method — media ops (pure-map Arrow ``mapInPandas``; the count is the
only shuffle, so the expected ladder is linear-per-payload on top of a
fixed scheduler floor):

- payload sets at N = 512 (1x) and N = 5120 (10x), ``repartition(16)``
  both so the ratio never conflates partition count with volume;
- payloads deterministic and per-index distinct in content id (the
  bytes themselves are the cached 1 s 16-bit WAV / the q150 BMFF —
  parser cost has no content-adaptive path, so byte reuse is sound);
- wall = min of 2 noop-forced runs after 1 warm-up, cache cleared
  between operators (bench.py discipline).

Method — archives (driver-side ingestion BY DESIGN, SURVEY §2.1: the
crawler spools; Spark takes over at the spool): K = 8 (1x) and K = 80
(10x) distinct archives — BCJ2 .7z, .tar.gz and .zip rotating — each
through ``crawler.download`` with a stubbed fetch; wall is the whole
ingest loop. Expected linear: each archive is independent.

Run on an idle machine; sched_ms_per_job printed for calibration.
Results land in PLANS.md with the same adjudication protocol as the
r10 ladder (no superlinear growth; steep-but-sublinear rows must be
genuine per-byte cost).
"""

from __future__ import annotations

import io
import os
import sys
import tarfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import pyspark.sql.functions as F  # noqa: E402

from demy_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def sched_probe(spark, jobs: int = 40) -> float:
    t0 = time.perf_counter()
    for _ in range(jobs):
        spark.range(10).count()
    return round((time.perf_counter() - t0) * 1000 / jobs, 1)


def media_df(spark, payload: bytes, mime: str, n: int):
    from demy_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [(i, bytearray(payload), (mime, 0, 0, 3000)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(16)


def timed(spark, build) -> float:
    spark.catalog.clearCache()
    force(build())  # warm-up
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        force(build())
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def archive_bytes(kind: str, idx: int) -> bytes:
    """Distinct-content archives per index (names and payload bytes
    vary) across the crawler's three main archive branches."""
    from test_sevenzip import X86_BLOB, make_bcj2_7z

    doc = (f"site {idx} line {{i}}\n".encode() * 1) + bytes(
        (idx * 7 + i) % 256 for i in range(4096)
    )
    if kind == "7z":
        return make_bcj2_7z(
            [(f"tool{idx}.exe", X86_BLOB), (f"notes{idx}.txt", doc)]
        )
    if kind == "tar.gz":
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            info = tarfile.TarInfo(f"data{idx}.bin")
            info.size = len(doc)
            tf.addfile(info, io.BytesIO(doc))
        return buf.getvalue()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(f"member{idx}.bin", doc)
    return buf.getvalue()


def archive_ladder(k: int, root: str) -> float:
    from demy_spark.crawler import download

    kinds = ["7z", "tar.gz", "zip"]
    jobs = []
    for i in range(k):
        kind = kinds[i % 3]
        body = archive_bytes(kind, i)
        jobs.append((f"http://m.test/site{i}/pack.{kind}", body))
    t0 = time.perf_counter()
    total_files = 0
    for i, (url, body) in enumerate(jobs):
        dest = os.path.join(root, f"k{k}_d{i}")
        paths = download(
            url, dest, fetch=lambda u, b=body: ("application/octet-stream", b)
        )
        total_files += len(paths)
    wall = time.perf_counter() - t0
    assert total_files >= k  # every archive must actually extract
    return round(wall, 3)


def main() -> None:
    import tempfile

    from demy_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
        extract_audio_features,
        extract_video_metadata,
        sample_video_frames,
    )
    from demy_spark.queries import _q150_mp4

    spark = get_spark("media_ladder_r11", master="local[32]",
                      shuffle_partitions=16)
    wav = encode_wav(
        [((i * 37) % 8192) - 4096 for i in range(16000)], 16000, 1, 2
    )
    mp4 = _q150_mp4()

    import numpy as np

    from demy_spark.jpeg import encode_progressive_jpeg
    from demy_spark.operators.multimodal import _auto_decode, decode_image
    from demy_spark.queries import _q150_fmp4

    x = np.linspace(0.0, 25.13, 64)
    plane = (
        (np.sin(x)[:, None] * np.cos(x)[None, :] * 0.5 + 0.5) * 200.0
        + (np.arange(64)[:, None] * 31 + np.arange(64)[None, :] * 17) % 56
    ).clip(0, 255).astype(np.uint8)
    prog_jpg = encode_progressive_jpeg(
        np.stack([plane, np.roll(plane, 3, 0), np.roll(plane, 7, 1)], axis=2),
        quality=90,
    )

    ops = [
        ("decode_audio", wav, "audio/wav", lambda df: decode_audio(df)),
        ("audio_features", wav, "audio/wav",
         lambda df: extract_audio_features(df)),
        ("video_metadata", mp4, "video/mp4",
         lambda df: extract_video_metadata(df)),
        ("video_sampling", mp4, "video/mp4",
         lambda df: sample_video_frames(df, every_ms=500)),
        # r11 late additions: fragmented-MP4 sampling and the
        # pure-Python progressive-JPEG decode under payload load
        ("video_sampling_fmp4", _q150_fmp4(), "video/mp4",
         lambda df: sample_video_frames(df, every_ms=500)),
        ("image_decode_prog", prog_jpg, "image/jpeg",
         lambda df: decode_image(df, decoder=_auto_decode)),
    ]
    print(f"sched_ms_per_job(start): {sched_probe(spark)}")
    print("| op | 1x=512 (s) | 10x=5120 (s) | ratio |")
    print("|---|---|---|---|")
    for name, payload, mime, op in ops:
        walls = []
        for n in (512, 5120):
            df = media_df(spark, payload, mime, n)
            walls.append(timed(spark, lambda d=df: op(d)))
        print(f"| {name} | {walls[0]} | {walls[1]} | "
              f"{round(walls[1] / max(walls[0], 1e-9), 2)} |")

    with tempfile.TemporaryDirectory(prefix="arch_ladder_") as root:
        w1 = archive_ladder(8, root)
        w10 = archive_ladder(80, root)
        print("| archive_crawl (driver-side) | "
              f"{w1} | {w10} | {round(w10 / max(w1, 1e-9), 2)} | "
              "(K=8 vs K=80)")
    print(f"sched_ms_per_job(end): {sched_probe(spark)}")
    spark.stop()


if __name__ == "__main__":
    main()
