"""Round-12 JPEG dims ladder (VERDICT r11 task 6): the r11 ladder
fixed the image at 64x64 and varied the payload COUNT; this one fixes
the total pixel volume and varies the image SIZE (64^2 -> 512^2,
baseline and progressive), so a per-pixel regression in the entropy
loop (Huffman decode, refinement passes) surfaces as a falling MPx/s
instead of hiding inside a count-dominated scheduler floor.

Method: per rung, N payloads sized so N * size^2 ~= 4 MPx per mode;
photo-like content (the bench_image_decode texture, scaled); decode
through ``decode_image`` pinned to ``_auto_decode`` (same path the
image_decode bench extra times); repartition(16); wall = min of 2
noop-forced runs after 1 warm-up, cache cleared between rungs.
Two readings per rung, with different meanings (r12 finding):

- ``solo_us_per_px`` — warm min-of-3 decode in the driver process.
  This is the CODE-LEVEL invariant: FLAT across rungs (reference:
  baseline 1.55-1.88, progressive 1.92-2.23 us/px at 64-512); a rung
  rising materially above its neighbors here is a per-pixel
  regression at that block geometry. Adjudicate THIS column first.
- ``mpx_per_s`` — the Spark wall. At 512^2 this falls ~3x below the
  small rungs EXPECTEDLY: 15 CONCURRENT decoders churn multi-MB
  numpy temporaries and contend for memory bandwidth (reproduced
  with plain multiprocessing, no Spark: 0.74 s solo -> 2.2 s
  per-image at 15-way), plus Arrow transfer of 786k-int pixel
  arrays. A fall here that solo_us_per_px does NOT show is
  hardware-shape, not code; see PLANS.md round-12.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from demy_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def sched_probe(spark, jobs: int = 40) -> float:
    t0 = time.perf_counter()
    for _ in range(jobs):
        spark.range(10).count()
    return round((time.perf_counter() - t0) * 1000 / jobs, 1)


def photo_like(size: int) -> np.ndarray:
    x = np.linspace(0.0, 25.13, size)
    plane = (
        (np.sin(x)[:, None] * np.cos(x)[None, :] * 0.5 + 0.5) * 200.0
        + (np.arange(size)[:, None] * 31 + np.arange(size)[None, :] * 17)
        % 56
    ).clip(0, 255).astype(np.uint8)
    return np.stack(
        [plane, np.roll(plane, 3, 0), np.roll(plane, 7, 1)], axis=2
    )


def main() -> None:
    from demy_spark.jpeg import encode_jpeg, encode_progressive_jpeg
    from demy_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _auto_decode,
        decode_image,
    )

    spark = get_spark("jpeg_dims_ladder_r12", shuffle_partitions=16)
    print(f"sched_ms_per_job(start): {sched_probe(spark)}")

    target_px = 4_000_000
    for size in (64, 128, 256, 512):
        img = photo_like(size)
        n = max(8, target_px // (size * size))
        for mode, enc in (
            ("baseline", encode_jpeg),
            ("progressive", encode_progressive_jpeg),
        ):
            payload = enc(img, quality=90)
            from demy_spark.jpeg import decode_jpeg

            decode_jpeg(payload)  # warm (alloc paths, code objects)
            solo_best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                decode_jpeg(payload)
                solo_best = min(solo_best, time.perf_counter() - t0)
            solo = solo_best / (size * size) * 1e6
            rows = [
                (i, bytearray(payload), ("image/jpeg", size, size, 3000))
                for i in range(n)
            ]
            media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(16)
            out = decode_image(media, decoder=_auto_decode).groupBy().agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.col("decode_real").cast("long")).alias("real"),
            )
            spark.catalog.clearCache()
            force(out)  # warm-up
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                force(out)
                best = min(best, time.perf_counter() - t0)
            real = out.collect()[0]["real"]
            assert real == n, (size, mode, real, n)
            mpx = n * size * size / 1e6
            print(
                f"size={size:3d} mode={mode:11s} n={n:4d} "
                f"mpx={mpx:5.2f} wall={best:6.3f}s "
                f"mpx_per_s={mpx / best:6.3f} "
                f"solo_us_per_px={solo:5.2f} bytes={len(payload)}"
            )
    print(f"sched_ms_per_job(end): {sched_probe(spark)}")
    spark.stop()


if __name__ == "__main__":
    main()
