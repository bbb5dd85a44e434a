"""Round-6 probe: single-pass script_profile candidates (VERDICT r5
task 4 — the regex chain is 8 sequential regexp_replace passes per row,
the heaviest pure-map op in the repo; 10x probe read 6.9x scaling).

Variants measured on documents at sf0.1, 1x and 10x replicated, with
the q130 snippet injection so non-latin branches do real work:

- regex_chain: the current implementation (one regexp_replace + length
  per script, let-bound).
- cp_fold:     split-to-chars -> codepoints -> ONE aggregate fold with
  a struct-of-8-counters accumulator (pure codegen comparisons, no
  regex, single pass).
- pandas_npy:  Arrow-batched pandas UDF — concatenate the batch's
  strings, one utf-32 decode, 8 vectorized range masks, per-row counts
  via np.add.reduceat (single pass, C speed, one Python roundtrip).

Each variant is asserted bit-identical to regex_chain on the 1x corpus
before timing. Wall = min of 3 noop-forced runs after a warm-up.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Column  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)

from demy_spark.session import get_spark  # noqa: E402
from demy_spark.io import load_table  # noqa: E402
from demy_spark.functions.textstats import SCRIPT_RANGES, script_profile  # noqa: E402
from demy_spark.functions.text import _let  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (name, [(lo, hi), ...]) — numeric codepoint intervals parsed from the
# same SCRIPT_RANGES constant the regex chain interpolates, so the
# variants cannot drift from the contract.
def _parse_ranges() -> list[tuple[str, list[tuple[int, int]]]]:
    out = []
    for name, rng in SCRIPT_RANGES:
        ivals = []
        i = 0
        while i < len(rng):
            if i + 2 < len(rng) and rng[i + 1] == "-":
                ivals.append((ord(rng[i]), ord(rng[i + 2])))
                i += 3
            else:
                ivals.append((ord(rng[i]), ord(rng[i])))
                i += 1
        out.append((name, ivals))
    return out


RANGES = _parse_ranges()


def profile_cp_fold(c: Column) -> Column:
    """One-pass codepoint fold."""

    def with_text(t0):
        t = F.coalesce(t0, F.lit(""))
        cps = F.transform(F.split(t, ""), lambda ch: F.ascii(ch))

        def in_ranges(cp, ivals):
            cond = None
            for lo, hi in ivals:
                leg = cp.between(F.lit(lo), F.lit(hi))
                cond = leg if cond is None else (cond | leg)
            return cond

        zero = F.struct(
            *[F.lit(0).cast("long").alias(f"n_{name}") for name, _ in RANGES]
        )
        folded = F.aggregate(
            cps,
            zero,
            lambda a, cp: _let(
                cp,
                lambda v: F.struct(
                    *[
                        (a[f"n_{name}"] + in_ranges(v, ivals).cast("long")).alias(
                            f"n_{name}"
                        )
                        for name, ivals in RANGES
                    ]
                ),
            ),
        )

        def with_counts(st):
            arr = F.array(*[st[f"n_{name}"] for name, _ in RANGES])
            total = F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
            best = F.array_max(arr)
            names = F.array(*[F.lit(name) for name, _ in RANGES])
            dominant = F.when(
                best > 0,
                F.get(names, F.array_position(arr, best).cast("int") - 1),
            ).otherwise(F.lit("und"))
            return F.struct(
                *[st[f"n_{name}"].alias(f"n_{name}") for name, _ in RANGES],
                total.alias("n_script_chars"),
                dominant.alias("dominant"),
            )

        return _let(folded, with_counts)

    return _let(c, with_text)


_PROFILE_SCHEMA = StructType(
    [StructField(f"n_{name}", LongType()) for name, _ in RANGES]
    + [
        StructField("n_script_chars", LongType()),
        StructField("dominant", StringType()),
    ]
)


def _profile_batch(s: pd.Series) -> pd.DataFrame:
    texts = s.fillna("")
    lens = texts.str.len().to_numpy(dtype=np.int64)
    joined = "".join(texts.tolist())
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    # utf-32 length == sum of python str lengths only when no astral
    # chars; python len() counts astral as 1 while the engine contract
    # (split(s,'') / regex) is per-codepoint too, so they agree.
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    cols = {}
    counts = []
    for name, ivals in RANGES:
        mask = np.zeros(len(cps), dtype=bool)
        for lo, hi in ivals:
            mask |= (cps >= lo) & (cps <= hi)
        per_row = np.add.reduceat(
            np.concatenate([mask.astype(np.int64), [0]]), offsets[:-1]
        )
        per_row[lens == 0] = 0
        cols[f"n_{name}"] = per_row
        counts.append(per_row)
    stacked = np.stack(counts)  # (8, n)
    cols["n_script_chars"] = stacked.sum(axis=0)
    best = stacked.max(axis=0)
    arg = stacked.argmax(axis=0)  # first max -> earlier entry wins ties
    names = np.array([name for name, _ in RANGES])
    dominant = np.where(best > 0, names[arg], "und")
    out = pd.DataFrame(cols)
    out["dominant"] = dominant
    return out


_profile_pdf = F.pandas_udf(_profile_batch, returnType=_PROFILE_SCHEMA)


def profile_pandas(c: Column) -> Column:
    return _profile_pdf(c)


def timeit(spark, label: str, mk) -> float:
    spark.catalog.clearCache()
    mk().write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f}s", flush=True)
    return best


def main() -> None:
    spark = get_spark(
        "demy_spark_probe", master="local[32]", shuffle_partitions=16
    )
    docs = load_table(spark, SF_DIR, "documents")
    snippets = {
        1: " привет мир",
        2: " 数据处理引擎",
        3: " مرحبا بالعالم",
    }
    snippet = (
        F.when(F.col("doc_id") % 4 == 1, F.lit(snippets[1]))
        .when(F.col("doc_id") % 4 == 2, F.lit(snippets[2]))
        .when(F.col("doc_id") % 4 == 3, F.lit(snippets[3]))
        .otherwise(F.lit(""))
    )
    base = docs.select(
        "doc_id", F.concat(F.col("text"), snippet).alias("text")
    ).localCheckpoint()
    reps = spark.range(10).select(F.col("id").alias("_rep_"))
    base10 = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") * 10 + F.col("_rep_"))
        .drop("_rep_")
        .localCheckpoint()
    )
    print(f"docs {base.count()} -> {base10.count()}")

    variants = {
        "regex_chain": script_profile,
        "cp_fold": profile_cp_fold,
        "pandas_npy": profile_pandas,
    }

    # parity check at 1x, bit-for-bit
    ref = None
    for name, fn in variants.items():
        got = (
            base.select("doc_id", fn(F.col("text")).alias("p"))
            .select("doc_id", "p.*")
            .orderBy("doc_id")
            .collect()
        )
        if ref is None:
            ref = got
        else:
            assert got == ref, f"{name} diverges from regex_chain"
            print(f"{name}: parity OK ({len(got)} rows)")

    for scale, d in (("1x", base), ("10x", base10)):
        for name, fn in variants.items():
            timeit(
                spark,
                f"{name} {scale}",
                lambda d=d, fn=fn: d.select(
                    "doc_id", fn(F.col("text")).alias("p")
                ).select("doc_id", "p.*"),
            )

    spark.stop()


if __name__ == "__main__":
    main()
