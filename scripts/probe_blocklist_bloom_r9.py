"""Round-9 probe: blocklist_gate strategy='bloom' at UT1 width
(VERDICT r8 task 3 done-criterion).

Extends the r8 width probe with the now-real bloom strategy at 1M and
4M domains (the real UT1 adult list is ~4M): broadcast (forced hint)
vs shuffle (Catalyst/AQE) vs bloom (split-block filter, one broadcast
join + JVM bit tests per corpus leg, survivors-only exact join). The
corpus is a written-once local parquet with a ~380-byte
low-compressibility payload and a MATERIALIZED reg_domain column (the
q131 shape), and every pass noop-writes the FULL annotated output —
a count() would let Catalyst prune the payload out of the join and
hide exactly the data movement that separates the strategies. Wall
is min of 2 after one warm-up; the bloom block-frame build is inside
the timing, like a real per-batch run. Table + adjudication in
PLANS.md round-9.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from demy_spark.functions.domains import blocklist_gate  # noqa: E402
from demy_spark.queries import _Q137_BLOCKLIST  # noqa: E402
from demy_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synth_blocklist(spark, n: int):
    base = spark.createDataFrame(
        list(_Q137_BLOCKLIST), "domain string, category string"
    )
    filler = spark.range(n - 9).select(
        F.concat(F.lit("blk"), F.col("id"), F.lit(".com")).alias("domain"),
        F.element_at(
            F.array(F.lit("ads"), F.lit("adult"), F.lit("malware")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("category"),
    )
    dup = filler.where(F.col("domain").substr(4, 1) == "1").withColumn(
        "category", F.lit("redirector")
    )
    return base.unionByName(filler).unionByName(dup)


def synth_corpus(spark, n: int, n_domains: int):
    """n documents, ~1% on listed domains (with subdomain depth so the
    PSL extraction works), the rest on never-listed hosts, each with a
    ~380-byte pseudo-random payload (md5 chain — low compressibility,
    so the shuffle leg pays real IO like a document column would) —
    the UT1-against-a-crawl shape where the corpus dwarfs the list."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 100 == 0,
            F.concat(
                F.lit("www.blk"),
                F.col("id") % (n_domains - 9),
                F.lit(".com"),
            ),
        )
        .otherwise(F.concat(F.lit("h"), F.col("id"), F.lit(".example.org")))
        .alias("host"),
        # the registered domain MATERIALIZED upstream (the q131 shape —
        # real pipelines run the PSL extraction once and reuse it); the
        # gate probe then measures join strategy, not PSL recompute
        F.when(
            F.col("id") % 100 == 0,
            F.concat(F.lit("blk"), F.col("id") % (n_domains - 9), F.lit(".com")),
        )
        .otherwise(F.concat(F.lit("h"), F.col("id"), F.lit(".example.org")))
        .alias("reg_domain"),
        F.concat(
            *[F.md5((F.col("id") * 12 + i).cast("string")) for i in range(12)]
        ).alias("text"),
    )


def main() -> None:
    import tempfile

    spark = get_spark(app_name="probe-blocklist-bloom-r9")
    corpus_n = int(os.environ.get("PROBE_CORPUS_N", "20000000"))
    # written once to LOCAL parquet and scanned per pass — the shape a
    # real gate sees (columnar scans are the cheap thing the bloom
    # strategy spends twice; a deserialized MEMORY_ONLY cache of 20M
    # wide rows both OOMs the 8g driver JVM and flatters scans)
    corpus_dir = os.path.join(
        tempfile.gettempdir(), f"probe_bloom_corpus_{corpus_n}"
    )
    if not os.path.exists(corpus_dir):
        synth_corpus(spark, corpus_n, 4_000_000).repartition(32).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir)
    print(f"corpus: parquet n={corpus_n} (~1% listed) at {corpus_dir}")
    print(f"{'n_domains':>10} {'mode':>10} {'wall_s':>8}")
    for n in (1_000_000, 4_000_000):
        bl = synth_blocklist(spark, n)
        bl.persist().count()
        modes = [
            ("broadcast", dict(strategy="broadcast")),
            ("shuffle", dict(strategy="shuffle")),
            # m sized for ~4M keys at k=7: 2^26 bits = 8 MiB words array
            ("bloom", dict(strategy="bloom", bloom_m_bits=1 << 26)),
        ]
        for mode, kw in modes:
            mk = lambda: blocklist_gate(  # noqa: B023,E731
                docs, "host", bl, reg_domain_col="reg_domain", **kw
            )
            # noop-write the FULL annotated output: a count() would let
            # Catalyst prune the payload out of the join, hiding the
            # very cost that separates the strategies at corpus scale
            force = lambda df: df.write.format("noop").mode(  # noqa: B023,E731
                "overwrite"
            ).save()
            force(mk())  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                force(mk())
                best = min(best, time.monotonic() - t0)
            got = mk().where(~F.col("keep")).count()
            print(f"{n:>10} {mode:>10} {best:>8.3f}  blocked={got}")
        bl.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
