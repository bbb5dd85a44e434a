"""Round-8 probe: blocklist_gate at UT1 widths (VERDICT r7 task 5).

q137 pins the gate's broadcast plan, but the round-7 probe evidence
was the PSL side only. This measures the gate itself over sf0.1
documents as the blocklist widens from the 9-row fixture to 10k /
100k / 1M synthetic domains (the real UT1 adult list is ~4M), with
``broadcast=True`` (forced hint, the default) vs ``broadcast=False``
(Catalyst/AQE decides — a plain shuffle join once past the
autoBroadcast threshold). Wall time is count()-forced, warm session,
min of 2 after one warm-up at each point. The docstring threshold in
functions/domains.py quotes this table (copied into PLANS.md).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from demy_spark.functions.domains import blocklist_gate  # noqa: E402
from demy_spark.io import load_table  # noqa: E402
from demy_spark.queries import _Q137_BLOCKLIST, _q131_host  # noqa: E402
from demy_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synth_blocklist(spark, n: int):
    """9 fixture entries (real matches) + n-9 never-matching domains,
    25% of them with a duplicate second category so the dedup agg has
    work, like real UT1 multi-listing."""
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


def main() -> None:
    spark = get_spark(app_name="probe-blocklist-width-r8")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", _q131_host().alias("host")
    )
    docs.persist().count()  # isolate the gate from scan cost
    print(f"fixture: {SF_DIR} documents={docs.count()}")
    header = f"{'n_domains':>10} {'mode':>10} {'wall_s':>8} {'plan':>14}"
    print(header)
    for n in (10_000, 100_000, 1_000_000):
        bl = synth_blocklist(spark, n)
        bl.persist().count()
        for mode, bcast in (("broadcast", True), ("shuffle", False)):
            mk = lambda: blocklist_gate(docs, "host", bl, broadcast=bcast)
            plan = mk()._jdf.queryExecution().executedPlan().toString()
            kind = (
                "BHJ"
                if "BroadcastHashJoin" in plan
                else ("SMJ" if "SortMergeJoin" in plan else "other")
            )
            mk().count()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                got = mk().where(~F.col("keep")).count()
                best = min(best, time.monotonic() - t0)
            print(f"{n:>10} {mode:>10} {best:>8.3f} {kind:>14}  blocked={got}")
        bl.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
