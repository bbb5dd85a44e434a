"""Round-7 probe: registered_domain at production PSL width.

The operator ships its rule dict in the UDF closure and claims the
full published list (~10k rules) stays dictionary-sized. This probe
times the q131-style rollup over sf0.1 hosts with the 14-rule sample
vs a synthetic ~10k-rule set (the sample plus generated exact /
wildcard / exception rules across synthetic TLD families — same kind
mix as the real list), and checks the match loop's per-host cost is
label-count-bound, not rule-count-bound (dict lookups).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from demy_spark.functions.domains import PSL_SAMPLE_RULES, registered_domain  # noqa: E402
from demy_spark.io import load_table  # noqa: E402
from demy_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def wide_rules(n: int = 10_000) -> tuple[str, ...]:
    out = dict.fromkeys(PSL_SAMPLE_RULES)
    i = 0
    while len(out) < n:
        fam = f"t{i % 500}"
        kind = i % 10
        if kind < 7:
            out[f"sub{i}.{fam}"] = None  # unique multi-label exact
        elif kind < 9:
            out[f"*.w{i}.{fam}"] = None
        else:
            out[f"!keep.w{i}.{fam}"] = None
        i += 1
    return tuple(out)[:n]


def main() -> None:
    spark = get_spark(
        "psl_width_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=16,
    )
    docs = load_table(spark, SF_DIR, "documents")
    host = F.concat(F.lit("www."), F.col("source"), F.lit(".com"))

    def run(rules, label):
        frame = docs.select(
            registered_domain(host, rules)["registered_domain"].alias("rd")
        ).groupBy("rd").count()
        frame.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            frame.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:12s} rules={len(rules):6d}  wall={best:.3f}s")
        return best

    a = run(PSL_SAMPLE_RULES, "sample")
    b = run(wide_rules(10_000), "production")
    print(
        f"width penalty 14 -> 10k rules: {b / a:.2f}x "
        f"(dict lookups are O(host labels), not O(rules))"
    )
    spark.stop()


if __name__ == "__main__":
    main()
