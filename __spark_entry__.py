"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory from
demy_spark.queries — 152 queries, ALL DuckDB-oracle-backed (zero
rows-only: formerly non-SQL operators are verified through seeded /
frozen-weights replay — q38 one-vs-rest serving, q46/q66 POS decode,
q47 genetic replay, q73 Platt, q76 tree spawning, q115/q116 BPE
train/encode with unrolled merge rounds). The round-13 driver window
(first 50 of queries()) is q99_dsir_select (the budgeted r12 slip),
48 of the 50 r10-resting queries, and the one r13 registration
q152_supplier_pagerank (integer fixed-point PageRank — a never-rowed
registration must sit in-window); q96_line_dedup and
q97_duplicated_spans carry to lead the r14 window (arithmetic note
at _DRIVER_PRIORITY; scripts/freshness.py names the carries). The
full registry is re-verified each round via the verify skill's
driver simulation at sf0.01 (152/152 MATCH) and the sf0.001 parity
suite.
COVERAGE.md maps each SURVEY §2 inventory row to its query and
test."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demy_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q02_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
