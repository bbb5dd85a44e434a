"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory from
demy_spark.queries — 152 queries, ALL DuckDB-oracle-backed (zero
rows-only: formerly non-SQL operators are verified through seeded /
frozen-weights replay — q38 one-vs-rest serving, q46/q66 POS decode,
q47 genetic replay, q73 Platt, q76 tree spawning, q115/q116 BPE
train/encode with unrolled merge rounds). The round-11 driver window
(first 50 of queries()) is EXACTLY the 50 queries whose latest
official row is r8 — the cohort whose retirement closes the 3-round
freshness rotation (scripts/freshness.py; arithmetic note at
_DRIVER_PRIORITY). Zero new registrations this round: the r11
behavior deltas (q145 +zst rows, q146 +progressive-JPEG rows, q148
+AVI/Matroska/WebM rows, q150 +fragmented-MP4 rows) extend
already-rowed queries and are re-verified via the verify skill's
full-registry driver simulation at sf0.01 (152/152 MATCH) and the
sf0.001 parity suite.
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
