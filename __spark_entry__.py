"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory from
demy_spark.queries — 140 queries, ALL DuckDB-oracle-backed (zero
rows-only: formerly non-SQL operators are verified through seeded /
frozen-weights replay — q38 one-vs-rest serving, q46/q66 POS decode,
q47 genetic replay, q73 Platt, q76 tree spawning, q115/q116 BPE
train/encode with unrolled merge rounds). The round-7 driver window
(first 50 of queries()) leads with the never-rowed q137
(registered-domain blocklist gate), q138 (hybrid sparse+dense RRF
retrieval), q139 (metadata-filtered ANN) and q140 (token-budget
selection) plus the queries whose executing
code changed this round (q133/q136 degenerate-document oracle
alignment; the q53/q89/q95/q100/q123 IVF family over the hashed
sublist assignment), then rotates all 38 queries still resting on a
round-4 row, then the oldest round-5 rows; every
deferral is re-checked via the verify skill's full-registry driver
simulation at sf0.01 (140/140 MATCH) and the sf0.001 parity suite.
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
