"""Empty-input fuzz: every oracle query replayed engine-vs-DuckDB
over ZERO-ROW tables (correct schemas, no data) — the "day with no
events" / empty-partition case every production pipeline eventually
hits. A query must either return the same (usually empty) frame as
its oracle, or be on the documented exclusion list below.

Exclusions are trainers/replays whose fixture contracts legitimately
reject an empty corpus (a loud failure is the right behavior for
"train a quantizer on nothing") plus scratch-state pipelines covered
elsewhere. Everything else — the relational surface, per-row maps,
aggregations, joins, retrieval, dedup probes — must degrade to empty
gracefully on BOTH engines.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from demy_spark import queries as Q
from tests.test_oracle_parity import TABLES, assert_query_parity

# slow lane (VERDICT r13 task 1): full-registry oracle replays — run
# with `pytest -m slow`; tests/test_slow_lane_smoke.py keeps a
# representative slice in the default lane.
pytestmark = pytest.mark.slow

# Every exclusion below is VERIFIED (each excluded query was run on
# the empty fixture and raised exactly this way — not assumed):
EXCLUDED = {
    # quantizer/codebook training raises its documented loud guard
    "q53_ivf_ann_topk": "ivf_build raises: corpus is empty",
    "q100_semdedup": "ivf_build raises: corpus is empty",
    "q123_knn_ivf": "ivf_build raises: corpus is empty",
    "q139_filtered_ann": "ivf_build raises: corpus is empty",
    "q89_pq_ann_topk": "pq_build raises: corpus is empty",
    "q95_ann_recall": "pq_build raises: corpus is empty",
    "q42_seeded_kmeans": "label-seeded centers need labelled rows (raises)",
    "q43_topic_tree_walk": "label-seeded centers need labelled rows (raises)",
    "q47_genetic_prototypes": "pool_size=64 replay contract (raises)",
    "q71_online_centers": "mini-batch updates need batches (raises)",
    # non-parquet fixture source: the empty-parquet fixture does not
    # supply its text/CSV/JSON inputs (verified: raises on read)
    "q80_source_scan": "reads text/CSV/JSON fixtures, not parquet",
    # Spark-core semantic, not an operator bug: grouping sets
    # (rollup/cube) over EMPTY input yield 0 rows in Spark, while the
    # SQL standard (and DuckDB) emit the grand-total grouping-set row
    # aggregating zero rows. Documented engine difference; the
    # operators are native rollup/cube by design.
    "q09_rollup_returns": "Spark rollup on empty input: 0 rows vs SQL's 1",
    "q10_cube_orders": "Spark cube on empty input: 0 rows vs SQL's 1",
}


def _runnable() -> list[str]:
    return sorted(n for n, q in Q.REGISTRY.items() if q.oracle and n not in EXCLUDED)


FUZZ_QUERIES = _runnable()


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory, sf_dir):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("empty_tables")
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        schema = pq.read_schema(src)
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_ddb(empty_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(empty_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_empty_tables_parity(name, spark, empty_dir, empty_ddb):
    assert_query_parity(name, spark, empty_dir, empty_ddb)
