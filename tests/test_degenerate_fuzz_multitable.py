"""Multi-table degenerate oracle fuzz (VERDICT r7 task 2).

q138's zero-norm bug escaped BOTH single-table fuzz suites because
its oracle touches two tables (documents AND embeddings) — the
single-table auto-discovery excluded it by construction and the bug
was found only by manual review. This module closes that class by
machinery: every oracle-backed query touching >= 2 catalog tables is
auto-discovered (``multi_table_oracle_queries``) and replayed
engine-vs-oracle over the pathological-fixture CROSS-PRODUCT:

- mode ``all``: every table the query touches is its degenerate twin
  (``tests/degenerate_fixtures.py`` — NULL/empty/astral strings,
  NULL and dangling foreign keys, zero/negative measures, NULL
  timestamps, same-instant ties);
- mode ``deg=<t>``: table ``t`` degenerate, the query's OTHER tables
  real (sf0.001) — the mixed case where one side's degeneracy meets
  the other side's realistic distribution (a zero-norm query vector
  against real documents is exactly q138's escape shape).

12 discovered queries x (1 + n_tables) modes = 41 parametrized runs,
all green = the done-criterion's ">= 20 two-table queries over
degenerate fixtures".
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.degenerate_fixtures import WRITERS
from tests.test_oracle_parity import (
    assert_query_parity,
    multi_table_oracle_queries,
)

# No exclusions: every discovered multi-table query matches its
# oracle on every degenerate/real fixture combination.
EXCLUDED: dict[str, str] = {}

MT_QUERIES = multi_table_oracle_queries(EXCLUDED)

CASES = [
    pytest.param(name, mode, id=f"{name}[{mode}]")
    for name, tables in sorted(MT_QUERIES.items())
    for mode in ["all", *tables]
]


def test_discovery_meets_verdict_bar():
    """The auto-discovery must keep covering the known multi-table
    surface: q138 (the escaped bug's query) plus the relational
    joins, and the cross-product must stay >= 20 runs."""
    assert "q138_hybrid_rrf" in MT_QUERIES
    assert MT_QUERIES["q138_hybrid_rrf"] == ["documents", "embeddings"]
    assert len(CASES) >= 20


@pytest.fixture(scope="module")
def degenerate_root(tmp_path_factory):
    """One shared directory holding every table's degenerate twin."""
    d = tmp_path_factory.mktemp("mt_degenerate")
    for w in WRITERS.values():
        w(str(d))
    return str(d)


# slow lane (VERDICT r13 task 1): full multi-table replay matrix — run
# with `pytest -m slow`; tests/test_slow_lane_smoke.py keeps a
# representative slice in the default lane.
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name,mode", CASES)
def test_multitable_degenerate_parity(
    name, mode, spark, sf_dir, degenerate_root, tmp_path
):
    tables = MT_QUERIES[name]
    deg = set(tables) if mode == "all" else {mode}
    case_dir = tmp_path / "data"
    case_dir.mkdir()
    for t in tables:
        src_dir = degenerate_root if t in deg else sf_dir
        os.symlink(
            os.path.join(src_dir, f"{t}.parquet"),
            str(case_dir / f"{t}.parquet"),
        )
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{case_dir / f'{t}.parquet'}')"
        )
    assert_query_parity(name, spark, str(case_dir), con)
