"""Degenerate-document oracle fuzz: every registry query whose oracle
reads ONLY the documents table replays engine-vs-oracle over a tiny
fixture of pathological documents (empty text, whitespace-only text,
NULL text, single token, astral chars) plus a few normal rows.

Both round-6 ADVICE oracle divergences (q133 zero-token floor, q136
NULL-text cuts) were exactly this class — latent only because the sf
fixtures carry no degenerate text. This module makes the whole class
regression-tested instead of whack-a-mole.

Queries are auto-discovered from the registry (new documents-only
queries join the fuzz automatically); the few excluded ones carry a
documented reason each.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from demy_spark import queries as Q
from tests.test_oracle_parity import assert_query_parity, oracle_queries_touching_only

# No exclusions: the driver-iterative trainers (BPE/phrase merges)
# and scratch-writing pipelines (incremental index, ORC, snapshots)
# were verified to handle the degenerate corpus gracefully AND match
# their oracles on it — scratch lands under the tmp fixture dir.
EXCLUDED: dict[str, str] = {}


FUZZ_QUERIES = oracle_queries_touching_only("documents", EXCLUDED)

# slow lane (VERDICT r13 task 1): full-registry oracle replays — run
# with `pytest -m slow`; tests/test_slow_lane_smoke.py keeps a
# representative slice in the default lane.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fuzz_docs_dir(tmp_path_factory):
    from tests.degenerate_fixtures import write_documents

    d = tmp_path_factory.mktemp("fuzz_docs")
    write_documents(str(d))
    return str(d)


@pytest.fixture(scope="module")
def fuzz_ddb(fuzz_docs_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(fuzz_docs_dir, 'documents.parquet')}')"
    )
    return con


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_degenerate_fuzz_parity(name, spark, fuzz_docs_dir, fuzz_ddb):
    assert_query_parity(name, spark, fuzz_docs_dir, fuzz_ddb)
