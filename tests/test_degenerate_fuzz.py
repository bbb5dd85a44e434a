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


@pytest.fixture(scope="module")
def fuzz_docs_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # (doc_id, text, lang, source) — degenerate text first
        (1, "", "en", "src1"),
        (2, "   ", "en", "src2"),
        (3, None, "fr", "src3"),
        (4, "x", "en", "src1"),
        (5, " ", "de", "src2"),  # NBSP-only (the Zs trim edge)
        (6, "\U0001f600 astral \U0001f600 astral chars", "en", "src3"),
        # normal rows so group-bys / samples / indexes have material
        (7, "the quick brown fox jumps over the lazy dog near the barn", "en", "src1"),
        (8, "spark query engines shuffle columnar partitions across nodes", "en", "src2"),
        (9, "the quick brown fox jumps over the lazy dog near the barn", "en", "src3"),
        (10, "hash join table window agg stream slow scan filter vector", "en", "src1"),
        (24, "one two three four five six seven eight nine ten", "en", "src2"),
        (31, "lorem ipsum dolor sit amet consectetur adipiscing elit", "en", "src3"),
        (97, "customer order line part shipment invoice ledger account", "en", "src1"),
        (194, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src2"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else 0 for r in rows], pa.int64()
            ),
        }
    )
    d = tmp_path_factory.mktemp("fuzz_docs")
    pq.write_table(tbl, str(d / "documents.parquet"))
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
