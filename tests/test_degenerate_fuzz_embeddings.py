"""Degenerate-embedding oracle fuzz — the vector-family companion of
test_degenerate_fuzz.py: every registry query whose oracle reads ONLY
the embeddings table replays engine-vs-oracle over a fixture with
pathological vectors: the ZERO vector (the NaN-guard case the oracle
contract calls out — DuckDB sorts NaN above every number, so an
unguarded zero-norm cosine silently passes on one side only), exact
duplicate vectors (collapsed IVF lists), near-duplicates, and
negatives.

Fixture contract: all 10 labels present (tree/centroid operators seed
per label), dim 64 like the sf fixtures (q38's frozen one-vs-rest
weights and q89's PQ subspaces are dim-64 constants), >= 64 vectors
(q47's genetic replay pins pool_size=64), vectors non-NULL (vector
nullability is a documented operator precondition; a NULL embedding
is an ingest bug, not a query-time state).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from demy_spark import queries as Q
from tests.test_oracle_parity import (
    _rows,
    assert_query_parity,
    oracle_queries_touching_only,
)

EXCLUDED: dict[str, str] = {}


FUZZ_QUERIES = oracle_queries_touching_only("embeddings", EXCLUDED)

# slow lane (VERDICT r13 task 1): full-registry oracle replays — run
# with `pytest -m slow`; tests/test_slow_lane_smoke.py keeps a
# representative slice in the default lane.
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def fuzz_emb_dir(tmp_path_factory):
    from tests.degenerate_fixtures import write_embeddings

    d = tmp_path_factory.mktemp("fuzz_emb")
    write_embeddings(str(d))
    return str(d)


@pytest.fixture(scope="module")
def fuzz_emb_ddb(fuzz_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(fuzz_emb_dir, 'embeddings.parquet')}')"
    )
    return con


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_degenerate_embedding_fuzz_parity(name, spark, fuzz_emb_dir, fuzz_emb_ddb):
    assert_query_parity(name, spark, fuzz_emb_dir, fuzz_emb_ddb)


def test_q138_degenerate_embeddings_parity(spark, fuzz_emb_dir, sf_dir):
    """q138 references BOTH documents and embeddings, so it escapes
    the single-table auto-discovery of this module and the documents
    one — replay it explicitly with the degenerate embeddings (zero
    vectors in the dense list) plus the real documents table
    (code-review r7 finding: the dense CTE lacked the zero-norm
    guard)."""
    import shutil

    q = Q.REGISTRY["q138_hybrid_rrf"]
    docs = os.path.join(fuzz_emb_dir, "documents.parquet")
    if not os.path.exists(docs):
        shutil.copyfile(os.path.join(sf_dir, "documents.parquet"), docs)
    spark_pdf = q.fn(spark, fuzz_emb_dir).toPandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(fuzz_emb_dir, t + '.parquet')}')"
        )
    duck_pdf = con.execute(q.oracle).fetchdf()
    s_rows, d_rows = _rows(spark_pdf), _rows(duck_pdf)
    assert len(s_rows) == len(d_rows)
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"first mismatches {mismatches[:3]}"
