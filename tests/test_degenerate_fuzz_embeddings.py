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

DIM = 64


def _vec(seed: int) -> list[float]:
    # deterministic non-trivial vector, no RNG
    return [float(((seed * 31 + d * 7) % 11) - 5) for d in range(DIM)]


@pytest.fixture(scope="module")
def fuzz_emb_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    # degenerate head: zero vector, duplicates of it, near-duplicate,
    # all-negative, tiny-magnitude
    rows.append((0, [0.0] * DIM, 0))              # THE zero vector
    rows.append((1, [0.0] * DIM, 1))              # duplicate zero vector
    rows.append((2, _vec(2), 2))
    rows.append((3, _vec(2), 3))                  # exact dup of 2, other label
    near = _vec(2)
    near[0] += 0.25
    rows.append((4, near, 4))                     # near-dup of 2
    rows.append((5, [-x for x in _vec(2)], 5))    # opposite of 2
    rows.append((6, [1e-9] * DIM, 6))             # tiny magnitude
    # normal tail: 6 per label — every label-seeded operator has mass
    # and the total (67) clears q47's pool_size=64 replay contract
    i = 7
    for lab in range(10):
        for _ in range(6):
            rows.append((i, _vec(i), lab))
            i += 1
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    d = tmp_path_factory.mktemp("fuzz_emb")
    pq.write_table(tbl, str(d / "embeddings.parquet"))
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
