"""Default-lane smoke slice of the slow-lane families (VERDICT r13
task 1). The full-registry replay matrices (multi-split parity,
empty-table fuzz, degenerate fuzz) moved to the ``slow`` mark so the
driver's verify window fits; this module keeps ONE representative
parity case per family in the default lane, so a broken fixture
builder, harness import, or gross oracle regression still fails fast
without paying for the full matrix.

Representatives are deliberately cheap AND meaningful:
- multisplit: q01 (money quantization under partial-agg reorder) and
  q18 (hash dedup — file-layout independence).
- empty tables: q01 and q117 (retrieval stats over zero docs — the
  exact branch the r14 bm25 restructure touched).
- degenerate documents: q117 (the NULL-business-key doc caught a real
  N-divergence during r14) and q92 (the historical zero-token class).

Full matrices: ``pytest tests/ -q -m slow``.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.test_oracle_parity import TABLES, assert_query_parity
from tests.test_multisplit_parity import build_multisplit_dir


@pytest.fixture(scope="module")
def smoke_multisplit(tmp_path_factory, sf_dir):
    d = build_multisplit_dir(tmp_path_factory.mktemp("smoke_ms"), sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        dirp = os.path.join(d, f"{t}.parquet")
        if os.path.isdir(dirp):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{os.path.join(dirp, '*.parquet')}')"
            )
    return d, con


@pytest.mark.parametrize("name", ["q01_pricing_summary", "q18_exact_dedup"])
def test_multisplit_smoke(name, spark, smoke_multisplit):
    d, con = smoke_multisplit
    assert_query_parity(name, spark, d, con)


@pytest.fixture(scope="module")
def smoke_empty(tmp_path_factory, sf_dir):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("smoke_empty")
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        schema = pq.read_schema(src)
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{d / (t + '.parquet')}')"
        )
    return str(d), con


@pytest.mark.parametrize("name", ["q01_pricing_summary", "q117_bm25_search"])
def test_empty_tables_smoke(name, spark, smoke_empty):
    d, con = smoke_empty
    assert_query_parity(name, spark, d, con)


@pytest.fixture(scope="module")
def smoke_degenerate(tmp_path_factory):
    from tests.degenerate_fixtures import write_documents

    d = tmp_path_factory.mktemp("smoke_degen")
    write_documents(str(d))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(str(d), 'documents.parquet')}')"
    )
    return str(d), con


@pytest.mark.parametrize("name", ["q117_bm25_search", "q92_gopher_rules"])
def test_degenerate_docs_smoke(name, spark, smoke_degenerate):
    d, con = smoke_degenerate
    assert_query_parity(name, spark, d, con)
