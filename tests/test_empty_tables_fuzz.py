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

EXCLUDED = {
    # trainers/replays with explicit corpus-shape contracts: loud
    # failure on an empty corpus is the documented behavior
    "q42_seeded_kmeans": "Lloyd seeding from labelled rows needs rows",
    "q47_genetic_prototypes": "pool_size=64 replay contract (raises)",
    "q53_ivf_ann_topk": "quantizer training needs vectors (seed means)",
    "q89_pq_ann_topk": "PQ codebook training needs vectors",
    "q95_ann_recall": "trains the q53/q89 quantizers",
    "q100_semdedup": "derived_n_lists over an empty corpus",
    "q123_knn_ivf": "IVF routing over a trained quantizer",
    "q139_filtered_ann": "IVF quantizer training needs vectors",
    "q71_online_centers": "mini-batch center updates need batches",
    "q76_tree_spawn": "spawn gates read routed mass",
    "q69_center_hierarchy": "hierarchy from per-center stats",
    "q43_topic_tree_walk": "tree centers seeded from labelled rows",
    "q22_label_centroids": "centroids of an empty frame",
    "q37_embed_apply": "fits Word2Vec on the corpus first",
    "q74_embed_options": "same Word2Vec fit",
    "q82_analogy_score": "analogy pairs from fitted vectors",
    "q38_one_vs_rest": "scores against per-label calibration rows",
    "q35_oof_mean_model": "out-of-fold means need folds with rows",
    "q34_threshold_sweep": "ROC sweep over scored rows",
    "q54_binary_metrics": "same scored-rows contract",
    "q47": "dup-guard",
    "q70_span_detect": "span scorer calibrates on scored tokens",
    "q73_platt_calibration": "Platt Newton iterations need points",
    "q115_bpe_train": "BPE merge rounds need a vocabulary",
    "q116_bpe_encode": "replays q115's training",
    "q104_phrase_merges": "phrase merge rounds need bigram counts",
    "q113_bpe_apply": "applies q115-style merges",
    "q47_genetic": "dup-guard",
    "q60_stratified_sample": "per-stratum rates from observed strata",
    "q88_mixture_sample": "apportionment over observed source masses",
    "q99_dsir_select": "importance ratios need target/raw masses",
    "q98_lm_quality": "bigram LM trains on the corpus",
    "q106_distinctive_terms": "log-odds need corpus masses",
    "q101_incremental_dedup": "stored-index scratch pipeline",
    "q110_incremental_pipeline": "stored-index scratch pipeline",
    "q118_orc_roundtrip": "write-side scratch pipeline",
    "q93_curation_pipeline": "multi-stage snapshot pipeline",
    "q79_pipeline_grid": "orchestrator grid with snapshots",
    "q75_shapefile_flatten": "reads a shapefile fixture, not parquet",
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
