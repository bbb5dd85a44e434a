"""Unit tests for dedup + similarity operators on synthetic corpora
with planted duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from demy_spark.operators.dedup import (
    assign_clusters,
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from demy_spark.operators.similarity import (
    cosine_topk,
    ivf_build,
    ivf_cosine_topk,
    lsh_cosine_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "in the warm sun near the old barn door waiting for dinner time"
)
NEAR = BASE.replace("lazy", "sleepy").replace("warm", "hot")
OTHER = (
    "completely different content about spark query engines and columnar "
    "execution with vectorized readers shuffling partitions across nodes"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE),                      # exact dup of 1
            (3, "  " + BASE.upper() + " "), # normalized dup of 1
            (4, NEAR),                      # near dup of 1
            (5, OTHER),
            (6, OTHER + " extra tail words here"),  # near dup of 5
        ],
        ["doc_id", "text"],
    )


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 4, 5, 6]  # 2 and 3 collapse into 1


def test_minhash_lsh_finds_near_dups(spark):
    pairs = minhash_lsh_dedup(
        _docs(spark), "text", "doc_id", jaccard_threshold=0.5
    )
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got  # exact dups always collide
    assert (1, 4) in got                    # near dup above threshold
    assert not any(a in (1, 2, 3, 4) and b in (5, 6) for a, b in got)


def test_minhash_jaccard_is_exact(spark):
    pairs = minhash_lsh_dedup(_docs(spark), "text", "doc_id", jaccard_threshold=0.9)
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert exact[(1, 2)] == 1.0  # identical docs → jaccard exactly 1


def test_simhash_dedup(spark):
    pairs = simhash_dedup(_docs(spark), "text", "doc_id", max_hamming=6)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got
    assert not any(a in (1, 2, 3) and b == 5 for a, b in got)


def test_ngram_jaccard_pairs(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), "text", "doc_id", threshold=0.3)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (5, 6) in got


def test_assign_clusters(spark):
    docs = _docs(spark)
    pairs = minhash_lsh_dedup(docs, "text", "doc_id", jaccard_threshold=0.5)
    clusters = assign_clusters(pairs, docs.select("doc_id"), "doc_id")
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert got[5] == 5


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.2, 0.0]),   # near 2
        (4, [0.0, 0.0, 0.0, 1.0]),
        (5, [-1.0, 0.0, 0.0, 0.0]),   # opposite of 0
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact(spark):
    vecs = _vecs(spark)
    out = cosine_topk(vecs, vecs.where(F.col("vec_id") == 0), "embedding", "vec_id", k=2)
    rows = sorted(out.collect(), key=lambda r: r["rk"])
    assert [r["neighbor_id"] for r in rows] == [1, 2]
    assert rows[0]["sim"] > 0.99


def test_lsh_topk_same_bucket_recall(spark):
    vecs = _vecs(spark)
    out = lsh_cosine_topk(
        vecs, vecs.where(F.col("vec_id") == 0), "embedding", "vec_id",
        k=2, num_planes=2,
    )
    rows = sorted(out.collect(), key=lambda r: r["rk"])
    # with 2 planes (4 buckets), the near-identical vector must land
    # in the same bucket as the query and rank first
    assert rows and rows[0]["neighbor_id"] == 1


def test_ivf_topk_probes_nearest_lists(spark):
    vecs = _vecs(spark)
    out = ivf_cosine_topk(
        vecs, vecs.where(F.col("vec_id") == 0), "embedding", "vec_id",
        k=2, n_lists=3, nprobe=2, train_iters=2,
    )
    rows = sorted(out.collect(), key=lambda r: r["rk"])
    # the near-identical vector must be recalled and rank first
    assert rows and rows[0]["neighbor_id"] == 1 and rows[0]["sim"] > 0.99


def test_ivf_build_reusable_index(spark):
    vecs = _vecs(spark)
    index = ivf_build(vecs, "embedding", "vec_id", n_lists=2, train_iters=1)
    centers, assigned = index
    assert len(centers) == 2 and assigned.count() == 6
    out = ivf_cosine_topk(
        vecs, vecs.where(F.col("vec_id") == 2), "embedding", "vec_id",
        k=1, nprobe=1, index=index,
    )
    rows = out.collect()
    assert rows and rows[0]["neighbor_id"] == 3  # nearest stays in-list


def test_ivf_build_hot_list_split_bounds_sizes(spark):
    """Collapsed-duplicate skew mitigation (VERDICT r5 task 3): a
    degenerate corpus (many exact copies) collapses Lloyd lists; the
    default max_list_factor cap must split every list back under
    ceil(factor * n / n_lists), keep every id exactly once, and append
    one mean sub-centroid per extra sublist."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(180)]
    rows += [
        (200 + i, [float((i * 7) % 5 - 2), float((i * 3) % 7 - 3), float(i % 4), 1.0])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers, assigned = ivf_build(
        df, "embedding", "vec_id", n_lists=8, train_iters=3, max_list_factor=4.0
    )
    sizes = {r["cluster"]: r["count"] for r in assigned.groupBy("cluster").count().collect()}
    bound = -(-4 * 240 // 8)
    assert max(sizes.values()) <= bound
    assert sum(sizes.values()) == 240
    assert assigned.select("vec_id").distinct().count() == 240
    # codebook grew by the number of extra sublists, all referenced
    assert len(centers) > 8
    assert set(sizes) <= set(range(len(centers)))


def test_ivf_hot_list_split_hashes_ids(spark):
    """Sublist membership hashes the id (ADVICE r6): raw ``id % s``
    silently skipped non-numeric ids (NULL cast -> no split) and left
    residue-skewed integers unbalanced (all-even ids with s=2 landed
    in one sublist). Both corpora here collapse onto one duplicate
    vector; the split must still spread them."""
    from demy_spark.operators.similarity import ivf_build

    for rows, schema in [
        # all-even ids: the worst residue skew for a raw modulus
        ([(2 * i, [1.0, 2.0, 3.0, 4.0]) for i in range(160)]
         + [(2 * i, [float(i % 5), float(i % 7), 1.0, 0.0])
            for i in range(160, 200)],
         "vec_id long, embedding array<double>"),
        # string ids: a raw long cast is NULL -> split never fired
        ([(f"doc-{i}", [1.0, 2.0, 3.0, 4.0]) for i in range(160)]
         + [(f"doc-{i}", [float(i % 5), float(i % 7), 1.0, 0.0])
            for i in range(160, 200)],
         "vec_id string, embedding array<double>"),
    ]:
        df = spark.createDataFrame(rows, schema)
        _, assigned = ivf_build(
            df, "embedding", "vec_id", n_lists=8, train_iters=2,
            max_list_factor=2.0,
        )
        sizes = [r["count"] for r in assigned.groupBy("cluster").count().collect()]
        bound = -(-2 * 200 // 8)  # ceil(factor * n / n_lists) = 50
        # binomial spread, not exact halves: allow a small overshoot
        # but fail loudly on the old behaviors (a 160-row list)
        assert sum(sizes) == 200
        assert max(sizes) <= bound + 10, sizes


def test_ivf_build_cap_is_noop_on_balanced_corpus(spark):
    """The cap must be bit-invisible when no list exceeds the bound —
    the oracle-pinned queries (q53/q89/q123) rely on this at fixture
    scale (measured max/avg ~1.07 vs the 4.0 default)."""
    rows = [
        (i, [float((i * 7) % 5 - 2), float((i * 3) % 7 - 3), float(i % 4), float(i % 3)])
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c_u, a_u = ivf_build(df, "embedding", "vec_id", n_lists=8, max_list_factor=None)
    c_c, a_c = ivf_build(df, "embedding", "vec_id", n_lists=8, max_list_factor=4.0)
    assert c_u == c_c
    assert sorted(map(tuple, a_u.collect())) == sorted(map(tuple, a_c.collect()))


def test_embedding_cosine_pairs(spark):
    vecs = _vecs(spark)
    pairs = embedding_cosine_pairs(
        vecs, "embedding", "vec_id", threshold=0.9, num_planes=2
    )
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 5) not in got  # opposite vectors never pass the verify


def test_pq_build_codes_shape(spark):
    from demy_spark.operators.similarity import pq_adc_topk, pq_build

    vecs = _vecs(spark)
    codebook, codes = pq_build(vecs, "embedding", "vec_id", m=2, ksub=2)
    # every vector gets exactly one code per subspace
    per_vec = {r["vec_id"]: r["n"] for r in
               codes.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_vec == {i: 2 for i in range(6)}
    # codebook is dictionary-sized: <= m * ksub * dsub rows
    assert codebook.count() <= 2 * 2 * 2
    # build is deterministic
    c2, k2 = pq_build(vecs, "embedding", "vec_id", m=2, ksub=2)
    assert sorted(map(tuple, codes.collect())) == sorted(map(tuple, k2.collect()))


def test_pq_adc_recalls_near_neighbor(spark):
    from demy_spark.operators.similarity import pq_adc_topk, pq_build

    vecs = _vecs(spark)
    codebook, codes = pq_build(vecs, "embedding", "vec_id", m=2, ksub=3)
    out = pq_adc_topk(
        codebook, codes, vecs.where(F.col("vec_id") == 0),
        "embedding", "vec_id", k=2,
    )
    rows = sorted(out.collect(), key=lambda r: r["rk"])
    assert rows and rows[0]["neighbor_id"] == 1  # the planted near-dup of 0
    assert all(r["query_id"] == 0 and r["neighbor_id"] != 0 for r in rows)
    # distances ascend with rank
    assert rows == sorted(rows, key=lambda r: (r["adist"], r["neighbor_id"]))


def test_pq_code_ties_rank_deterministically(spark):
    from demy_spark.operators.similarity import pq_adc_topk, pq_build

    # two identical corpus vectors share a code tuple -> exact ADC tie;
    # the rank must break by neighbor id, not float luck
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in (7, 8)] + [
        (0, [0.9, 0.1, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    codebook, codes = pq_build(vecs, "embedding", "vec_id", m=2, ksub=2)
    out = pq_adc_topk(
        codebook, codes, vecs.where(F.col("vec_id") == 0),
        "embedding", "vec_id", k=3,
    )
    got = [(r["neighbor_id"], r["adist"]) for r in
           sorted(out.collect(), key=lambda r: r["rk"])]
    seven = dict(got)
    assert seven[7] == seven[8]  # identical codes -> identical rounded adist
    assert [n for n, _ in got if n in (7, 8)] == [7, 8]  # id tie-break order


def test_ivfpq_composition_bounds_scan(spark):
    from demy_spark.operators.similarity import (
        ivf_build,
        pq_adc_topk,
        pq_build,
    )

    vecs = _vecs(spark)
    centers, assigned = ivf_build(vecs, "embedding", "vec_id", n_lists=2, train_iters=1)
    codebook, codes = pq_build(vecs, "embedding", "vec_id", m=2, ksub=3)
    # probe expansion: each query scans only its own list's members
    q0 = assigned.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "cluster"
    )
    cand = q0.join(
        assigned.select(F.col("vec_id").alias("neighbor_id"), "cluster"), "cluster"
    ).select("query_id", "neighbor_id")
    out = pq_adc_topk(
        codebook, codes, vecs.where(F.col("vec_id") == 0),
        "embedding", "vec_id", k=5, candidates=cand,
    )
    rows = sorted(out.collect(), key=lambda r: r["rk"])
    assert rows and rows[0]["neighbor_id"] == 1  # near-dup recalled in-list
    # the scan really was bounded: nothing outside the probed list scored
    in_list = {r["neighbor_id"] for r in cand.collect()}
    assert {r["neighbor_id"] for r in rows} <= in_list < set(range(6))


def test_semdedup_removes_higher_id_clones(spark):
    from demy_spark.operators.dedup import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [1.0, 0.001, 0.0]),   # near-clone of 0
        (3, [0.0, -1.0, 0.0]),
        (4, [1.0, 0.0, 0.0]),     # exact clone of 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semdedup(df, "embedding", "vec_id", n_lists=2, tau=0.99).collect()
    }
    assert len(out) == 5
    # clones of 0 are dominated by the lower id; 0 itself survives
    assert out[0][1] is True
    assert out[4][1] is False
    assert out[2][1] is False  # cos(0,2) ~ 0.9999995 >= 0.99
    # members of other clusters untouched
    assert out[1][1] is True and out[3][1] is True
    # dominated vectors share the dominator's cluster
    assert out[4][0] == out[0][0]


def test_semdedup_tau_bounds_removal(spark):
    from demy_spark.operators.dedup import semdedup

    rows = [(i, [float(i + 1), 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    strict = semdedup(df, "embedding", "vec_id", n_lists=2, tau=1.01)
    assert all(r["keep"] for r in strict.collect())


def test_semdedup_default_n_lists_scales_with_corpus(spark):
    """With n_lists=None the quantizer width derives from the corpus
    (ceil(count / target_cluster_size), floor 8) so expected cluster
    sizes stay flat — the Σc² pairwise bound holds without caller
    care."""
    from demy_spark.operators.dedup import derived_n_lists, semdedup

    assert derived_n_lists(40, 5) == 8
    assert derived_n_lists(41, 5) == 9
    assert derived_n_lists(100, 2048) == 8          # floor
    assert derived_n_lists(10_000_000, 2048) == 4883  # grows with corpus
    assert derived_n_lists(0, 2048) == 8

    rows = [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(41)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, "embedding", "vec_id", tau=1.01, target_cluster_size=5)
    # derived 9 lists: cluster ids live in [0, 9) and every row returns
    assert out.count() == 41
    mx = out.agg(F.max("cluster")).first()[0]
    assert 0 <= mx <= 8


def test_minhash_probe_matches_full_dedup_cross_pairs(spark, tmp_path):
    from demy_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_dedup,
        minhash_probe,
    )

    base = "spark shuffle partition broadcast join window aggregate codegen"
    rows = [(i, f"{base} doc variant {i % 3}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx_docs = docs.where("doc_id % 4 != 0")
    batch = docs.where("doc_id % 4 = 0")

    # the index survives a parquet roundtrip — the production shape
    bands_df, shingles_df = minhash_index(idx_docs, "text", "doc_id")
    bands_df.write.mode("overwrite").parquet(str(tmp_path / "bands"))
    shingles_df.write.mode("overwrite").parquet(str(tmp_path / "shingles"))
    got = minhash_probe(
        spark.read.parquet(str(tmp_path / "bands")),
        spark.read.parquet(str(tmp_path / "shingles")),
        batch,
        "text",
        "doc_id",
        jaccard_threshold=0.5,
    )
    got_pairs = {
        (r["batch_id"], r["index_id"], r["jaccard"]) for r in got.collect()
    }

    # reference: full dedup over the union, restricted to cross pairs
    full = minhash_lsh_dedup(docs, "text", "doc_id", jaccard_threshold=0.5)
    want = set()
    for r in full.collect():
        a, b = r["doc_a"], r["doc_b"]
        if (a % 4 == 0) != (b % 4 == 0):
            bid, iid = (a, b) if a % 4 == 0 else (b, a)
            want.add((bid, iid, r["jaccard"]))
    assert got_pairs == want and got_pairs


def test_minhash_probe_intra_batch_option(spark):
    """Default probe reports only batch-vs-index pairs — two near-dups
    in the same batch both slip past a gate. include_intra_batch=True
    additionally emits intra-batch pairs as (higher, lower) so a
    keep-lowest-id gate admits exactly one per clone group."""
    from demy_spark.operators.dedup import minhash_index, minhash_probe

    idx_docs = spark.createDataFrame(
        [(1, "totally unrelated indexed corpus text about databases")],
        "doc_id long, text string",
    )
    base = "spark shuffle partition broadcast join window aggregate codegen"
    batch = spark.createDataFrame(
        [(100, f"{base} alpha"), (104, f"{base} alpha"), (200, "lone rows here now")],
        "doc_id long, text string",
    )
    bands_df, shingles_df = minhash_index(idx_docs, "text", "doc_id")

    args = (bands_df, shingles_df, batch, "text", "doc_id")
    default = minhash_probe(*args, jaccard_threshold=0.5)
    assert default.count() == 0  # blind to the 100/104 clone pair

    intra = minhash_probe(*args, jaccard_threshold=0.5, include_intra_batch=True)
    rows = {(r["batch_id"], r["index_id"]): r["jaccard"] for r in intra.collect()}
    assert set(rows) == {(104, 100)}  # higher id reported against lower
    assert rows[(104, 100)] == 1.0


def test_knn_classify_majority_and_ties(spark):
    from demy_spark.operators.similarity import knn_classify

    # axis clusters: label 1 along x, label 2 along y; one noise point
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1),
            (2, [0.9, 0.1], 1),
            (3, [0.8, 0.05], 1),
            (4, [0.0, 1.0], 2),
            (5, [0.1, 0.9], 2),
            (6, [-1.0, -1.0], 3),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05]), (101, [0.05, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in knn_classify(
            corpus, queries, "embedding", "vec_id", "label", k=3
        ).collect()
    }
    assert out[100] == (1, 3)  # all 3 nearest are x-cluster
    assert out[101][0] == 2
    # vote tie broken by best similarity: k=2 on a query equidistant
    # in votes (1 vs 1) must pick the closer label
    q_mid = spark.createDataFrame(
        [(200, [0.7, 0.7])], "vec_id long, embedding array<double>"
    )
    got = knn_classify(corpus, q_mid, "embedding", "vec_id", "label", k=2).collect()
    assert len(got) == 1 and got[0]["votes"] == 1
    assert got[0]["pred_label"] in (1, 2)
    # self-exclusion: a query sharing an id with a corpus row skips it
    q_self = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = knn_classify(corpus, q_self, "embedding", "vec_id", "label", k=2).collect()
    assert rows and rows[0]["query_id"] == 1


def test_semdedup_blas_and_fold_agree(spark):
    """The per-cluster matmul path and the SQL dot-fold mirror must
    make identical keep decisions (same quantized micro compare; ulp
    differences only matter on an exact micro-boundary)."""
    from demy_spark.operators.dedup import semdedup

    rows = [(i, [float((i * 7) % 13), float((i * 3) % 5), 1.0]) for i in range(60)]
    rows += [(100 + i, rows[i][1]) for i in range(0, 60, 5)]  # exact clones
    rows += [(200, [0.0, 0.0, 0.0])]  # zero-norm guard
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    key = lambda out: sorted(tuple(r) for r in out.collect())  # noqa: E731
    blas = key(semdedup(df, "embedding", "vec_id", n_lists=3, tau=0.98))
    fold = key(
        semdedup(df, "embedding", "vec_id", n_lists=3, tau=0.98, pairwise="fold")
    )
    assert blas == fold and len(blas) == len(rows)
    # clones are actually dropped
    kept = {r[0] for r in blas if r[2]}
    assert not any(100 + i in kept and i in kept for i in range(0, 60, 5))


def test_semdedup_blas_carries_caller_id_type(spark):
    """The blas path's output schema derives from the caller's id
    column — a 32-bit int id (any numeric id; ivf_build's seeding
    needs id % n_lists, so numeric is the operator contract) must not
    crash against a hardcoded bigint schema."""
    import pytest

    from demy_spark.operators.dedup import semdedup

    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {
        r["vec_id"]: r["keep"]
        for r in semdedup(df, "embedding", "vec_id", n_lists=2, tau=0.99).collect()
    }
    assert out == {1: True, 2: False, 3: True}
    # the id keeps its 32-bit type end to end
    sch = dict(semdedup(df, "embedding", "vec_id", n_lists=2).dtypes)
    assert sch["vec_id"] == "int"
    with pytest.raises(ValueError, match="pairwise"):
        semdedup(df, "embedding", "vec_id", n_lists=2, pairwise="bias")


def test_knn_classify_exclude_self_flag(spark):
    """exclude_self=False keeps corpus rows whose id collides with a
    query id — required when query ids live in a different id space."""
    from demy_spark.operators.similarity import knn_classify

    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0], 1), (8, [0.0, 1.0], 2)],
        "vec_id long, embedding array<double>, label int",
    )
    # query id 7 collides with corpus id 7, but is a DIFFERENT record
    q = spark.createDataFrame([(7, [1.0, 0.05])], "vec_id long, embedding array<double>")
    excl = knn_classify(corpus, q, "embedding", "vec_id", "label", k=1).collect()
    incl = knn_classify(
        corpus, q, "embedding", "vec_id", "label", k=1, exclude_self=False
    ).collect()
    assert excl[0]["pred_label"] == 2  # true neighbor dropped by id collision
    assert incl[0]["pred_label"] == 1  # kept when spaces are declared distinct


def test_ivf_filter_cols_constrain_candidates(spark):
    """filter_cols (q139): candidates must match the query's typed
    point filter; a NULL query value is unconstrained (fuzzy_lookup's
    contract). The filter applies before the rerank, so results only
    ever contain matching-label neighbors."""
    from demy_spark.operators.similarity import ivf_cosine_topk

    rows = [
        (i, [float((i * 7) % 5), float((i * 3) % 7), float(i % 4), 1.0], i % 2)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    queries = spark.createDataFrame(
        [(0, rows[0][1], 1), (1, rows[1][1], None)],
        "vec_id long, embedding array<double>, target int",
    )
    out = ivf_cosine_topk(
        df, queries, "embedding", "vec_id",
        k=5, n_lists=4, nprobe=4, train_iters=1,
        filter_cols=[("target", "label")],
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # query 0 constrained to label 1 -> only odd neighbors
    assert by_q[0] and all(n % 2 == 1 for n in by_q[0])
    # query 1 unconstrained (NULL target) -> both parities reachable
    assert by_q[1] and len({n % 2 for n in by_q[1]}) == 2


def test_ivf_probe_leaves_no_cached_frames(spark):
    """Persist-ownership contract (code-review r7): a default
    ivf_cosine_topk call (internal capped build) must leave executor
    storage exactly as it found it — the leak class the r6 ADVICE
    flagged. semdedup (own_persist=True) releases what it owns, so
    its only residue is its own documented base persist."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(120)] + [
        (200 + i, [float(i % 5), float(i % 7), 1.0, 0.0]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def n_cached() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    spark.catalog.clearCache()
    before = n_cached()
    out = ivf_cosine_topk(
        df, df.where(F.col("vec_id") < 3), "embedding", "vec_id",
        k=3, n_lists=4, nprobe=2, train_iters=1,
    )
    assert out.count() > 0
    assert n_cached() == before, "internal ivf_build leaked a cached frame"


def test_pq_build_codebook_is_persisted(spark):
    """r13: pq_build must return a CACHED refined codebook —
    pq_adc_topk executes the codebook plan three times (the dsub
    probe, the broadcast LUT build, the codes argmin), and the
    persist is what collapses three corpus-scale training passes
    into one."""
    from demy_spark.operators.similarity import pq_build

    vecs = _vecs(spark)
    codebook, _ = pq_build(vecs, "embedding", "vec_id", m=2, ksub=2)
    try:
        assert codebook.storageLevel.useMemory
    finally:
        codebook.unpersist()
