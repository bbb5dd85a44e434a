from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demy_spark.operators.sampling import bottom_k_sample, stratified_sample
from demy_spark.operators.sketches import (
    countmin_heavy_hitters,
    hll_distinct,
    hll_error_bound,
)


def test_hll_accuracy_and_determinism(spark):
    n = 5000
    df = spark.range(n).select(
        (F.col("id") % 2).alias("g"), (F.col("id") * 7 + 13).alias("k")
    )
    est = {r["g"]: r["est_distinct"] for r in hll_distinct(df, "k", ["g"]).collect()}
    for g in (0, 1):
        exact = n / 2
        assert est[g] == pytest.approx(exact, rel=4 * hll_error_bound(8))
    again = {r["g"]: r["est_distinct"] for r in hll_distinct(df, "k", ["g"]).collect()}
    assert est == again  # pure function of the key set


def test_hll_small_range_linear_counting(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    est = hll_distinct(df, "k").collect()[0]["est_distinct"]
    assert est == pytest.approx(10, abs=1.5)  # linear-counting regime is tight


def test_countmin_upper_bound_and_top1(spark):
    rows = [("common",)] * 500 + [(f"rare{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["tok"])
    out = countmin_heavy_hitters(df, "tok", depth=4, width=64, top_k=5).collect()
    assert out[0]["key"] == "common" and out[0]["tf"] == 500
    for r in out:
        assert r["est"] >= r["tf"] and r["overcount"] >= 0  # one-sided error


def test_countmin_exact_when_no_collisions(spark):
    df = spark.createDataFrame([(f"t{i}",) for i in range(8) for _ in range(i + 1)], ["tok"])
    out = countmin_heavy_hitters(df, "tok", depth=4, width=4096, top_k=8).collect()
    assert all(r["overcount"] == 0 for r in out)  # 8 keys, 4096 buckets
    assert [r["tf"] for r in out] == [8, 7, 6, 5, 4, 3, 2, 1]


def test_stratified_sample_rates_and_salt(spark):
    df = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    out = stratified_sample(df, "k", "s", {"true": 0.3, "false": 0.7})
    by = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by["true"] == pytest.approx(1500, rel=0.1)
    assert by["false"] == pytest.approx(3500, rel=0.1)
    # deterministic: same key set both runs
    a = {r["k"] for r in out.collect()}
    b = {r["k"] for r in stratified_sample(df, "k", "s", {"true": 0.3, "false": 0.7}).collect()}
    assert a == b
    # a different salt draws a different (but similar-sized) sample
    c = {r["k"] for r in stratified_sample(df, "k", "s", {"true": 0.3, "false": 0.7}, salt=1).collect()}
    assert c != a and len(c) == pytest.approx(len(a), rel=0.15)


def test_stratified_default_rate_drops_unknown_strata(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "s"])
    assert stratified_sample(df, "k", "s", {"x": 1.0}).collect()[0]["s"] == "x"


def test_bottom_k_fixed_size_and_mergeable(spark):
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("s")
    )
    out = bottom_k_sample(df, "k", "s", 10)
    sizes = out.groupBy("s").count().collect()
    assert all(r["count"] == 10 for r in sizes)
    # mergeability: bottom-k of per-half bottom-k == bottom-k of the whole
    a, b = df.where(F.col("k") < 1000), df.where(F.col("k") >= 1000)
    merged = bottom_k_sample(
        bottom_k_sample(a, "k", "s", 10).unionByName(bottom_k_sample(b, "k", "s", 10)),
        "k",
        "s",
        10,
    )
    whole = {tuple(r) for r in out.collect()}
    assert {tuple(r) for r in merged.collect()} == whole


def test_equi_width_histogram_bins_and_clamp(spark):
    from demy_spark.operators.sketches import equi_width_histogram

    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 9.9, 10.0, 95.0, 100.0, 250.0]], ["x"]
    )
    hist = {r["bin"]: r["n"] for r in
            equi_width_histogram(df, "x", bins=10, lo=0.0, hi=100.0).collect()}
    # -5 clamps into bin 0; 100 and 250 clamp into bin 9
    assert hist == {0: 3, 1: 1, 9: 3}


def test_histogram_quantiles_interpolation(spark):
    from demy_spark.operators.sketches import (
        equi_width_histogram,
        histogram_quantiles,
    )

    # 100 uniform values 0..99 -> quantiles ~ q*100 within one bin width
    df = spark.createDataFrame([(float(v),) for v in range(100)], ["x"])
    hist = equi_width_histogram(df, "x", bins=10, lo=0.0, hi=100.0)
    out = {r["q"]: r for r in
           histogram_quantiles(hist, [0.5, 0.9], bins=10, lo=0.0, hi=100.0).collect()}
    assert out[0.5]["n_total"] == 100
    assert abs(out[0.5]["qvalue"] - 50.0) <= 10.0
    assert abs(out[0.9]["qvalue"] - 90.0) <= 10.0
    # exact under the uniform intra-bin assumption: r=50 lands at the
    # boundary of bin 4 (cum 50) -> right edge
    assert out[0.5]["qvalue"] == 50.0


def test_histogram_is_mergeable(spark):
    from demy_spark.operators.sketches import equi_width_histogram

    df = spark.createDataFrame([(float(v),) for v in range(100)], ["x"])
    a, b = df.where("x < 37"), df.where("x >= 37")
    merged = (
        equi_width_histogram(a, "x", bins=10, lo=0.0, hi=100.0)
        .unionByName(equi_width_histogram(b, "x", bins=10, lo=0.0, hi=100.0))
        .groupBy("bin").sum("n")
    )
    whole = equi_width_histogram(df, "x", bins=10, lo=0.0, hi=100.0)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_greedy_pack_layout(spark):
    from demy_spark.operators.packing import greedy_pack, pack_occupancy

    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, 30 + (i % 5) * 10) for i in range(40)], ["id", "n"]
    )
    packed = greedy_pack(docs, "id", "n", cap=100, buckets=4)
    rows = packed.collect()
    assert len(rows) == 40  # every doc gets coordinates
    for r in rows:
        assert 0 <= r["bucket"] < 4
        assert 0 <= r["offset"] < 100
        assert r["pack"] >= 0
    # per-bucket layout is gapless: sorted by (pack, offset), each doc
    # starts exactly where the previous one's tokens ended (mod cap)
    from collections import defaultdict
    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[r["bucket"]].append(r)
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: (r["pack"], r["offset"]))
        pos = 0
        for r in rs:
            assert r["pack"] * 100 + r["offset"] == pos, (b, r)
            pos += r["n_tokens"]
    # deterministic
    again = greedy_pack(docs, "id", "n", cap=100, buckets=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # occupancy audit covers every pack that has a starting doc
    occ = pack_occupancy(packed, cap=100)
    assert occ.agg(F.sum("n_docs")).first()[0] == 40
    assert all(0 < r["fill_ratio"] <= 1.0 for r in occ.collect())


def test_greedy_pack_long_doc_spans_packs(spark):
    from demy_spark.operators.packing import greedy_pack

    docs = spark.createDataFrame([(1, 250), (2, 30)], ["id", "n"])
    packed = {r["id"]: r for r in
              greedy_pack(docs, "id", "n", cap=100, buckets=1).collect()}
    first = min(packed.values(), key=lambda r: (r["pack"], r["offset"]))
    assert first["offset"] == 0 and first["pack"] == 0
    # the second doc starts where the 250/30-token stream continues
    other = [r for r in packed.values() if r["id"] != first["id"]][0]
    assert other["pack"] * 100 + other["offset"] == first["n_tokens"]


def test_weighted_sample_favors_heavy_rows(spark):
    from demy_spark.operators.sampling import weighted_sample

    # ids start at 1: knuth_unit(0) == 0.0 exactly, and a zero draw
    # scores 0 regardless of weight (legitimate A-ES behavior)
    rows = [(i, 1000000 if i <= 5 else 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "id long, w long")
    picked = {r["id"] for r in weighted_sample(df, "id", "w", 10).collect()}
    # the 5 overwhelmingly heavy rows are essentially certain picks
    assert {1, 2, 3, 4, 5} <= picked and len(picked) == 10


def test_weighted_sample_is_deterministic_and_excludes_nonpositive(spark):
    from demy_spark.operators.sampling import weighted_sample

    rows = [(i, (i % 7) - 1) for i in range(100)]  # weights -1..5
    df = spark.createDataFrame(rows, "id long, w long")
    a = [r["id"] for r in weighted_sample(df, "id", "w", 15).collect()]
    b = [r["id"] for r in weighted_sample(df, "id", "w", 15).collect()]
    assert a == b and len(a) == 15
    zero_or_neg = {i for i, w in rows if w <= 0}
    assert not (set(a) & zero_or_neg)


def test_bloom_no_false_negatives_and_python_replay(spark):
    """Every built key must probe maybe_member=True (Bloom guarantee),
    and the flags must equal a hashlib replay of the md5-slice +
    Kirsch-Mitzenmacher bit positions — register-level verification."""
    import hashlib

    from demy_spark.operators.sketches import bloom_bitmap, bloom_probe

    m, kh = 256, 3
    built = [f"key-{i}" for i in range(40)]
    others = [f"other-{i}" for i in range(60)]
    bdf = spark.createDataFrame([(k,) for k in built], ["k"])
    pdf = spark.createDataFrame([(k,) for k in built + others], ["k"])
    bitmap = bloom_bitmap(bdf, "k", m_bits=m, n_hashes=kh)
    got = {
        r["key"]: r["maybe_member"]
        for r in bloom_probe(pdf, "k", bitmap, m_bits=m, n_hashes=kh).collect()
    }

    def positions(key: str):
        d = hashlib.md5(key.encode()).hexdigest()
        h1 = int(d[0:15], 16)
        h2 = int(d[15:23], 16) & 0x7FFFFFFF
        return [(h1 + i * h2) % m for i in range(kh)]

    bits = set()
    for k in built:
        bits.update(positions(k))
    for k in built + others:
        expect = all(p in bits for p in positions(k))
        assert got[k] == expect, k
    assert all(got[k] for k in built)  # no false negatives, ever


def test_bloom_bitmap_words_match_replay(spark):
    import hashlib

    from demy_spark.operators.sketches import bloom_bitmap

    m, kh = 128, 2
    keys = [f"w{i}" for i in range(25)]
    bitmap = {
        r["word"]: r["bits"]
        for r in bloom_bitmap(
            spark.createDataFrame([(k,) for k in keys], ["k"]),
            "k",
            m_bits=m,
            n_hashes=kh,
        ).collect()
    }
    words: dict[int, int] = {}
    for k in keys:
        d = hashlib.md5(k.encode()).hexdigest()
        h1 = int(d[0:15], 16)
        h2 = int(d[15:23], 16) & 0x7FFFFFFF
        for i in range(kh):
            p = (h1 + i * h2) % m
            words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    assert bitmap == words


def test_fim_split_layout_and_determinism(spark):
    import hashlib

    from demy_spark.operators.packing import fim_split

    docs = [(i, " ".join(f"t{j}" for j in range(10))) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fim_split(df, "doc_id", "text", rate_pct=50, salt=7).collect()}
    again = {r["doc_id"]: r for r in fim_split(df, "doc_id", "text", rate_pct=50, salt=7).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }  # no RNG state anywhere

    def replay(doc_id: int, n: int):
        d = hashlib.md5(f"{doc_id}\x017".encode()).hexdigest()
        take = int(d[0:8], 16) % 100 < 50
        a, b = int(d[8:16], 16) % (n + 1), int(d[16:24], 16) % (n + 1)
        return take, min(a, b), max(a, b)

    took = 0
    for i, text in docs:
        take, lo, hi = replay(i, 10)
        r = out[i]
        assert r["fim"] == take
        if take:
            took += 1
            assert (r["n_prefix"], r["n_middle"], r["n_suffix"]) == (
                lo,
                hi - lo,
                10 - hi,
            )
            toks = text.split()
            assert r["text_fim"] == (
                "<PRE> " + " ".join(toks[:lo])
                + " <SUF> " + " ".join(toks[hi:])
                + " <MID> " + " ".join(toks[lo:hi])
            )
        else:
            assert r["text_fim"] == text and r["n_middle"] == 0
    assert 0 < took < 20  # the 50% gate actually splits the fixture


def test_fim_split_token_counts_conserve(spark):
    from demy_spark.operators.packing import fim_split
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "solo")], "doc_id long, text string"
    )
    out = fim_split(df, "doc_id", "text", rate_pct=100, salt=0)
    rows = {r["doc_id"]: r for r in out.collect()}
    for i, n in [(1, 3), (2, 0), (3, 1)]:
        r = rows[i]
        assert r["n_prefix"] + r["n_middle"] + r["n_suffix"] == n
        assert r["fim"]


# ---------------------------------------------------------------------------
# Quantile sketch (r12): mergeable sorted-sample summary
# ---------------------------------------------------------------------------


def _exact_disc(vals, p, denom=100):
    """Reference discrete quantile: smallest value whose rank reaches
    ceil(p*n/denom) — the all-integer rule the sketch implements."""
    s = sorted(vals)
    t = (p * len(s) + denom - 1) // denom
    return s[max(t, 1) - 1]


def test_quantile_sketch_lossless_is_exact(spark):
    from demy_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_query,
    )

    vals = [((i * 1103515245 + 12345) % 100003, "g%d" % (i % 2)) for i in range(4000)]
    df = spark.createDataFrame(vals, ["v", "g"])
    sk = quantile_sketch_build(df, "v", ["g"], shards=4, capacity=4096)
    # capacity >= every shard: lossless — weights all 1, nothing dropped
    assert sk.agg(F.sum("weight")).collect()[0][0] == 4000
    assert sk.where(F.col("weight") != 1).count() == 0
    out = quantile_sketch_query(sk, [1, 25, 50, 75, 99, 100], ["g"])
    got = {(r["g"], r["p"]): (r["q_value"], r["n_rows"]) for r in out.collect()}
    for g in ("g0", "g1"):
        gv = [v for v, gg in vals if gg == g]
        for p in (1, 25, 50, 75, 99, 100):
            assert got[(g, p)] == (_exact_disc(gv, p), len(gv)), (g, p)


def test_quantile_sketch_compressed_rank_error_bound(spark):
    from demy_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_query,
    )

    n, cap = 20000, 128
    df = spark.range(n).select(
        ((F.col("id") * 48271) % 99991).alias("v"), F.col("id").alias("k")
    )
    sk = quantile_sketch_build(df, "v", shards=4, capacity=cap, shard_key=["k"])
    # count mass is conserved exactly even under compression
    assert sk.agg(F.sum("weight")).collect()[0][0] == n
    assert sk.count() <= 4 * cap + 4
    vals = sorted(r["v"] for r in df.select("v").collect())
    out = quantile_sketch_query(sk, [10, 50, 90])
    # rank error < sum over shards of ceil(shard_n/cap) ~= n/cap + shards
    bound = n // cap + 4
    for r in out.collect():
        returned_rank_lo = vals.index(r["q_value"]) + 1
        returned_rank_hi = len(vals) - vals[::-1].index(r["q_value"])
        want = (r["p"] * n + 99) // 100
        assert returned_rank_lo - bound <= want <= returned_rank_hi + bound


def test_quantile_sketch_merge_is_lossless_and_associative(spark):
    from demy_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_merge,
        quantile_sketch_query,
    )

    rows = [((i * 2654435761) % 65537, "a" if i % 3 else "b") for i in range(3000)]
    df = spark.createDataFrame(rows, ["v", "g"])
    h1 = df.where(F.col("v") % 2 == 0)
    h2 = df.where(F.col("v") % 2 == 1)
    b = lambda d: quantile_sketch_build(d, "v", ["g"], shards=2, capacity=4096)
    ps = [5, 50, 95, 100]
    merged = quantile_sketch_merge(b(h1), b(h2), by=["g"], capacity=4096)
    whole = quantile_sketch_query(b(df), ps, ["g"])
    viamerge = quantile_sketch_query(merged, ps, ["g"])
    key = lambda out: sorted(map(tuple, out.collect()))
    assert key(whole) == key(viamerge)  # merge-of-halves == build-of-whole


def test_quantile_sketch_merge_compression_keeps_max_and_mass(spark):
    from demy_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_merge,
        quantile_sketch_query,
    )

    n, cap = 6000, 64
    df = spark.range(n).select(((F.col("id") * 7919) % 104729).alias("v"))
    halves = [
        quantile_sketch_build(
            df.where(F.col("v") % 2 == i), "v", shards=2, capacity=cap
        )
        for i in (0, 1)
    ]
    m = quantile_sketch_merge(*halves, capacity=cap)
    assert m.count() <= cap + 2
    assert m.agg(F.sum("weight")).collect()[0][0] == n  # mass conserved
    true_max = df.agg(F.max("v")).collect()[0][0]
    got = quantile_sketch_query(m, [100]).collect()[0]
    assert got["q_value"] == true_max  # p=100 anchored by the kept max


def test_quantile_sketch_weighted_build_matches_unweighted(spark):
    """The weighted build on (value, count) rows must answer exactly
    like the unweighted build on the exploded multiset when both are
    lossless — same thresholds, same discrete quantiles."""
    from demy_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_query,
    )

    pairs = [((i * 48271) % 997, i % 7 + 1, "g%d" % (i % 2)) for i in range(800)]
    wdf = spark.createDataFrame(pairs, ["v", "w", "g"])
    exploded = wdf.selectExpr("v", "g", "explode(sequence(1, w)) AS _").select(
        "v", "g"
    )
    ps = [1, 25, 50, 75, 99, 100]
    ws = quantile_sketch_build(
        wdf, "v", ["g"], shards=4, capacity=4096, weight_col="w"
    )
    us = quantile_sketch_build(exploded, "v", ["g"], shards=4, capacity=8192)
    n = sum(w for _, w, _ in pairs)
    assert ws.agg(F.sum("weight")).collect()[0][0] == n
    assert us.agg(F.sum("weight")).collect()[0][0] == n
    key = lambda out: sorted(map(tuple, out.collect()))
    assert key(quantile_sketch_query(ws, ps, ["g"])) == key(
        quantile_sketch_query(us, ps, ["g"])
    )


def test_quantile_sketch_weighted_build_compresses_and_anchors(spark):
    from demy_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_query,
    )

    n, cap = 5000, 32
    df = spark.range(n).select(
        ((F.col("id") * 7919) % 49999).alias("v"),
        (F.col("id") % 3 + 1).alias("w"),
    )
    sk = quantile_sketch_build(df, "v", shards=2, capacity=cap, weight_col="w")
    total = df.agg(F.sum("w")).collect()[0][0]
    assert sk.count() <= 2 * (cap + 1)
    assert sk.agg(F.sum("weight")).collect()[0][0] == total
    got = quantile_sketch_query(sk, [100]).collect()[0]
    assert got["q_value"] == df.agg(F.max("v")).collect()[0][0]
    assert got["n_rows"] == total
    # zero/negative weights are excluded, never counted
    df2 = df.withColumn("w", F.when(F.col("v") % 2 == 0, -1).otherwise(F.col("w")))
    sk2 = quantile_sketch_build(df2, "v", shards=2, capacity=cap, weight_col="w")
    pos = df2.where(F.col("w") > 0).agg(F.sum("w")).collect()[0][0]
    assert sk2.agg(F.sum("weight")).collect()[0][0] == pos


def test_quantile_sketch_cont_matches_numpy_linear(spark):
    """The interpolated query on a lossless summary implements the
    'linear' percentile_cont method with EXACT integer rank splitting:
    bit-equal to numpy.percentile when the continuous rank lands on an
    order statistic (n=501 makes every integer-percent rank exact),
    and within 1 ulp when it doesn't (numpy computes the fractional
    rank in floating point; this formulation doesn't — verified by a
    4,000-case offline fuzz, r12)."""
    import numpy as np
    import pytest

    from demy_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_query_cont,
    )

    ps = [0, 1, 10, 50, 90, 99, 100]
    # exact-rank regime: (n-1) == 500, so p*(n-1) is a multiple of 100
    # for every integer p — bit equality demanded
    vals = [int((i * 48271) % 9973) for i in range(501)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    sk = quantile_sketch_build(df, "v", shards=4, capacity=4096)
    got = {
        r["p"]: r["q_value"]
        for r in quantile_sketch_query_cont(sk, ps).collect()
    }
    for p in ps:
        want = float(np.percentile(np.array(vals), p, method="linear"))
        assert got[p] == want, (p, got[p], want)
    # fractional-rank regime: n=230 puts most integer percents between
    # order statistics — agreement to 1 ulp, endpoints still exact
    vals2 = [int((i * 2654435761) % 100003) for i in range(230)]
    df2 = spark.createDataFrame([(v,) for v in vals2], ["v"])
    sk2 = quantile_sketch_build(df2, "v", shards=4, capacity=4096)
    got2 = {
        r["p"]: r["q_value"]
        for r in quantile_sketch_query_cont(sk2, ps).collect()
    }
    for p in ps:
        want = float(np.percentile(np.array(vals2), p, method="linear"))
        if p in (0, 100):
            assert got2[p] == want, (p, got2[p], want)
        else:
            assert got2[p] == pytest.approx(want, rel=1e-12), (p, got2[p], want)


def test_quantile_sketch_randomized_group_invariants(spark):
    """50 random groups (sizes 1-400, duplicate-heavy and spread value
    domains, random weights) through ONE build+compress pass at a
    small capacity: per-group mass conservation, max anchoring,
    row-count bound, and cumulative-weight-equals-exact-rank at every
    kept row, each checked against a pure-Python recomputation.
    Deterministic seed — the multi-case twin of the single-case tests
    above."""
    import random

    from demy_spark.operators.sketches import quantile_sketch_build

    rnd = random.Random(1207)
    rows, truth = [], {}
    for g in range(50):
        size = rnd.choice([1, 2, 3, 7, 40, 133, 400])
        domain = rnd.choice([5, 37, 10_000])
        vals = [rnd.randrange(domain) for _ in range(size)]
        ws = [rnd.randrange(1, 6) for _ in range(size)]
        gid = f"g{g}"
        truth[gid] = (vals, ws)
        rows += [(gid, v, w, i) for i, (v, w) in enumerate(zip(vals, ws))]
    df = spark.createDataFrame(rows, ["g", "v", "w", "rid"])
    cap = 16
    sk = quantile_sketch_build(
        df, "v", ["g"], shards=2, capacity=cap, weight_col="w",
        shard_key=["rid"],
    )
    got: dict[str, list] = {}
    for r in sk.collect():
        got.setdefault(r["g"], []).append((r["value"], r["weight"]))
    assert set(got) == set(truth)
    for gid, (vals, ws) in truth.items():
        kept = sorted(got[gid])
        total = sum(ws)
        assert sum(w for _, w in kept) == total, gid  # mass conserved
        assert kept[-1][0] == max(vals), gid  # p=100 anchor
        assert len(kept) <= 2 * (cap + 1), gid  # bound per shard
        # cum weight at each kept value must equal the EXACT rank of
        # some element with that value (ranks are 1..total over the
        # weight-expanded multiset) — the gap re-weighting contract
        expanded = sorted(
            v for v, w in zip(vals, ws) for _ in range(w)
        )
        # exact cumulative count of elements <= x, per distinct value
        import bisect

        # gap re-weighting attributes compressed-away mass to the kept
        # value at the TOP of its gap: mass only ever moves UP in
        # value, so the running cum at value v can never exceed the
        # exact count of elements <= v, and can undershoot it by at
        # most the documented rank error (one stride per shard)
        slack = 2 * -(-total // cap)  # shards * ceil(total/cap)
        by_value: dict[int, int] = {}
        for v, w in kept:  # same value kept by both shards: combine,
            by_value[v] = by_value.get(v, 0) + w  # as the query does
        cum = 0
        for v in sorted(by_value):
            cum += by_value[v]
            hi = bisect.bisect_right(expanded, v)
            assert cum <= hi, (gid, v, cum, hi)
            assert cum > hi - slack - 1, (gid, v, cum, hi, slack)


def test_quantile_sketch_md5_null_shard_keys_replayable(spark):
    """ADVICE r12: concat_ws silently skips NULLs, so the distinct
    shard-key tuples ('a', NULL) and (NULL, 'a') used to hash the same
    md5 input 'a' — colliding into one shard AND diverging from any
    external NULL-propagating replay. NULL keys now enter the hash as
    a chr(0) sentinel; this replays the ENTIRE compressed md5-mode
    build in pure Python (sentinel join -> md5 shard -> per-shard
    sorted stride keep + max -> gap weights) and pins row-for-row
    equality on data full of NULL key columns."""
    import hashlib
    import math

    from demy_spark.operators.sketches import quantile_sketch_build

    keys = [("a", None), (None, "a"), ("a", "b"), (None, None), ("b", None)]
    rows = [
        (k1, k2, (i * 2654435761 + j) % 10007)
        for j, (k1, k2) in enumerate(keys)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["k1", "k2", "v"])
    shards, capacity = 4, 8
    sk = quantile_sketch_build(
        df, "v", [], shards=shards, capacity=capacity,
        shard_key=["k1", "k2"], shard_hash="md5",
    )
    got = sorted((r["value"], r["weight"]) for r in sk.collect())

    def shard_of(k1, k2):
        s = "|".join("\x00" if k is None else k for k in (k1, k2))
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % shards

    per_shard: dict[int, list[int]] = {}
    for k1, k2, v in rows:
        per_shard.setdefault(shard_of(k1, k2), []).append(v)
    # the sentinel must actually separate the would-have-collided
    # tuples for the test to mean anything
    assert len({shard_of(k1, k2) for k1, k2 in keys}) > 1
    want = []
    for vals in per_shard.values():
        vals.sort()
        stride = math.ceil(len(vals) / capacity)
        prev = 0
        for rn in range(1, len(vals) + 1):
            if rn % stride == 0 or rn == len(vals):
                want.append((vals[rn - 1], rn - prev))
                prev = rn
    assert got == sorted(want)


def test_md5_shard_replay_formula_agrees_with_duckdb(spark):
    """The docstring's advertised EXTERNAL replay — shard =
    ('0x' || substring(md5(concat_ws('|', coalesce(c::varchar,
    chr(0)), ...)), 1, 15))::BIGINT % shards — must agree with the
    engine's shard expression ON THE SECOND ENGINE, NUL sentinel
    included (the pure-Python replay above can't catch a DuckDB
    varchar/NUL divergence)."""
    import duckdb

    from pyspark.sql import functions as F

    from demy_spark.operators.sketches import _md5_long

    rows = [("a", None), (None, "a"), ("a", "b"), (None, None),
            ("x|y", None), (None, ""), ("", None), ("0", "0"),
            # non-ASCII: both engines must hash the same UTF-8 bytes
            ("été", None), (None, "中文"),
            ("\U0001f600", "a")]
    shards = 5
    df = spark.createDataFrame(rows, ["k1", "k2"])
    joined = F.concat_ws(
        "|",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
          for c in ("k1", "k2")],
    )
    got = [
        r["s"]
        for r in df.select(
            F.pmod(_md5_long(joined, 1, 15), F.lit(shards)).alias("s")
        ).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(k1 VARCHAR, k2 VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = [
        r[0]
        for r in con.execute(
            "SELECT ('0x' || substring(md5(concat_ws('|',"
            " coalesce(k1, chr(0)), coalesce(k2, chr(0)))), 1, 15))"
            f"::BIGINT % {shards} FROM t"
        ).fetchall()
    ]
    assert got == want
    # the sentinel must keep every distinct tuple's hash INPUT
    # distinct — NULL vs empty string, and a literal '|' in the data,
    # may still collide mod shards but never pre-hash
    full = [
        r[0]
        for r in con.execute(
            "SELECT md5(concat_ws('|', coalesce(k1, chr(0)),"
            " coalesce(k2, chr(0)))) FROM t"
        ).fetchall()
    ]
    assert len(set(full)) == len(rows)
