"""Unit tests for operators/curation: contamination, canonical
selection, mixture sampling. Query-level parity is covered by
test_oracle_parity (q86-q88)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from demy_spark.operators.curation import (
    canonical_per_cluster,
    contamination_check,
    mixture_sample,
    shingle_hashes,
)


def test_shingle_hashes_short_docs(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("  x  ",)], ["t"]
    ).select(shingle_hashes(F.col("t"), 3).alias("s"))
    sizes = [r.s is not None and len(r.s) for r in df.collect()]
    assert sizes == [2, 0, 0, 0]


def test_shingle_hashes_distinct(spark):
    # repeated trigram collapses to one hash
    df = spark.createDataFrame([("a b a b a b a",)], ["t"]).select(
        shingle_hashes(F.col("t"), 3).alias("s")
    )
    # trigrams: "a b a" x3, "b a b" x2 -> 2 distinct
    assert len(df.first().s) == 2


def test_contamination_exact_and_near(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "lorem ipsum dolor sit amet")],
        ["id", "txt"],
    )
    test = spark.createDataFrame(
        [
            (10, "The quick brown fox jumps"),  # exact after normalization
            (11, "the quick brown cat sleeps"),  # partial overlap
            (12, "totally different words here now"),  # clean
            (13, "xy"),  # too short for shingles
        ],
        ["id", "txt"],
    )
    out = {
        r.id: r
        for r in contamination_check(
            train, test, "id", "txt", n=3, threshold=0.5
        ).collect()
    }
    assert out[10].exact_dup and out[10].contaminated
    assert out[10].overlap_ratio == 1.0
    # "the quick brown" is the only shared trigram of 3
    assert not out[11].exact_dup
    assert out[11].n_hit == 1 and out[11].n_shingles == 3
    assert not out[11].contaminated
    # zero-hit docs must yield REAL zeros/Falses, not NULLs from the
    # left join (a NULL contaminated silently passes `not x` checks)
    assert out[12].n_hit == 0 and out[12].overlap_ratio == 0.0
    assert out[12].contaminated is False
    assert out[13].n_shingles == 0 and out[13].contaminated is False


def test_canonical_per_cluster(spark):
    df = spark.createDataFrame(
        [(1, "c1", 10), (2, "c1", 30), (3, "c1", 30), (4, "c2", 5)],
        ["id", "cl", "len"],
    )
    kept = {
        r.cl: r
        for r in canonical_per_cluster(
            df, "id", "cl", [F.col("len").desc(), F.col("id").asc()]
        ).collect()
    }
    assert kept["c1"].id == 2 and kept["c1"].n_members == 3  # tie -> min id
    assert kept["c2"].id == 4 and kept["c2"].n_members == 1


def test_mixture_sample_apportionment_and_cap(spark):
    rows = [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "s"])
    # targets: a -> floor(0.6*10)=6, b -> floor(0.4*10)=4 but capped at 5...
    # 0.6*10=6.0, 0.4*10=4.0 exactly; b has 5 rows so no cap
    out = mixture_sample(df, "k", "s", {"a": 0.6, "b": 0.4}, 10)
    got = {s: n for s, n in out.groupBy("s").count().collect()}
    assert got == {"a": 6, "b": 4}
    # cap binds: ask for more b than exists; shortfall NOT redistributed
    out2 = mixture_sample(df, "k", "s", {"a": 0.2, "b": 0.8}, 20)
    got2 = {s: n for s, n in out2.groupBy("s").count().collect()}
    assert got2 == {"a": 4, "b": 5}


def test_mixture_sample_largest_remainder(spark):
    rows = [(i, s) for s in "abc" for i in range(ord(s) * 100, ord(s) * 100 + 50)]
    df = spark.createDataFrame(rows, ["k", "s"])
    # 0.5*7=3.5, 0.3*7=2.1, 0.2*7=1.4 -> base 3,2,1 (sum 6), pool 1
    # fracs: a .5, c .4, b .1 -> extra goes to a
    out = mixture_sample(df, "k", "s", {"a": 0.5, "b": 0.3, "c": 0.2}, 7)
    got = {s: n for s, n in out.groupBy("s").count().collect()}
    assert got == {"a": 4, "b": 2, "c": 1}


def test_mixture_sample_deterministic_and_stable(spark):
    rows = [(i, "a") for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "s"])
    pick = lambda d: sorted(r.k for r in mixture_sample(d, "k", "s", {"a": 1.0}, 10).collect())
    first = pick(df)
    assert first == pick(df)
    # append-stability: adding rows can only displace, never reshuffle
    bigger = spark.createDataFrame(rows + [(500 + i, "a") for i in range(50)], ["k", "s"])
    second = pick(bigger)
    assert len(set(first) & set(second)) >= 8


def test_mixture_sample_unweighted_stratum_dropped(spark):
    df = spark.createDataFrame([(1, "a"), (2, "zz")], ["k", "s"])
    out = mixture_sample(df, "k", "s", {"a": 1.0}, 5)
    assert [r.s for r in out.collect()] == ["a"]


@pytest.mark.parametrize("name", ["q86_contamination_check", "q87_canonical_docs", "q88_mixture_sample"])
def test_new_queries_run(spark, sf_dir, name):
    from demy_spark import queries as Q

    df = Q.REGISTRY[name].fn(spark, sf_dir)
    assert df.count() > 0


def test_mixture_sample_invariants_across_configs(spark):
    """Apportionment invariants for a spread of weights/totals: kept
    counts hit min(target, available) exactly, never exceed the grand
    total, and the kept rows are a subset of the input."""
    rows = [(s * 1000 + i, c) for s, c in enumerate("abcd") for i in range((s + 1) * 7)]
    df = spark.createDataFrame(rows, ["k", "s"])
    avail = {"a": 7, "b": 14, "c": 21, "d": 28}
    configs = [
        ({"a": 0.25, "b": 0.25, "c": 0.25, "d": 0.25}, 40),
        ({"a": 0.7, "b": 0.1, "c": 0.1, "d": 0.1}, 30),   # a caps
        ({"a": 0.33, "b": 0.33, "c": 0.34}, 10),           # d unweighted
        ({"a": 0.5, "b": 0.5}, 100),                       # both cap
        ({"a": 1.0}, 3),
    ]
    for weights, total in configs:
        out = mixture_sample(df, "k", "s", weights, total, keep_plan_cols=True)
        got = out.groupBy("s", "target").count().collect()
        kept_keys = {r.k for r in out.select("k").collect()}
        assert kept_keys <= {k for k, _ in rows}
        for r in got:
            assert r.s in weights
            assert r["count"] == min(r["target"], avail[r.s])
        assert sum(r["count"] for r in got) <= total


def test_source_overlap_matrix_counts(spark):
    from demy_spark.operators.curation import source_overlap_matrix

    rows = [
        (1, "srcA", "a b c d"),      # trigrams: abc, bcd
        (2, "srcA", "a b c"),        # abc (dup within group collapses)
        (3, "srcB", "a b c x"),      # abc, bcx
        (4, "srcC", "q r s t"),      # qrs, rst — disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in source_overlap_matrix(docs, "text", "source").collect()
    }
    ab = out[("srcA", "srcB")]
    assert ab["shared"] == 1 and ab["n_a"] == 2 and ab["n_b"] == 2
    assert abs(ab["jaccard"] - 1 / 3) < 1e-6
    # disjoint pairs are omitted entirely
    assert ("srcA", "srcC") not in out and ("srcB", "srcC") not in out


def test_snapshot_diff_statuses(spark):
    from demy_spark.operators.curation import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "keep me"), (3, "gone soon")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha  BETA "), (2, "keep me now"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new, "doc_id", "text").collect()}
    # doc 1: only whitespace/case changes -> normalized fingerprint equal
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_winnow_fingerprints_model(spark):
    """Winnowing vs a Counter-free Python model: ordered 4-gram
    md5-slice hashes, per-window (w=4) minima, first-seen distinct;
    sub-window docs keep one global min; <k tokens -> empty."""
    import hashlib

    import pyspark.sql.functions as F

    from demy_spark.operators.curation import winnow_fingerprints

    def model(text, k=4, w=4):
        toks = [t for t in text.strip().lower().split(" ") if t]
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
        ]
        if not hs:
            return []
        if len(hs) < w:
            return [min(hs)]
        out, seen = [], set()
        for i in range(len(hs) - w + 1):
            m = min(hs[i : i + w])
            if m not in seen:
                seen.add(m)
                out.append(m)
        return out

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short doc",
        "",
        "a b c d",
        "a b c d e f g",
        "x y " * 30,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, t string"
    )
    got = {
        r["id"]: r["fp"]
        for r in df.select(
            "id", winnow_fingerprints(F.col("t")).alias("fp")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert sorted(got[i]) == sorted(model(t)), (i, t)


def test_winnow_pairs_shared_run_guarantee(spark):
    """The winnowing theorem (k=4, w=4): documents sharing a run of
    k+w-1=7 tokens MUST share a fingerprint; disjoint docs must not
    pair."""
    from demy_spark.operators.curation import winnow_pairs

    run = "alpha beta gamma delta epsilon zeta eta"  # exactly 7 tokens
    df = spark.createDataFrame(
        [
            (1, f"prefix words here {run} and a suffix tail"),
            (2, f"other opening {run} different closing entirely"),
            (3, "completely unrelated content with no shared runs at all"),
        ],
        "id int, t string",
    )
    pairs = {
        (r["left_id"], r["right_id"]): r["shared_fingerprints"]
        for r in winnow_pairs(df, "id", "t", min_shared=1).collect()
    }
    assert any(k == (1, 2) for k in pairs)
    assert not any(3 in k for k in pairs)


def test_registered_domain_psl_spec(spark):
    """The publicsuffix.org matching spec, every rule kind: exact TLD,
    multi-label suffix, private-registry suffix, wildcard, exception
    (prevails over longer wildcard matches), the default * rule for
    unlisted TLDs, host == its own public suffix -> NULL registered
    domain, and canonicalization (case, trailing dot). NULL host ->
    NULL fields."""
    from demy_spark.functions.domains import registered_domain

    cases = [
        (1, "www.src1.com", "com", "src1.com"),
        (2, "a.b.src1.co.uk", "co.uk", "src1.co.uk"),
        (3, "src1.github.io", "github.io", "src1.github.io"),
        (4, "x3.w.src1.ck", "src1.ck", "w.src1.ck"),       # *.ck
        (5, "www.ck", "ck", "www.ck"),                     # !www.ck
        (6, "b.www.ck", "ck", "www.ck"),                   # exception beats *.ck
        (7, "src1.ck", "src1.ck", None),                   # host == suffix
        (8, "src1.xyz", "xyz", "src1.xyz"),                # default * rule
        (9, "xyz", "xyz", None),                           # bare unlisted TLD
        (10, "WWW.SRC1.COM.", "com", "src1.com"),          # case + trailing dot
        (11, None, None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _, _ in cases], "id int, host string"
    )
    got = {
        r["id"]: (r["d"]["public_suffix"], r["d"]["registered_domain"])
        for r in df.select("id", registered_domain("host").alias("d")).collect()
    }
    for i, _, ps, reg in cases:
        assert got[i] == (ps, reg), (i, got[i], (ps, reg))


PSL_FILE = """\
// This fixture is the PUBLISHED public_suffix_list.dat format:
// comment lines, blank separators, section markers, every rule kind.

// ===BEGIN ICANN DOMAINS===
// ac : https://en.wikipedia.org/wiki/.ac
ac
com.ac
edu.ac
gov.ac
// au : multi-level registry
au
com.au
net.au
org.au
edu.au
// ck : wildcard family with exception
*.ck
!www.ck
// jp : deep registry
jp
ac.jp
ad.jp
co.jp
ed.jp
go.jp
ne.jp
or.jp
// uk
uk
ac.uk
co.uk
gov.uk
ltd.uk
me.uk
net.uk
org.uk
plc.uk
// generic TLDs
com
net
org
info
io
xyz
// ===END ICANN DOMAINS===

// ===BEGIN PRIVATE DOMAINS===
// GitHub : https://github.io
github.io
githubusercontent.com
// Amazon S3
s3.amazonaws.com
s3.dualstack.us-east-1.amazonaws.com
// Fastly
a.ssl.fastly.net
global.ssl.fastly.net
// ===END PRIVATE DOMAINS===
"""


def test_load_psl_rules_parses_published_format(tmp_path):
    """load_psl_rules (VERDICT r6 task 4): comments and blanks are
    skipped, rules read to first whitespace + lowercased, section
    markers honored."""
    import pytest

    from demy_spark.functions.domains import load_psl_rules

    p = tmp_path / "public_suffix_list.dat"
    # trailing whitespace + mixed case exercise the to-first-token rule
    p.write_text(PSL_FILE.replace("\ncom\n", "\nCOM  \n"), encoding="utf-8")
    rules = load_psl_rules(str(p))
    assert len(rules) == 40
    assert "com" in rules and "*.ck" in rules and "!www.ck" in rules
    assert "github.io" in rules
    assert not any(r.startswith("//") for r in rules)
    icann = load_psl_rules(str(p), section="icann")
    private = load_psl_rules(str(p), section="private")
    assert set(icann) | set(private) == set(rules)
    assert "github.io" in private and "github.io" not in icann
    assert "co.uk" in icann and "co.uk" not in private
    with pytest.raises(ValueError, match="section"):
        load_psl_rules(str(p), section="nope")


def test_q131_formulation_at_file_parsed_rule_width(spark, sf_dir, tmp_path):
    """The q131 rollup replayed end-to-end over a load_psl_rules()
    file parse (40 rules vs the 14-rule registered sample): the
    engine's closure-dict UDF and the oracle's relational replay must
    agree at the wider rule count too (VERDICT r6 task 4)."""
    import os

    import duckdb

    from demy_spark.functions.domains import load_psl_rules
    from demy_spark.queries import _q131_frame, _q131_sql

    p = tmp_path / "psl.dat"
    p.write_text(PSL_FILE, encoding="utf-8")
    rules = load_psl_rules(str(p))
    assert len(rules) > 30

    spark_pdf = _q131_frame(spark, sf_dir, rules).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    duck_pdf = con.execute(_q131_sql(rules)).fetchdf()
    cols = sorted(spark_pdf.columns)
    assert cols == sorted(duck_pdf.columns)
    s = sorted(map(tuple, spark_pdf[cols].fillna(-1).itertuples(index=False)))
    d = sorted(map(tuple, duck_pdf[cols].fillna(-1).itertuples(index=False)))
    assert s == d


def test_blocklist_gate_matches_on_reg_domain_and_bare_host(spark):
    """blocklist_gate (q137): a listed registered domain blocks every
    host under it; a bare-host entry (host == its own public suffix,
    NULL registered domain) matches via the coalesce key; unlisted
    domains and NULL hosts pass with keep=true."""
    from demy_spark.functions.domains import blocklist_gate

    df = spark.createDataFrame(
        [
            (1, "www.bad.com"),          # blocked via reg domain bad.com
            (2, "deep.sub.bad.com"),     # ...any depth under it
            (3, "good.com"),             # unlisted -> keep
            (4, "evil.ck"),              # bare host entry (reg domain NULL)
            (5, "BAD.COM."),             # canonicalization on the key
            (6, None),                   # NULL host -> keep, NULL fields
        ],
        "id int, host string",
    )
    bl = spark.createDataFrame(
        [("bad.com", "ads"), ("evil.ck", "malware")], "domain string, category string"
    )
    rows = {r["id"]: r for r in blocklist_gate(df, "host", bl).collect()}
    assert rows[1]["category"] == "ads" and not rows[1]["keep"]
    # multi-category listing (standard in UT1) must stay row-preserving:
    # one output row, lexicographically-first category (code-review r7)
    bl_multi = spark.createDataFrame(
        [("bad.com", "redirector"), ("bad.com", "adult")],
        "domain string, category string",
    )
    out_multi = blocklist_gate(df, "host", bl_multi).collect()
    assert len(out_multi) == df.count()
    multi_rows = {r["id"]: r for r in out_multi}
    assert multi_rows[1]["category"] == "adult" and not multi_rows[1]["keep"]
    assert rows[2]["category"] == "ads"
    assert rows[3]["category"] is None and rows[3]["keep"]
    assert rows[4]["category"] == "malware" and rows[4]["reg_domain"] is None
    assert rows[5]["category"] == "ads"
    assert rows[6]["category"] is None and rows[6]["keep"]
    # broadcast=False (the documented >~2M-domain UT1 fallback) must be
    # a pure plan change: identical rows, no forced-broadcast hint
    un = blocklist_gate(df, "host", bl, broadcast=False)
    assert {tuple(r) for r in un.collect()} == {
        tuple(r) for r in rows.values()
    }
    assert "ResolvedHint" not in un._jdf.queryExecution().analyzed().toString()


def test_holdout_split_leakage_free_and_deterministic(spark):
    """Same key -> same side, always (the leakage-free property);
    valid_permille bounds the expected valid share; assignment is a
    pure function of the key (stable across runs and row order)."""
    import pyspark.sql.functions as F

    from demy_spark.functions.domains import holdout_split

    rows = [(i, f"site{i % 40}.com") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, dom string")
    out = df.select("id", "dom", holdout_split("dom", valid_permille=250).alias("s"))
    # every domain maps to exactly ONE split
    per_dom = out.groupBy("dom").agg(F.countDistinct("s").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_dom)
    # re-evaluation (new plan, different order) gives identical sides
    again = {
        r["dom"]: r["s"]
        for r in df.orderBy(F.desc("id"))
        .select("dom", holdout_split("dom", valid_permille=250).alias("s"))
        .collect()
    }
    first = {r["dom"]: r["s"] for r in out.collect()}
    assert first == again
    # 25% target over 40 domains: loose sanity bounds, not exactness
    n_valid = sum(1 for s in first.values() if s == "valid")
    assert 2 <= n_valid <= 20


def test_blocklist_gate_bloom_strategy_is_identical(spark):
    """strategy='bloom' (the wide-UT1 path, VERDICT r8 task 3) must be
    a pure plan change: row-for-row identical to the broadcast leg on
    every edge the fixture carries (bare host, canonicalization, NULL
    host, multi-category listing), and the definite-miss leg must keep
    category NULL without consulting the blocklist."""
    from demy_spark.functions.domains import blocklist_gate

    df = spark.createDataFrame(
        [
            (1, "www.bad.com"),
            (2, "deep.sub.bad.com"),
            (3, "good.com"),
            (4, "evil.ck"),
            (5, "BAD.COM."),
            (6, None),
            (7, "another.fine.org"),
        ],
        "id int, host string",
    )
    bl = spark.createDataFrame(
        [("bad.com", "ads"), ("bad.com", "adult"), ("evil.ck", "malware")],
        "domain string, category string",
    )
    ref = blocklist_gate(df, "host", bl)
    blm = blocklist_gate(df, "host", bl, strategy="bloom")
    assert sorted(blm.columns) == sorted(ref.columns)
    cols = sorted(ref.columns)
    assert {tuple(r) for r in blm.select(cols).collect()} == {
        tuple(r) for r in ref.select(cols).collect()
    }
    # a SATURATED block forces false positives (one 512-bit block, a
    # dense blocklist sets ~every bit, so every unlisted corpus domain
    # probes maybe=true): the survivors' exact join must still return
    # category NULL / keep=true for them
    bl_dense = bl.unionByName(
        spark.createDataFrame(
            [(f"filler{i}.net", "ads") for i in range(200)],
            "domain string, category string",
        )
    )
    ref_dense = blocklist_gate(df, "host", bl_dense)
    fp = blocklist_gate(
        df, "host", bl_dense, strategy="bloom", bloom_m_bits=512
    )
    assert {tuple(r) for r in fp.select(cols).collect()} == {
        tuple(r) for r in ref_dense.select(cols).collect()
    }
    with pytest.raises(ValueError, match="unknown blocklist_gate strategy"):
        blocklist_gate(df, "host", bl, strategy="bogus")


def test_blocklist_gate_bloom_probe_is_jvm_broadcast_joins(spark):
    """Plan shape: the split-block bloom verdict must be ONE broadcast
    hash join per corpus leg against the constant-size block frame —
    all JVM (no Python/Arrow eval in the plan, no driver collect), and
    the wide blocklist itself must never be broadcast-hinted (only the
    block frame is; that compression is the point of the sketch)."""
    from demy_spark.functions.domains import blocklist_gate

    df = spark.createDataFrame(
        [(1, "good.com", "good.com")], "id int, host string, reg_domain string"
    )
    bl = spark.createDataFrame([("bad.com", "ads")], "domain string, category string")
    # reg_domain materialized upstream (the q131 shape): with the PSL
    # UDF out of the way the WHOLE gate plan must be JVM-side
    out = blocklist_gate(
        df, "host", bl, strategy="bloom", bloom_n_hashes=7,
        reg_domain_col="reg_domain",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # miss leg + survivor leg each probe the block frame once
    assert plan.count("BroadcastHashJoin") >= 2
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    analyzed = out._jdf.queryExecution().analyzed().toString()
    # hints exist only on the block frame, never on the blocklist
    import re as _re

    hints = list(_re.finditer(r"ResolvedHint", analyzed))
    assert hints, "expected the block frame to be broadcast-hinted"
    for m in hints:
        ctx = analyzed[m.start() : m.start() + 300]
        assert "_blk_" in ctx or "_block_words_" in ctx, ctx


def test_blocklist_gate_auto_dispatch(spark):
    """strategy='auto' (the new default, VERDICT r9 task 5): the gate
    counts the deduped blocklist and picks the measured-fastest leg —
    broadcast at fixture width, the split-block bloom above the 2M
    boundary (asserted via plan at 4M synthetic domains: the bloom
    probe's xxhash64 block derivation appears; at small width it must
    not). Output identity on the small fixture pins that auto is a
    pure plan change."""
    import pyspark.sql.functions as F

    from demy_spark.functions.domains import blocklist_gate

    df = spark.createDataFrame(
        [(1, "www.bad.com"), (2, "good.com"), (3, None)],
        "id int, host string",
    )
    bl = spark.createDataFrame(
        [("bad.com", "ads")], "domain string, category string"
    )
    # small width: auto == broadcast, row-identical, no bloom plumbing
    auto = blocklist_gate(df, "host", bl)  # default strategy is auto
    ref = blocklist_gate(df, "host", bl, strategy="broadcast")
    cols = sorted(ref.columns)
    assert {tuple(r) for r in auto.select(cols).collect()} == {
        tuple(r) for r in ref.select(cols).collect()
    }
    assert "xxhash64" not in auto._jdf.queryExecution().executedPlan().toString()
    # 4M-domain width: auto must pick the bloom leg (plan-visible:
    # block-frame broadcast joins + xxhash64 derivation, and the wide
    # list itself never broadcast-hinted)
    wide = spark.range(4_000_000).select(
        F.concat(F.lit("d"), F.col("id"), F.lit(".com")).alias("domain"),
        F.lit("ads").alias("category"),
    )
    probe = spark.createDataFrame(
        [(1, "d7.com", "d7.com"), (2, "good.org", "good.org")],
        "id int, host string, reg_domain string",
    )
    out = blocklist_gate(probe, "host", wide, reg_domain_col="reg_domain")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan, "auto at 4M width must take the bloom leg"
    assert plan.count("BroadcastHashJoin") >= 2
    analyzed = out._jdf.queryExecution().analyzed().toString()
    import re as _re

    for m in _re.finditer(r"ResolvedHint", analyzed):
        ctx = analyzed[m.start() : m.start() + 300]
        assert "_blk_" in ctx or "_block_words_" in ctx, ctx
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["category"] == "ads" and not rows[1]["keep"]
    assert rows[2]["category"] is None and rows[2]["keep"]
