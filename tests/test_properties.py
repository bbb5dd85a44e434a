"""Property-based tests (hypothesis) for the pure-Python text kernels —
invariants that hold for ANY input, not just golden fixtures. The
reference has no property tests at all (SURVEY §5); these pin the
contracts its offset-sensitive consumers rely on.
"""

from __future__ import annotations

from hypothesis import given, settings
from pyspark.sql import functions as F
from hypothesis import strategies as st

from demy_spark.functions.text import _simplify_char, _split_doc_py

# printable-ish text incl. accents, elisions, URLs-ish fragments
TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z"), max_codepoint=0x2FF
    ),
    max_size=200,
)


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_split_doc_partitions_the_text(s):
    """The interleaved word/non-word records partition the ORIGINAL
    string exactly: concatenating slices in index order reproduces it,
    simplified slices are length-preserving, indexes are sequential,
    and phrase ids grow by at most 1 per token."""
    recs = _split_doc_py(s, links_as_separators=False)
    assert "".join(r["word"] for r in recs) == s
    for r in recs:
        assert len(r["simplified"]) == len(r["word"])
    assert [r["index"] for r in recs] == list(range(len(recs)))
    pids = [r["phrase_id"] for r in recs]
    assert all(0 <= b - a <= 1 for a, b in zip(pids, pids[1:]))
    assert not pids or pids[0] == 0
    # word/non-word runs must alternate
    flags = [r["is_word"] for r in recs]
    assert all(a != b for a, b in zip(flags, flags[1:]))


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_split_doc_word_runs_are_letters(s):
    """Every is_word record's simplified slice is pure letters; every
    non-word simplified slice is pure spaces."""
    for r in _split_doc_py(s, links_as_separators=False):
        if r["is_word"]:
            assert r["simplified"].isalpha(), r
        else:
            assert set(r["simplified"]) <= {" "}, r


@given(st.characters(max_codepoint=0x2FF), st.characters(max_codepoint=0x2FF))
@settings(max_examples=500, deadline=None)
def test_simplify_char_is_single_char_and_stable(c, nxt):
    """The per-char simplify map always yields exactly one char (offset
    preservation depends on it) and is idempotent on its own output
    when the lookahead is not an apostrophe."""
    out = _simplify_char(c, nxt.lower())
    assert len(out) == 1
    again = _simplify_char(out, "X")
    assert again == out or out.lower() != out  # lowercase fixpoint


def test_delete_variants_batch_properties(spark):
    """SymSpell blocking invariants over a seeded random vocabulary:
    every emitted variant is within max_deletes character deletions of
    its token (levenshtein bound), the token itself is always included,
    and the set is duplicate-free."""
    import random

    from pyspark.sql import functions as F

    from demy_spark.operators.fuzzy_lookup import _delete_variants

    rng = random.Random(42)
    words = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 8)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(w,) for w in words], ["tok"])
    out = df.select(
        "tok",
        F.explode(_delete_variants(F.col("tok"), 2)).alias("var"),
        F.size(_delete_variants(F.col("tok"), 2)).alias("n_vars"),
        F.size(
            F.array_distinct(_delete_variants(F.col("tok"), 2))
        ).alias("n_distinct"),
    ).withColumn("lev", F.levenshtein("tok", "var"))
    bad = out.where(
        (F.col("lev") > 2)
        | (F.length("var") < F.length("tok") - 2)
        | (F.col("n_vars") != F.col("n_distinct"))
    )
    assert bad.count() == 0
    has_self = out.where(F.col("var") == F.col("tok")).select("tok").distinct()
    assert has_self.count() == len(set(words))


def test_sql_and_python_simplify_agree(spark):
    """The codegen'd translate/regexp simplify chain (q48's path) and
    the per-char Python map (q77's splitDoc path) implement the same
    Word.simplifyText — they must agree char-for-char on inputs where
    lowercasing is 1:1."""
    import random

    from pyspark.sql import functions as F

    from demy_spark.functions.text import _simplify_char, simplify_text

    rng = random.Random(7)
    alphabet = "abcdELÀ 'l-d'éœçøñ;q.u"
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {
        r["s"]: r["out"]
        for r in df.select("s", simplify_text("s").alias("out")).collect()
    }

    def py_simplify(s: str) -> str:
        return "".join(
            _simplify_char(c, s[i + 1].lower() if i + 1 < len(s) else "X")
            for i, c in enumerate(s)
        )

    for s in strings:
        assert got[s] == py_simplify(s), repr(s)


def test_norm_tokens_matches_duckdb_contract(spark):
    """textstats.norm_tokens must tokenize EXACTLY like the oracle-side
    `string_split(trim(lower(text)), ' ')` on adversarial whitespace —
    tabs, newlines, runs of spaces, unicode — not just the single-
    spaced fixtures. Every oracle-backed text operator rides on this."""
    import duckdb

    from demy_spark.functions.textstats import norm_tokens

    texts = [
        "plain old text",
        "  leading and trailing  ",
        "tab\tseparated\ttokens",
        "newline\nseparated\nlines",
        "mixed \t \n whitespace   runs",
        "UPPER Case MiXeD",
        "",
        "   ",
        "\t\n",
        "accents éèà ünïcode",
        "a  b   c    d",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", norm_tokens("t").alias("toks")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT list_filter(string_split(trim(lower(?)), ' '), x -> x <> '')",
            [t],
        ).fetchone()[0]
        assert got[i] == want, (i, texts[i], got[i], want)


def test_strip_spans_consistent_with_span_detection(spark, sf_dir):
    """The apply step and the detect step must agree on every corpus:
    per-document tokens_removed == the summed span_tokens, and the
    cleaned text retokenizes to exactly n_tokens - tokens_removed."""
    from demy_spark.functions.textstats import norm_tokens
    from demy_spark.operators.subdoc import duplicated_spans, strip_duplicated_spans
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = {
        r["doc_id"]: r["total"]
        for r in duplicated_spans(docs, "doc_id", "text", k=5)
        .groupBy("doc_id")
        .agg(F.sum("span_tokens").alias("total"))
        .collect()
    }
    stripped = strip_duplicated_spans(docs, "doc_id", "text", k=5)
    rows = stripped.select(
        "doc_id",
        "n_tokens",
        "tokens_removed",
        F.size(norm_tokens("text_clean")).alias("n_clean"),
    ).collect()
    assert rows
    for r in rows:
        assert r["tokens_removed"] == spans.get(r["doc_id"], 0)
        assert r["n_clean"] == r["n_tokens"] - r["tokens_removed"]


# ---------------------------------------------------------------------------
# Oracle-contract fuzzing: the three conventions every DuckDB-gated
# operator rides on (memory: oracle-contract; SKILL.md Gotchas) are
# load-bearing for all 110 oracles. Each test hands a hypothesis-
# generated corpus to BOTH engines in one batch per example (a Spark
# job per string would be minutes, not seconds).
# ---------------------------------------------------------------------------

# whitespace-heavy unicode incl. control chars (tabs/newlines are Cc)
# and the FULL Zs trim set (max_codepoint covers U+3000, the last trim
# character, so the fuzz can actually exercise every member).
# Excluded: the three KNOWN lower() divergences between the engines
# (exhaustive scan of 0x20-0x30FF) — U+0130 İ (Java: 'i'+combining
# dot, DuckDB: 'i'), U+1C89 and U+2C2F (case pairs from Unicode
# versions utf8proc's table predates; DuckDB maps them to themselves).
# test_known_lowercase_divergences pins the list. Fixture text is
# ASCII, so no oracle rides on them.
_CONTRACT_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Z", "Cc"),
        max_codepoint=0x30FF,
        exclude_characters="İ\u1c89Ⱟ",
    ),
    max_size=60,
)


def test_known_lowercase_divergences(spark):
    """The ONLY lower() disagreements between Spark (Java/ICU) and
    DuckDB (utf8proc) in 0x20-0x30FF, found by exhaustive scan: İ
    (U+0130, Turkish dotted capital I), U+1C89 and Ⱟ (U+2C2F — case
    pairs added in Unicode versions utf8proc's table predates).
    Pinned so an engine upgrade that changes the set is noticed — if
    this test fails, re-run the scan and update the fuzz exclusion
    list above."""
    import duckdb

    cases = [(0, "İ"), (1, "\u1c89"), (2, "Ⱟ")]
    df = spark.createDataFrame(cases, "i long, c string")
    got = {r["i"]: r["l"] for r in df.select("i", F.lower("c").alias("l")).collect()}
    con = duckdb.connect()
    duck = {
        i: con.execute("SELECT lower(?)", [c]).fetchone()[0] for i, c in cases
    }
    assert got[0] == "i̇" and duck[0] == "i"
    assert got[1] == "\u1c8a" and duck[1] == "\u1c89"
    assert got[2] == "ⱟ" and duck[2] == "Ⱟ"


@given(st.lists(_CONTRACT_TEXT, min_size=1, max_size=25))
@settings(max_examples=8, deadline=None)
def test_norm_tokens_contract_fuzz(spark, corpus):
    """Fuzzed twin of the fixed-case contract test: norm_tokens must
    equal DuckDB `string_split(trim(lower(x)), ' ')` (empties removed)
    on ARBITRARY unicode/whitespace text, not just curated cases."""
    import duckdb

    from demy_spark.functions.textstats import norm_tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "i long, t string"
    )
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", norm_tokens("t").alias("toks")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(corpus):
        want = con.execute(
            "SELECT list_filter(string_split(trim(lower(?)), ' '), x -> x <> '')",
            [t],
        ).fetchone()[0]
        assert got[i] == want, (repr(t), got[i], want)


@given(st.lists(_CONTRACT_TEXT, min_size=1, max_size=25))
@settings(max_examples=8, deadline=None)
def test_ws_norm_tokens_contract_fuzz(spark, corpus):
    """ws_norm_tokens (the quality-heuristics tokenizer: ASCII
    whitespace runs collapsed before the single-space contract) must
    equal its documented DuckDB replay on arbitrary input — the
    collapse class is explicit because Java \\s and RE2 \\s disagree
    on \\x0B."""
    import duckdb

    from demy_spark.functions.textstats import ws_norm_tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "i long, t string"
    )
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", ws_norm_tokens("t").alias("toks")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(corpus):
        want = con.execute(
            r"SELECT list_filter(string_split(trim(lower("
            r"regexp_replace(?, '[ \t\n\r\f\x0B]+', ' ', 'g'))), ' '),"
            r" x -> x <> '')",
            [t],
        ).fetchone()[0]
        assert got[i] == want, (repr(t), got[i], want)


@given(
    st.lists(_CONTRACT_TEXT, min_size=1, max_size=25),
    st.integers(min_value=1, max_value=18),
    st.integers(min_value=1, max_value=15),
)
@settings(max_examples=8, deadline=None)
def test_md5_long_contract_fuzz(spark, corpus, start, length):
    """dedup._md5_long and queries._md5_long_sql must produce the same
    long for ANY string and ANY hex slice (start 1-18, len<=15 keeps
    it under 60 bits) — every minhash/simhash oracle bit rides on it."""
    import duckdb

    from demy_spark.operators.dedup import _md5_long
    from demy_spark.queries import _md5_long_sql

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "i long, t string"
    )
    got = {
        r["i"]: r["h"]
        for r in df.select(
            "i", _md5_long(F.col("t"), start, length).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(corpus):
        want = con.execute(
            f"SELECT {_md5_long_sql('?', start, length)}", [t]
        ).fetchone()[0]
        assert got[i] == want, (repr(t), start, length, got[i], want)


@given(
    st.lists(
        st.floats(
            allow_nan=False,
            allow_infinity=False,
            width=64,
            min_value=-1e9,
            max_value=1e9,
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_micro_quantization_contract_fuzz(spark, xs):
    """Integer quantization (`floor(x * 1e6)` as BIGINT — micro-cents/
    micro-nats) must agree bit-for-bit between Spark and DuckDB for any
    finite double in the plausible value range, so quantize-before-
    compare/sum decisions can never flip between engines."""
    import duckdb

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got = {
        r["i"]: r["q"]
        for r in df.select(
            "i", F.floor(F.col("x") * 1_000_000).cast("long").alias("q")
        ).collect()
    }
    con = duckdb.connect()
    for i, x in enumerate(xs):
        want = con.execute(
            "SELECT CAST(floor(? * 1000000) AS BIGINT)", [x]
        ).fetchone()[0]
        assert got[i] == want, (x.hex(), got[i], want)


def test_line_dedup_is_identity_below_threshold(spark):
    """With max_docs >= #docs nothing can exceed the frequency bound,
    so every document must round-trip unchanged (modulo the blank-line
    drop the contract documents)."""
    from demy_spark.operators.subdoc import line_dedup

    rows = [(1, "alpha\nbeta\ngamma"), (2, "alpha\nbeta"), (3, "alpha")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(docs, "doc_id", "text", max_docs=3).collect()}
    for i, text in rows:
        assert out[i]["text_clean"] == text
        assert out[i]["n_removed"] == 0


# char-split has no lower()/trim() in it, so the fuzz alphabet can go
# wider than _CONTRACT_TEXT: full astral range (surrogate-pair
# handling) and combining marks (category M), the dimensions the
# contract actually claims
_CHAR_SPLIT_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z", "Cc", "M", "S")
    ),
    max_size=60,
)


@given(st.lists(_CHAR_SPLIT_TEXT, min_size=1, max_size=25))
@settings(max_examples=8, deadline=None)
def test_char_split_contract_fuzz(spark, corpus):
    """The char-split convention the BPE oracles (q115/q116) and the
    q77 char-level replay ride on: Spark's EMPTY-pattern split
    `F.split(s, "")` must equal DuckDB `string_split(s, '')`
    codepoint-for-codepoint on arbitrary unicode — including astral
    chars and combining marks. This fuzz found the original lookahead
    formulation (`(?!^)` + remove-empties) shearing astral chars into
    lone UTF-16 surrogates; the empty-pattern split is the fix and
    even agrees on the empty string ([''] both sides)."""
    import duckdb

    chars = F.split(F.col("t"), "")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "i long, t string"
    )
    got = {
        r["i"]: r["cs"] for r in df.select("i", chars.alias("cs")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(corpus):
        want = con.execute("SELECT string_split(?, '')", [t]).fetchone()[0]
        assert got[i] == want, (repr(t), got[i], want)


def test_char_split_astral_and_combining_pinned(spark):
    """Deterministic pins for the char-split dimensions that matter
    most: an astral emoji (UTF-16 surrogate pair) stays ONE element on
    both engines, and a combining accent stays a SEPARATE codepoint
    (neither engine splits to grapheme clusters)."""
    import duckdb

    cases = [(0, "a\U0001f600b"), (1, "éx"), (2, "\U0001f600\U0001f600")]
    chars = F.split(F.col("t"), "")
    df = spark.createDataFrame(cases, "i long, t string")
    got = {r["i"]: r["cs"] for r in df.select("i", chars.alias("cs")).collect()}
    con = duckdb.connect()
    for i, t in cases:
        want = con.execute("SELECT string_split(?, '')", [t]).fetchone()[0]
        assert got[i] == want, (repr(t), got[i], want)
    assert got[0] == ["a", "\U0001f600", "b"]
    assert got[1] == ["e", "́", "x"]
    assert got[2] == ["\U0001f600", "\U0001f600"]


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "ab", "ba"]), max_size=12
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None)
def test_repetition_fractions_fuzz(spark, docs):
    """The positions-arithmetic `_run_stats` (sorted run starts ->
    zip_with length deltas) must equal a Counter-based model for ANY
    token sequence — including the all-duplicate, all-distinct and
    empty edges, the smallest-gram tie-break, and the 1.0 cap."""
    from collections import Counter

    from demy_spark.functions.textstats import (
        dup_ngram_char_fraction,
        top_ngram_char_fraction,
    )

    def model(tokens, n):
        grams = [
            " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
        ]
        norm_len = len(" ".join(tokens))
        if not grams or norm_len == 0:
            return 0.0, 0.0
        cnt = Counter(grams)
        m = max(cnt.values())
        g = min(g for g, c in cnt.items() if c == m)
        top = min(1.0, m * len(g) / norm_len)
        dupc = sum(c * len(g) for g, c in cnt.items() if c >= 2)
        dup = min(1.0, dupc / norm_len) if dupc > 0 else 0.0
        return top, dup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "i long, t string")
    sel = ["i"]
    for n in (1, 2, 3):
        sel.append(top_ngram_char_fraction("t", n).alias(f"top{n}"))
        sel.append(dup_ngram_char_fraction("t", n).alias(f"dup{n}"))
    got = {r["i"]: r for r in df.select(*sel).collect()}
    for i, toks in enumerate(docs):
        for n in (1, 2, 3):
            top, dup = model(toks, n)
            assert abs(got[i][f"top{n}"] - top) < 1e-9, (toks, n, "top")
            assert abs(got[i][f"dup{n}"] - dup) < 1e-9, (toks, n, "dup")


@given(
    st.lists(
        st.lists(st.sampled_from(["", "x", "y", "xx", "zz"]), max_size=10),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None)
def test_dup_line_fractions_fuzz(spark, docs):
    """Line-grain duplicate fractions vs the set-based model (empty
    lines excluded from both numerator and denominator)."""
    from demy_spark.functions.textstats import (
        dup_line_char_fraction,
        dup_line_fraction,
    )

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            dup_line_fraction("t").alias("f"),
            dup_line_char_fraction("t").alias("cf"),
        ).collect()
    }
    for i, lines in enumerate(docs):
        ne = [l for l in lines if l != ""]
        f = 1.0 - len(set(ne)) / len(ne) if ne else 0.0
        tc = sum(len(l) for l in ne)
        kc = sum(len(l) for l in set(ne))
        cf = (tc - kc) / tc if tc > 0 else 0.0
        assert abs(got[i]["f"] - f) < 1e-9, (lines, got[i]["f"], f)
        assert abs(got[i]["cf"] - cf) < 1e-9, (lines, got[i]["cf"], cf)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["'", "--", "\n", " ", "documents", "emb", "x", "FROM ", "WITH ", "''"]
        ),
        max_size=30,
    ).map("".join)
)
def test_mask_sql_spans_restore_is_identity(sql):
    """mask_sql_spans (the gate rewriter's lexer) must be losslessly
    restorable on ANY input — unterminated literals, comments
    containing quotes, quotes containing comment markers — and the
    masked text must contain no quote or comment characters outside
    placeholders (so renames can never touch masked spans)."""
    import re

    from demy_spark.queries import mask_sql_spans

    masked, spans = mask_sql_spans(sql)
    restored = re.sub(r"\x00(\d+)\x00", lambda m: spans[int(m.group(1))], masked)
    assert restored == sql
    bare = re.sub(r"\x00\d+\x00", "", masked)
    assert "'" not in bare and "--" not in bare
