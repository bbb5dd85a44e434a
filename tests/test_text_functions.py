"""Golden tests for the text-normalization kit (reference semantics:
Word.scala:34-55, TextTools.scala:10-35, TweetCleaner.scala:28-47,
SentenceBuilder.scala:23-68) and the GroupBy vector reductions."""

from __future__ import annotations

from pyspark.sql import functions as F

from demy_spark.functions.text import (
    blank_urls,
    clean_tweet,
    double_acronyms,
    phonetic_simplify,
    simplify_text,
    split_sentences,
    strip_urls,
    tokenize,
)
from demy_spark.operators.groupby import group_by_reduce


def _one(spark, text, col_fn):
    return spark.createDataFrame([(text,)], ["t"]).select(col_fn("t").alias("o")).first()["o"]


def test_simplify_text_accents_and_elision(spark):
    assert _one(spark, "L'Hôpital Général", simplify_text) == "  hopital general"
    # offsets preserved: elision becomes two spaces, - and ' become spaces
    assert _one(spark, "d'Île-de-France", simplify_text) == "  ile de france"
    # translate is a 1:1 char map: ligatures fold to one base letter
    assert _one(spark, "œuvre cœur æquo", simplify_text) == "euvre ceur aquo"


def test_phonetic_simplify_foldings(spark):
    assert _one(spark, "Quimper", phonetic_simplify) == "cimper"
    assert _one(spark, "vallée", phonetic_simplify) == "balee"
    assert _one(spark, "Wassy", phonetic_simplify) == "basy"
    assert _one(spark, "zigzag", phonetic_simplify) == "sijsaj"


def test_strip_and_blank_urls(spark):
    s = "see https://ex.com/a?b=1 now"
    assert _one(spark, s, strip_urls) == "see   now"
    blanked = _one(spark, s, blank_urls)
    assert len(blanked) == len(s)  # offsets preserved
    assert blanked.startswith("see ") and blanked.endswith(" now")
    assert set(blanked[4:-4]) == {" "}


def test_clean_tweet(spark):
    out = _one(
        spark,
        "RT @bob: flu season http://t.co/xyz #health :(",
        lambda c: clean_tweet(c, sentiment_map=[(":(", "sad")]),
    )
    toks = out.split()
    assert "user" in toks and "link" in toks and "sad" in toks
    assert "RT" not in toks and "@bob:" not in " ".join(toks)
    assert "health" in toks  # hashtag stripped, word kept


def test_tokenize_and_double_acronyms(spark):
    df = spark.createDataFrame([("Flu in TX, 42 cases!",)], ["t"])
    toks = df.select(tokenize("t", lowercase=False).alias("o")).first()["o"]
    assert toks == ["Flu", "in", "TX", "42", "cases"]
    doubled = df.select(
        double_acronyms(tokenize("t", lowercase=False)).alias("o")
    ).first()["o"]
    assert doubled == ["Flu", "in", "TXTX", "42", "cases"]


def test_split_sentences_hard_and_soft_breaks(spark):
    # soft break fires once more than min_phrase_size words completed
    text = "first phrase here now. second phrase there\nthird one"
    parts = _one(spark, text, split_sentences)
    assert "".join(parts) == text  # every char preserved
    assert len(parts) == 3


def test_group_by_reduce_scalars_and_vectors(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 2.0, [1.0, 5.0]),
            ("a", 3, 4.0, [2.0, 3.0]),
            ("b", 7, 1.0, [0.0, 1.0]),
        ],
        ["k", "x", "y", "v"],
    )
    out = group_by_reduce(
        df,
        ["k"],
        {"x": "max", "y": "sum", "v": "max"},
        vector_cols=["v"],
    )
    got = {r["k"]: r for r in out.collect()}
    assert got["a"]["x"] == 3 and got["a"]["y"] == 6.0
    assert got["a"]["v"] == [2.0, 5.0]  # element-wise max
    assert got["b"]["v"] == [0.0, 1.0]


def test_word2vec_fit_roundtrip(spark):
    from demy_spark.features import fit_word2vec

    docs = spark.createDataFrame(
        [(["spark", "query", "engine"],), (["spark", "fast", "engine"],)] * 5,
        ["toks"],
    )
    vecs = fit_word2vec(docs, "toks", dim=8, min_count=1)
    rows = {r["word"]: r["vector"] for r in vecs.collect()}
    assert set(rows) == {"spark", "query", "engine", "fast"}
    assert all(len(v) == 8 for v in rows.values())


def test_word2vec_seeded_fit_is_reproducible(spark):
    """Seeded-fit golden: with numPartitions=1 and maxIter=1 (the
    defaults) the fit is a pure function of (corpus, seed) — two
    independent fits produce bit-identical vectors and identical
    nearest-synonym rankings; a different seed produces different
    vectors over the same vocabulary."""
    from demy_spark.features import fit_word2vec
    from demy_spark.functions.vectors import cosine_similarity

    corpus = [
        (["spark", "query", "engine", "runs", "fast"],),
        (["query", "engine", "plans", "joins"],),
        (["spark", "runs", "distributed", "joins"],),
    ] * 8
    docs = spark.createDataFrame(corpus, ["toks"])

    def fit(seed):
        return {
            r["word"]: tuple(r["vector"])
            for r in fit_word2vec(
                docs, "toks", dim=6, min_count=1, seed=seed
            ).collect()
        }

    a, b = fit(7), fit(7)
    assert a == b  # bit-identical refit
    other = fit(99)
    assert set(other) == set(a) and other != a  # seed actually matters

    # synonym ranking from the fitted table is likewise reproducible
    vecs = fit_word2vec(docs, "toks", dim=6, min_count=1, seed=7)
    q = vecs.where(F.col("word") == "spark").select(
        F.col("vector").alias("_q_")
    )
    ranked = [
        r["word"]
        for r in vecs.where(F.col("word") != "spark")
        .crossJoin(F.broadcast(q))
        .select("word", cosine_similarity("vector", "_q_").alias("sim"))
        .orderBy(F.col("sim").desc(), "word")
        .collect()
    ]
    vecs2 = fit_word2vec(docs, "toks", dim=6, min_count=1, seed=7)
    q2 = vecs2.where(F.col("word") == "spark").select(
        F.col("vector").alias("_q_")
    )
    ranked2 = [
        r["word"]
        for r in vecs2.where(F.col("word") != "spark")
        .crossJoin(F.broadcast(q2))
        .select("word", cosine_similarity("vector", "_q_").alias("sim"))
        .orderBy(F.col("sim").desc(), "word")
        .collect()
    ]
    assert ranked == ranked2 and len(ranked) == 7


def test_split_doc_records_golden(spark):
    """Word.splitDoc golden: interleaved word/non-word runs, original
    slices preserved (URL kept in the orig slice though blanked for
    segmentation), phrase ids increment AFTER separator tokens."""
    from demy_spark.functions.text import split_doc_records

    df = spark.createDataFrame(
        [(1, "L'Été; voir http://x.co/a ok")], "doc_id int, s string"
    )
    rows = [
        tuple(r)
        for r in split_doc_records(df, "doc_id", "s")
        .orderBy("index")
        .select("word", "simplified", "is_word", "index", "phrase_id")
        .collect()
    ]
    assert rows == [
        ("L'", "  ", False, 0, 0),
        ("Été", "ete", True, 1, 0),
        # the separator token itself stays in phrase 0...
        ("; ", "  ", False, 2, 0),
        # ...and the URL is blanked for segmentation but kept in word,
        # so its '.' advances the phrase for the tokens AFTER it
        ("voir", "voir", True, 3, 1),
        (" http://x.co/a ", "               ", False, 4, 1),
        ("ok", "ok", True, 5, 2),
    ]


def test_split_doc_empty_and_null(spark):
    from demy_spark.functions.text import split_doc_records

    df = spark.createDataFrame([(1, None), (2, "")], "doc_id int, s string")
    assert split_doc_records(df, "doc_id", "s").count() == 0


def test_sparse_merge_and_dot(spark):
    """SemanticVector map kernels: union-of-indices sum; dot without
    densification (linalg/implicits.scala:105-152)."""
    from demy_spark.functions.vectors import sparse_dot, sparse_merge

    df = spark.createDataFrame(
        [(1,)], "id int"
    ).select(
        F.create_map(F.lit(0), F.lit(2), F.lit(3), F.lit(5)).alias("a"),
        F.create_map(F.lit(3), F.lit(7), F.lit(9), F.lit(1)).alias("b"),
    )
    row = df.select(
        sparse_merge("a", "b").alias("m"), sparse_dot("a", "b").alias("d")
    ).collect()[0]
    assert dict(row["m"]) == {0: 2, 3: 12, 9: 1}
    assert row["d"] == 35.0  # only the shared key 3 contributes: 5*7


def test_redact_pii(spark):
    from demy_spark.functions.text import redact_pii

    rows = [
        ("mail me at jane.doe+x@corp.example.org please",
         "mail me at <EMAIL> please"),
        ("call +331 5550 1234 now", "call <PHONE> now"),
        ("host 192.168.001.250 up", "host <IP> up"),
        ("a1@b.co and 10.0.0.1 and +12 34567890",
         "<EMAIL> and <IP> and <PHONE>"),
        ("no pii here just words", "no pii here just words"),
        ("short digits 12345 stay", "short digits 12345 stay"),
    ]
    df = spark.createDataFrame(rows, ["t", "want"]).select(
        "want", redact_pii("t").alias("got")
    )
    for r in df.collect():
        assert r["got"] == r["want"], r


def test_dup_ngram_fraction(spark):
    import pyspark.sql.functions as F

    from demy_spark.functions.textstats import dup_ngram_fraction

    rows = [
        ("a b a b a b", 3 / 5),   # bigrams: ab ba ab ba ab -> 2 distinct of 5
        ("a b c d", 0.0),
        ("a", 0.0),
        ("", 0.0),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["t"]).select(
        F.round(dup_ngram_fraction("t", 2), 6).alias("f")
    )
    got = [r["f"] for r in df.collect()]
    assert got == [round(w, 6) for _, w in rows]


def test_gopher_rules_flags(spark):
    import pyspark.sql.functions as F

    from demy_spark.functions.textstats import gopher_rules

    good = "the quick brown fox jumps over it and runs far away today"
    short = "the end"
    gibberish = "zxqwv bnmpl kjhgf dsapo iuytr qwert zxcvb plmok njibh uhygv"
    spammy = ("the deal " * 20).strip()
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, gibberish), (4, spammy)], ["id", "t"]
    ).select("id", gopher_rules("t").alias("r"))
    r = {x["id"]: x["r"] for x in df.collect()}
    assert r[1]["keep"]
    assert not r[2]["ok_words"] and not r[2]["keep"]
    assert not r[3]["has_stopword"] and not r[3]["keep"]
    assert not r[4]["ok_dup2"] and not r[4]["keep"]


def test_quality_heuristics_handle_multiline_documents(spark):
    """language_id / stopword_ratio / gopher_rules tokenize on EVERY
    whitespace run (ws_norm_tokens): a newline/tab-separated document
    must score like its single-spaced twin, not collapse into glued
    tokens that zero the stopword signals."""
    from demy_spark.functions.textstats import (
        gopher_rules,
        language_id,
        stopword_ratio,
        token_count,
    )

    flat = "the cat sat on the mat and it was warm in the sun for hours"
    multi = flat.replace(" sat ", "\nsat\t").replace(" was ", "\n\nwas ")
    df = spark.createDataFrame([(1, flat), (2, multi)], "i long, t string")
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            language_id("t").alias("lang"),
            stopword_ratio("t").alias("sw"),
            token_count("t").alias("n"),
            gopher_rules("t", min_words=5)["keep"].alias("keep"),
        ).collect()
    }
    assert rows[1]["lang"] == rows[2]["lang"] == "en"
    assert rows[1]["n"] == rows[2]["n"]
    assert abs(rows[1]["sw"] - rows[2]["sw"]) < 1e-9
    assert rows[1]["keep"] and rows[2]["keep"]


def test_split_doc_builtin_parity(spark, sf_dir):
    """The builtin higher-order formulation must reproduce the pandas
    UDF exactly — on the goldens' edge shapes AND on the real fixture
    corpus (accents, URLs, newlines, l'/d' elision, empty/null)."""
    from demy_spark.functions.text import (
        split_doc_records,
        split_doc_records_builtin,
    )

    edge = spark.createDataFrame(
        [
            (1, "L'Été; voir http://x.co/a ok"),
            (2, None),
            (3, ""),
            (4, "d'abord\nensuite.  Fin! àéîøù"),
            (5, "no separators here"),
            (6, "...!!!"),
            (7, "tabs\tand\rreturns\nsplit"),
        ],
        "doc_id int, s string",
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"), F.col("text").alias("s")
    )
    for df in (edge, docs):
        a = sorted(
            tuple(r) for r in split_doc_records(df, "doc_id", "s").collect()
        )
        b = sorted(
            tuple(r)
            for r in split_doc_records_builtin(df, "doc_id", "s").collect()
        )
        assert a == b

    # split_phrases=False and links_as_separators=False options too
    for kw in (
        dict(split_phrases=False),
        dict(links_as_separators=False),
    ):
        a = sorted(
            tuple(r) for r in split_doc_records(edge, "doc_id", "s", **kw).collect()
        )
        b = sorted(
            tuple(r)
            for r in split_doc_records_builtin(edge, "doc_id", "s", **kw).collect()
        )
        assert a == b


def test_repetition_profile_family(spark):
    """top/dup n-gram char fractions + line-grain dup fractions: hand
    values, the 1.0 overlap cap, the smallest-gram tie-break, and the
    empty/single-token guards."""
    import pyspark.sql.functions as F

    from demy_spark.functions.textstats import (
        dup_line_char_fraction,
        dup_line_fraction,
        dup_ngram_char_fraction,
        repetition_profile,
        top_ngram_char_fraction,
    )

    rows = [
        # "a b" x3 of 4 bigrams; norm "a b a b a b c" = 13 chars
        (1, "a b a b a b c"),
        # overlapping "a b a b" counts twice at n=4 -> capped at 1.0
        (2, "a b a b a b a b"),
        # tie at count 1 between all bigrams -> smallest gram "b c"?
        # grams: "c b","b a","a c" -> smallest "a c" (len 3) / 5 chars
        (3, "c b a c"),
        # repeated 3-token passage: dup3 covers both occurrences
        (4, "one two three x one two three"),
        (5, ""),
        (6, "solo"),
        # line grain: x repeats 3 times of 5 non-empty lines
        (7, "x\ny\nx\nzz\n\nx"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            F.round(top_ngram_char_fraction("t", 2), 6).alias("top2"),
            F.round(top_ngram_char_fraction("t", 4), 6).alias("top4"),
            F.round(dup_ngram_char_fraction("t", 3), 6).alias("dup3"),
            dup_line_fraction("t").alias("dlf"),
            dup_line_char_fraction("t").alias("dlcf"),
        ).collect()
    }
    assert out[1]["top2"] == round(3 * 3 / 13, 6)
    assert out[2]["top4"] == 1.0  # 3 * 7 / 15 > 1 -> capped
    assert out[3]["top2"] == round(3 / 7, 6)  # tie -> smallest gram "a c"
    assert out[4]["dup3"] == round(2 * 13 / 29, 6)  # "one two three" twice
    for i in (5, 6):
        r = out[i]
        assert (r["top2"], r["top4"], r["dup3"], r["dlf"], r["dlcf"]) == (
            0.0,
            0.0,
            0.0,
            0.0,
            0.0,
        )
    # lines [x, y, x, zz, x]: 5 occurrences, 3 distinct -> dlf = 0.4;
    # chars 1+1+1+2+1=6, kept distinct 1+1+2=4 -> dlcf = 2/6
    assert out[7]["dlf"] == 0.4
    assert abs(out[7]["dlcf"] - 2 / 6) < 1e-12

    # paragraph grain via regex separator
    para = spark.createDataFrame(
        [(1, "p q\n\np q\n\nr")], "id int, t string"
    ).select(dup_line_fraction("t", sep="\n\n").alias("f"))
    assert abs(para.collect()[0]["f"] - (1 - 2 / 3)) < 1e-12

    # bundle exposes the named fields
    prof = df.where("id = 1").select(repetition_profile("t").alias("p")).collect()[0][
        "p"
    ]
    assert set(prof.asDict()) == {
        "dup_line_frac",
        "dup_line_char_frac",
        "top2_char_frac",
        "top3_char_frac",
        "top4_char_frac",
        "dup5_char_frac",
        "dup10_char_frac",
    }


def test_strip_control_chars(spark):
    """C0/C1 removal keeps \\t \\n \\r; zero-width removal is opt-in
    (ZWJ emoji sequences survive the default)."""
    from demy_spark.functions.text import strip_control_chars

    t = "a\x00b\x07c\td\ne\rf\x7fg\x9ch​i‍﻿j"
    got = _one(spark, t, strip_control_chars)
    assert got == "abc\td\ne\rfgh​i‍﻿j"
    got_zw = _one(
        spark, t, lambda c: strip_control_chars(c, zero_width=True)
    )
    assert got_zw == "abc\td\ne\rfghij"
    # family emoji (ZWJ-joined) intact by default
    fam = "\U0001F468‍\U0001F469‍\U0001F467"
    assert _one(spark, fam, strip_control_chars) == fam


def test_unicode_normalize_forms(spark):
    """All four UAX #15 forms against CPython's unicodedata, plus the
    None passthrough and the bad-form guard."""
    import unicodedata

    import pytest

    from demy_spark.functions.text import unicode_normalize

    cases = [
        "caf\u0065\u0301",        # decomposed acute
        "\u1112\u1161\u11ab",     # jamo -> syllable under NFC
        "\ufb01 \uff11",           # fi ligature + fullwidth digit (K forms)
        "\u212b",                  # angstrom SIGN (singleton -> U+00C5)
        "\U0001D400e\u0301",      # astral base + combining on the next char
        "plain",
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)] + [(99, None)], "id int, t string")
    for form in ("NFC", "NFKC", "NFD", "NFKD"):
        out = {
            r["id"]: r["o"]
            for r in df.select("id", unicode_normalize("t", form).alias("o")).collect()
        }
        for i, s in enumerate(cases):
            assert out[i] == unicodedata.normalize(form, s), (form, s)
        assert out[99] is None
    with pytest.raises(ValueError):
        unicode_normalize("t", "nfc")


def test_nfc_matches_duckdb_hostile(spark):
    """The q125 oracle contract: Spark-side NFC == DuckDB nfc_normalize
    on a hostile battery (reordered combining classes, composition
    exclusions, jamo, astral bases)."""
    import duckdb

    from demy_spark.functions.text import unicode_normalize

    cases = [
        "e\u0301",                          # decomposed acute
        "a\u0328\u0301",                   # ogonek+acute: composes through
        "a\u0301\u0328",                   # same marks, swapped input order
        "\u1112\u1161\u11ab",             # jamo triple -> one syllable
        "\u212b",                          # angstrom sign singleton
        "\u0915\u093c",                   # composition exclusion (qa)
        "\U0001D400\u0301q\u0323\u0307",  # astral base + reordering
        "",
    ]
    con = duckdb.connect()
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "id int, t string")
    got = {
        r["id"]: r["o"]
        for r in df.select("id", unicode_normalize("t").alias("o")).collect()
    }
    for i, s in enumerate(cases):
        want = con.sql("SELECT nfc_normalize(?)", params=[s]).fetchone()[0]
        assert got[i] == want, (s, got[i], want)


def test_strip_html(spark):
    """Script/style content dropped wholesale, comments and tags
    removed, entities decoded ONE level (amp last), non-markup '<'
    untouched."""
    from demy_spark.functions.text import decode_html_entities, strip_html

    html = (
        '<html><head><style type="text/css">p {color: red}</style></head>'
        '<body><!-- note --><h1 class="t">Title</h1><p>Hello &amp; '
        '<b>world</b>, 2 &lt; 3.</p><script>var x = "<p>";</script>'
        "tail</body></html>"
    )
    got = _one(spark, html, strip_html)
    assert got == "       Title  Hello &  world , 2 < 3.  tail  "
    # upper-case script tag with attributes; stray < comparison kept
    assert _one(spark, '<SCRIPT SRC="x.js">alert(1)</SCRIPT>b', strip_html) == " b"
    assert (
        _one(spark, "a < b and &amp;lt; stays escaped", strip_html)
        == "a < b and &lt; stays escaped"
    )
    # entity decode is one-level and amp-last
    assert _one(spark, "&amp;amp; &#39;q&#39; &nbsp;", decode_html_entities) == "&amp; 'q'  "
    assert _one(spark, "plain", lambda c: strip_html(c, decode_entities=False)) == "plain"


def test_json_and_url_extraction(spark):
    """Native semi-structured extraction conventions used by q128/q129:
    from_json yields NULL on malformed/missing (never a crash);
    parse_url handles absent params/fragments."""
    import pyspark.sql.functions as F

    rows = [
        (1, '{"k": 7}', "https://a.b.example.com/x/y?lang=fr&z=1#f"),
        (2, "not json", "https://example.com/"),
        (3, '{"other": 1}', "https://example.com"),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, "id int, props string, url string")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            F.from_json("props", "k BIGINT")["k"].alias("k"),
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang"),
        ).collect()
    }
    assert (got[1]["k"], got[1]["host"], got[1]["path"], got[1]["lang"]) == (
        7, "a.b.example.com", "/x/y", "fr",
    )
    assert got[2]["k"] is None and got[2]["path"] == "/"
    assert got[3]["k"] is None and got[3]["lang"] is None
    assert got[4]["host"] is None


def test_script_profile(spark):
    """Per-script counts, dominant argmax with first-entry tie-break,
    'und' on scriptless text, mixed-script flagging."""
    import pyspark.sql.functions as F

    from demy_spark.functions.textstats import script_profile

    rows = [
        (1, "hello мир"),        # latin 5 > cyrillic 3
        (2, "日本語のテキスト"),  # kana 5 > cjk 3
        (3, "123 !?"),                            # no script chars
        (4, "ab аб"),                  # 2-2 tie -> latin (earlier entry)
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        r["id"]: r["p"].asDict() if r["p"] is not None else None
        for r in df.select("id", script_profile("t").alias("p")).collect()
    }
    assert got[1]["dominant"] == "latin" and got[1]["n_cyrillic"] == 3
    assert got[2]["dominant"] == "kana" and got[2]["n_cjk"] == 3
    assert got[3]["dominant"] == "und" and got[3]["n_script_chars"] == 0
    assert got[4]["dominant"] == "latin"  # tie breaks to earlier entry
    # a router routes every row: null profiles as empty text
    assert got[5]["dominant"] == "und" and got[5]["n_script_chars"] == 0


def test_script_profile_udf_builtin_parity(spark):
    """The Arrow/numpy script_profile (default, ~9x faster — PLANS.md
    round-6) must stay bit-identical to the regexp-chain builtin on
    every edge the contract names: nulls, empties, astral codepoints
    (python len vs utf-32 unit count), ties, and the Latin-1
    non-letters x/÷ that the round-6 range fix excludes."""
    import pyspark.sql.functions as F

    from demy_spark.functions.textstats import (
        script_profile,
        script_profile_builtin,
    )

    rows = [
        (1, "hello мир 数据 ×÷"),  # x/÷ are NOT latin
        (2, None),
        (3, ""),
        (4, "مرحبا 한글 ひらがな"),
        (5, "\U0001F600 astral \U00010400 deseret"),  # astral = 1 cp each
        (6, "ab аб"),  # tie -> earlier entry
        (7, "ÖØöø×÷"),  # range boundary chars
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    a = (
        df.select("id", script_profile("text").alias("p"))
        .select("id", "p.*").orderBy("id").collect()
    )
    b = (
        df.select("id", script_profile_builtin("text").alias("p"))
        .select("id", "p.*").orderBy("id").collect()
    )
    assert a == b
    byid = {r["id"]: r for r in a}
    assert byid[1]["n_latin"] == 5  # x/÷ excluded
    assert byid[7]["n_latin"] == 4 and byid[7]["n_script_chars"] == 4


def test_c4_rules_line_gate(spark):
    from demy_spark.functions.textstats import c4_rules

    doc = "\n".join(
        [
            "the cat sat on the warm mat today.",      # kept
            "the dog ran over the green hill fast!",   # kept
            "a bird flew over the old tall tree?",     # kept
            "too short.",                              # < 5 words
            "this line has five words but no terminal punctuation",
            "enable javascript to view this page properly.",
            "please read our privacy policy before you continue.",
        ]
    )
    df = spark.createDataFrame([(1, doc)], ["id", "t"]).select(
        c4_rules("t").alias("r")
    )
    r = df.collect()[0]["r"]
    assert r["n_lines"] == 7 and r["n_kept"] == 3
    assert r["n_short"] == 1 and r["n_nopunct"] == 1
    assert r["n_js"] == 1 and r["n_policy"] == 1
    assert r["keep"] and not r["has_lorem"] and not r["has_brace"]
    assert r["text_clean"].count("\n") == 2
    assert "javascript" not in r["text_clean"]


def test_c4_rules_document_level_drops(spark):
    from demy_spark.functions.textstats import c4_rules

    base = "\n".join(
        ["the cat sat on the warm mat today."] * 3
    )
    lorem = base + "\nsome lorem ipsum filler text stays here."
    brace = base + "\nvar config = { a: 1 };"
    thin = "the cat sat on the warm mat today."
    df = spark.createDataFrame(
        [(1, base), (2, lorem), (3, brace), (4, thin)], ["id", "t"]
    ).select("id", c4_rules("t").alias("r"))
    r = {x["id"]: x["r"] for x in df.collect()}
    assert r[1]["keep"]
    assert r[2]["has_lorem"] and not r[2]["keep"]
    assert r[3]["has_brace"] and not r[3]["keep"]
    assert r[4]["n_kept"] == 1 and not r[4]["keep"]


def test_c4_rules_reason_precedence_and_quote_punct(spark):
    from demy_spark.functions.textstats import c4_rules

    # javascript wins over short; a closing double-quote is terminal
    doc = 'javascript.\nhe said "the cat sat on the mat."'
    r = (
        spark.createDataFrame([(1, doc)], ["id", "t"])
        .select(c4_rules("t").alias("r"))
        .collect()[0]["r"]
    )
    assert r["n_js"] == 1 and r["n_short"] == 0
    assert r["n_kept"] == 1
