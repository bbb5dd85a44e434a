"""Text normalization kit.

Column-expression re-implementations of the reference's scalar text
functions, kept JVM-side (translate / regexp_replace chains compile into
whole-stage codegen) instead of the reference's per-char Scala loops:

- ``simplify_text``     parity: mllib/src/main/scala/text/Word.scala:34-55
- ``phonetic_simplify`` parity: geo/src/main/scala/TextTools.scala:10-35
- ``strip_urls``/``blank_urls`` parity: text/Word.scala:75-90
- ``clean_tweet``       parity: text/TweetCleaner.scala:28-47
- ``tokenize``          parity: index/implicits.scala:332-336 (regex
                        ``[^\\p{L}]+`` split) and text/Corpus.scala:29-32
- ``double_acronyms``   parity: index/AcronymFilter.scala:23-60
- ``split_sentences``   parity: text/SentenceBuilder.scala:23-68
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Accent folding table (Word.scala:38-50). æ→a and œ→e fold to one char.
_ACCENT_SRC = "àáâãäåæèéêëœìíîïðñòóôõöøùúûüç"
_ACCENT_DST = "aaaaaaaeeeeeiiiioooooooouuuuc"

URL_REGEX = r"(?i)(https?|ftp|gopher|telnet|file)://[\w\d:#@%/;$()~_?\+\-=\\\.&]*"


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def simplify_text(c: Column | str) -> Column:
    """Lowercase + accent folding + French elision blanking.

    Matches Word.simplifyText: each accented char folds to its base
    letter, ``-`` and ``'`` become spaces, and an ``l`` or ``d``
    immediately followed by ``'`` becomes a space as well (so
    ``l'hôpital`` → ``"  hopital"`` — offsets are preserved).
    """
    c = F.lower(_as_col(c))
    c = F.regexp_replace(c, r"l'", "  ")
    c = F.regexp_replace(c, r"d'", "  ")
    return F.translate(c, _ACCENT_SRC + "-'", _ACCENT_DST + "  ")


def phonetic_simplify(c: Column | str) -> Column:
    """Geo phonetic folding (TextTools.simplifyText): accents + z→s,
    v/w→b, k→c, g→j, q(u)→c, ç→s, collapsed ll/ss, dropped elisions."""
    c = F.lower(_as_col(c))
    c = F.regexp_replace(c, r"l'", "")
    c = F.regexp_replace(c, r"d'", "")
    c = F.regexp_replace(c, r"qu", "c")
    c = F.regexp_replace(c, r"l{2,}", "l")
    c = F.regexp_replace(c, r"s{2,}", "s")
    return F.translate(
        c, _ACCENT_SRC + "zvwkgq-", _ACCENT_DST.replace("c", "s") + "sbbcjc "
    )


def strip_urls(c: Column | str, replacement: str = " ") -> Column:
    """Replace URLs with ``replacement`` (offsets NOT preserved)."""
    return F.regexp_replace(_as_col(c), URL_REGEX, replacement)


# PII patterns deliberately avoid lookaround/backreferences so Java
# regex (Spark) and RE2-style engines (DuckDB oracles) match the same
# spans — leftmost-first vs leftmost-longest agree on these shapes.
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_REGEX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_REGEX = r"\+?\d[\d -]{7,}\d"


def redact_pii(c: Column | str) -> Column:
    """Scrub emails, IPv4 addresses and phone-shaped digit runs to
    typed placeholders — the pre-training privacy pass every corpus
    pipeline runs. Order matters and is part of the contract: emails
    first (their local parts may contain digit runs), then IPs (dotted
    digits are not phone-shaped but redact before the greedy phone
    pattern on principle), then phones. Pure ``regexp_replace`` chain
    — JVM-side, codegen-friendly, and replayable by any regex-capable
    SQL engine (the q91 oracle runs the identical chain)."""
    out = F.regexp_replace(_as_col(c), EMAIL_REGEX, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_REGEX, "<IP>")
    return F.regexp_replace(out, PHONE_REGEX, "<PHONE>")


def _blank_urls_py(t: str | None) -> str | None:
    """Replace each URL with same-length whitespace (offset-preserving)
    — the one shared implementation behind blank_urls() and splitDoc."""
    import re

    if t is None:
        return None
    return re.sub(URL_REGEX, lambda m: " " * len(m.group(0)), t)


@F.pandas_udf(T.StringType())
def _blank_urls_udf(s: pd.Series) -> pd.Series:
    return s.map(_blank_urls_py)


def blank_urls(c: Column | str) -> Column:
    """Replace each URL with same-length whitespace so char offsets
    survive (Word.linksAsBlanks). Needs a length-preserving replacement,
    which regexp_replace can't express → vectorized pandas UDF."""
    return _blank_urls_udf(_as_col(c))


# C0 controls minus \t\n\r, DEL, and C1 controls — the bytes an
# encoding-damaged crawl leaves behind. Zero-width code points are a
# separate knob: ZWJ/ZWNJ are meaningful inside emoji and Indic/Persian
# text, so stripping them is opt-in.
CONTROL_CHAR_REGEX = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"
ZERO_WIDTH_REGEX = "[\\u200B\\u200C\\u200D\\u2060\\uFEFF]"


def strip_control_chars(
    c: Column | str, *, zero_width: bool = False
) -> Column:
    """Remove C0/C1 control characters (keeping ``\\t``/``\\n``/``\\r``)
    — the standard hygiene pass before tokenization or dedup hashing on
    crawled corpora. ``zero_width=True`` also removes ZWSP/ZWNJ/ZWJ/
    word-joiner/BOM (off by default: ZWJ sequences carry meaning in
    emoji and several scripts). Pure ``regexp_replace`` chain, JVM-side
    codegen; replayable by any regex-capable SQL engine (q125's oracle
    runs the identical chain)."""
    out = F.regexp_replace(_as_col(c), CONTROL_CHAR_REGEX, "")
    if zero_width:
        out = F.regexp_replace(out, ZERO_WIDTH_REGEX, "")
    return out


# Entity decode order is part of the contract: named/numeric entities
# first, ampersand LAST so "&amp;lt;" decodes to "&lt;" (one level),
# never to "<".
_HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def decode_html_entities(c: Column | str) -> Column:
    """Decode the common HTML entities (lt/gt/quot/#39/apos/nbsp, then
    amp last — one level, so double-escaped text stays escaped). A
    literal ``replace`` chain: JVM-side, codegen, and replayable by any
    SQL engine."""
    out = _as_col(c)
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def strip_html(
    c: Column | str,
    *,
    replacement: str = " ",
    decode_entities: bool = True,
) -> Column:
    """Markup removal for crawled corpora: drop ``<script>``/``<style>``
    blocks wholesale (their CONTENT is code, not text), then comments,
    then every remaining tag, then decode common entities. Patterns use
    no backreferences or lookaround so Java regex (Spark) and RE2
    engines (DuckDB oracles) remove identical spans — script and style
    get separate literal patterns instead of ``</\\1>``. Pure
    ``regexp_replace``/``replace`` chain: JVM-side codegen, a narrow
    per-row map at any scale (q126's oracle runs the identical chain).
    This is a tag stripper, not a sanitizer — do not use it to make
    untrusted HTML safe for rendering."""
    out = F.regexp_replace(
        _as_col(c), r"(?is)<script[^>]*>.*?</script>", replacement
    )
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", replacement)
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", replacement)
    out = F.regexp_replace(out, r"(?s)</?[a-zA-Z!][^>]*>", replacement)
    if decode_entities:
        out = decode_html_entities(out)
    return out


_NORMALIZE_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def unicode_normalize(c: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (UAX #15) of a string column — canonical
    composition (NFC) is the near-universal first step of corpus
    pipelines so that byte-level dedup/hashing/sorting see one spelling
    per text (``e`` + U+0301 vs precomposed ``é``); NFKC additionally
    folds compatibility forms (ligatures, fullwidth digits) for
    tokenizer-facing text. No Spark built-in expresses UAX #15, so this
    is a vectorized pandas UDF (``Series.str.normalize``, Arrow-batched
    — a pure per-row map: no shuffle, scales linearly like any
    projection). Cross-engine parity with DuckDB's ``nfc_normalize`` is
    pinned for NFC by tests and the q125 oracle; the other forms are
    unit-tested against CPython's unicodedata."""
    if form not in _NORMALIZE_FORMS:
        raise ValueError(f"form must be one of {_NORMALIZE_FORMS}: {form!r}")

    @F.pandas_udf(T.StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return _norm(_as_col(c))


def clean_tweet(
    c: Column | str,
    link_to: str = "link",
    user_mention_to: str = "user",
    sentiment_map: Iterable[tuple[str, str]] | None = None,
) -> Column:
    """Tweet normalization: URLs → ``link_to``, @mentions →
    ``user_mention_to``, RT/via markers dropped, ``#`` stripped, plus an
    optional literal→replacement map (emoji sentiment substitution —
    pass the collected dictionary; it is dictionary-sized by contract).
    """
    col = _as_col(c)
    col = F.regexp_replace(col, URL_REGEX, f" {link_to} ")
    col = F.regexp_replace(col, r"(?<=^|[^a-zA-Z0-9-_\.])@(\w+)\b", f" {user_mention_to} ")
    col = F.regexp_replace(col, r"\bRT\b|\bvia\b", " ")
    col = F.regexp_replace(col, r"#", "")
    import re as _re

    for literal, repl in sentiment_map or ():
        col = F.regexp_replace(col, _re.escape(literal), f" {repl} ")
    return col


def tokenize(
    c: Column | str,
    lowercase: bool = True,
    pattern: str = r"[^\p{L}0-9]+",
) -> Column:
    """Split into tokens on non-letter runs → array<string> without
    empty strings. Default pattern extends the reference's
    ``[^\\p{L}]+`` with digits so ids/quantities survive."""
    col = _as_col(c)
    if lowercase:
        col = F.lower(col)
    return F.array_remove(F.split(col, pattern), "")


def double_acronyms(tokens: Column | str) -> Column:
    """2-letter all-uppercase tokens are doubled ("TX" → "TXTX") so they
    are not drowned out at scoring time (AcronymFilter semantics). Apply
    BEFORE lowercasing; operates on an array<string> column."""
    t = _as_col(tokens)
    return F.transform(
        t,
        lambda x: F.when(x.rlike(r"^[A-Z]{2}$"), F.concat(x, x)).otherwise(x),
    )


_SENTENCE_SCHEMA = T.ArrayType(T.StringType())


def make_sentence_splitter(
    min_phrase_size: int = 2, max_phrase_size: int = 20
):
    """Factory for the sentence-split pandas UDF (SentenceBuilder
    semantics): hard breaks (newline/tab) always split; soft breaks
    (.;:!?) split once ``min_phrase_size`` words have accumulated; word
    separators split run-ons past ``max_phrase_size`` words; a French
    subject pronoun starting a word also splits. Returns array<string>
    preserving every character of the input."""

    hard = set("\n\r\t")
    soft = set(".;:!?")
    seps = set(" ()")
    pronouns = ("je", "tu", "il", "elle", "vous", "nous", "ils")

    def split_one(text: str | None) -> list[str]:
        if text is None:
            return [""]
        splits = [0]
        in_word = False
        word_count = 0
        last_break = 0
        lower = text.lower()
        for i, ch in enumerate(text):
            do_break = False
            was_in_word = in_word
            if ch in hard:
                do_break, in_word = True, False
            elif ch in soft:
                do_break = word_count > min_phrase_size
                in_word = False
            elif ch in seps:
                do_break = word_count > max_phrase_size
                in_word = False
            else:
                if not was_in_word and any(
                    lower.startswith(p, i) and len(text) > i + len(p)
                    and text[i + len(p)] in seps
                    for p in pronouns
                ):
                    do_break = word_count > min_phrase_size
                in_word = True
            if do_break:
                if last_break < i - 1:
                    splits.append(i)
                last_break = i
                word_count = 0
            elif not in_word and was_in_word:
                word_count += 1
        import re

        if splits and len([w for w in re.split(r"\W", text[splits[-1]:]) if w]) < min_phrase_size:
            if len(splits) > 1:
                splits.pop()
        return [
            text[s : (splits[j + 1] if j + 1 < len(splits) else len(text))]
            for j, s in enumerate(splits)
        ]

    @F.pandas_udf(_SENTENCE_SCHEMA)
    def _split(series: pd.Series) -> pd.Series:
        return series.map(split_one)

    return _split


def split_sentences(
    c: Column | str, min_phrase_size: int = 2, max_phrase_size: int = 20
) -> Column:
    """Sentence split → array<string>; pair with ``F.posexplode`` to get
    (phrase_id, sentence) rows like the reference's explode mode."""
    return make_sentence_splitter(min_phrase_size, max_phrase_size)(_as_col(c))


# --- Word.splitDoc: typed Word records with offsets + phrase ids --------

_WORD_RECORD_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("simplified", T.StringType()),
            T.StructField("is_word", T.BooleanType()),
            T.StructField("index", T.IntegerType()),
            T.StructField("phrase_id", T.IntegerType()),
        ]
    )
)

_ACCENT_MAP = dict(zip(_ACCENT_SRC, _ACCENT_DST))


def _simplify_char(c: str, nxt: str) -> str:
    """Word.simplifyText's per-char mapping (text/Word.scala:34-55):
    lowercase, accent fold, -/' → space, l/d followed by ' → space.

    Offset preservation is the contract: when Unicode lowercasing would
    EXPAND a char (e.g. 'İ' → 'i' + combining dot), the original char
    is kept instead — the reference inherits that expansion and would
    silently shift every downstream offset."""
    lc = c.lower()
    if len(lc) != 1:
        lc = c
    if lc in _ACCENT_MAP:
        return _ACCENT_MAP[lc]
    if lc in ("-", "'"):
        return " "
    if lc in ("l", "d") and nxt == "'":
        return " "
    return lc


def _split_doc_py(
    text: str | None,
    links_as_separators: bool = True,
    split_phrases: bool = True,
) -> list[dict]:
    """Word.splitDoc (text/Word.scala:91-109): length-preserving
    simplify + non-letter blanking segments the doc into maximal
    word / non-word runs; each record carries the ORIGINAL text slice,
    the simplified slice, its sequential index and a phrase id that
    increments after any token containing [\\r\\n.;!?]."""
    import re

    orig = text or ""
    s = _blank_urls_py(orig) if links_as_separators else orig
    simpli = "".join(
        _simplify_char(c, s[i + 1].lower() if i + 1 < len(s) else "X")
        for i, c in enumerate(s)
    )
    final = "".join(ch if ch.isalpha() else " " for ch in simpli)

    import itertools

    sep = re.compile(r"[\r\n.;!?]")
    out: list[dict] = []
    phrase = 0
    idx = 0
    for is_space, grp in itertools.groupby(
        enumerate(final), key=lambda p: p[1] == " "
    ):
        g = list(grp)
        start, end = g[0][0], g[-1][0]
        w = orig[start : end + 1]
        out.append(
            {
                "word": w,
                "simplified": final[start : end + 1],
                "is_word": not is_space,
                "index": idx,
                "phrase_id": phrase,
            }
        )
        idx += 1
        if split_phrases and sep.search(w):
            phrase += 1
    return out


def make_doc_splitter(
    links_as_separators: bool = True, split_phrases: bool = True
):
    """Factory for the splitDoc pandas UDF → array<struct<word,
    simplified, is_word, index, phrase_id>> (Word.scala:91-109)."""

    @F.pandas_udf(_WORD_RECORD_SCHEMA)
    def _split(series: pd.Series) -> pd.Series:
        return series.map(
            lambda t: _split_doc_py(t, links_as_separators, split_phrases)
        )

    return _split


def split_doc_records(
    df,
    id_col: str,
    text_col: str,
    *,
    links_as_separators: bool = True,
    split_phrases: bool = True,
):
    """Word.splitDoc as a DataFrame op: one row per Word record —
    (id_col, word, simplified, is_word, index, phrase_id). Vectorized
    pandas UDF + explode; the per-doc record array never crosses the
    driver (the reference materializes Seq[Word] datasets the same
    shape, text/Word.scala:91-109)."""
    arr = make_doc_splitter(links_as_separators, split_phrases)(
        _as_col(text_col)
    )
    return (
        df.select(F.col(id_col), F.explode(arr).alias("_w_"))
        .select(
            id_col,
            F.col("_w_.word").alias("word"),
            F.col("_w_.simplified").alias("simplified"),
            F.col("_w_.is_word").alias("is_word"),
            F.col("_w_.index").alias("index"),
            F.col("_w_.phrase_id").alias("phrase_id"),
        )
    )


def blank_urls_builtin(c: Column | str) -> Column:
    """Offset-preserving URL blanking WITHOUT Python: extract every URL
    match, then literal-replace each with same-length spaces
    (``F.replace`` + ``F.repeat`` — the length-preserving substitution
    ``regexp_replace`` can't express). Literal replacement also blanks
    a URL string recurring at a non-match position — a corner the
    pandas twin (`blank_urls`) handles positionally; parity on real
    corpora is asserted by test_split_doc_builtin_parity."""
    col = _as_col(c)
    return F.aggregate(
        F.regexp_extract_all(col, F.lit(URL_REGEX), F.lit(0)),
        col,
        lambda acc, u: F.replace(acc, u, F.repeat(F.lit(" "), F.length(u))),
    )


def _let(val: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``val`` ONCE per row and
    bind it as a lambda variable inside ``body``.

    ``transform(array(val), v -> body(v))[0]`` — the lambda variable is
    an attribute, so ``element_at(v, i)`` inside nested lambdas costs
    O(1) per access. Without this, CollapseProject inlines array
    expressions into lambda bodies (withColumn staging does NOT protect
    them), and every element access re-evaluates the whole producing
    transform — measured: the staged splitDoc plan grew to 340k chars
    with 816 inlined aggregates and went superlinear on 50-char rows.
    """
    return F.transform(F.array(val), body)[0]


def split_doc_records_builtin(
    df,
    id_col: str,
    text_col: str,
    *,
    links_as_separators: bool = True,
    split_phrases: bool = True,
):
    """``split_doc_records`` re-expressed in pure built-in higher-order
    functions (VERDICT r4 task 6: the pandas-UDF vs builtin audit) —
    same contract, zero Python in the plan:

    per-char simplify (next-char aware) → non-letter blanking → run
    boundaries by flag change → records via one indexed transform,
    with phrase ids as an ``aggregate`` prefix-sum over the runs'
    separator flags. Every intermediate array is ``_let``-bound so it
    evaluates once per row (see ``_let``).

    Benchmarked against the pandas-UDF path at 10× in PLANS.md
    ("splitDoc: pandas UDF vs builtin"); the winner backs q77. Higher-
    order functions don't participate in whole-stage codegen
    (interpreted per element), so JVM-side is not automatically faster
    — that's why this is measured, not assumed."""
    orig = F.coalesce(F.col(text_col).cast("string"), F.lit(""))

    def simplify(chars, i: Column) -> Column:
        c = F.element_at(chars, i + 1)
        lc = F.when(F.length(F.lower(c)) == 1, F.lower(c)).otherwise(c)
        nxt = F.lower(F.coalesce(F.try_element_at(chars, i + 2), F.lit("X")))
        return F.when(
            lc.isin("l", "d") & (nxt == "'"), F.lit(" ")
        ).otherwise(F.translate(lc, _ACCENT_SRC + "-'", _ACCENT_DST + "  "))

    def records_for(s: Column) -> Column:
        n_chars = F.length(s)

        def with_chars(chars):
            n = F.size(chars)
            final_expr = F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: _let(
                    simplify(chars, i),
                    lambda sc: F.when(sc.rlike(r"^\p{L}$"), sc).otherwise(
                        F.lit(" ")
                    ),
                ),
            )

            def with_final(final):
                flags_expr = F.transform(final, lambda c: c == " ")

                def with_state(fstr, flags):
                    starts_expr = F.filter(
                        F.sequence(F.lit(0), n - 1),
                        lambda i: (i == 0)
                        | (
                            F.element_at(flags, i + 1)
                            != F.element_at(flags, i)
                        ),
                    )

                    def with_starts(starts):
                        def run_bounds(j: Column) -> tuple[Column, Column]:
                            start = F.element_at(starts, j + 1)
                            end = F.coalesce(
                                F.try_element_at(starts, j + 2) - 1, n - 1
                            )
                            return start, end

                        n_runs = F.size(starts)
                        if split_phrases:
                            sepf_expr = F.transform(
                                F.sequence(F.lit(0), n_runs - 1),
                                lambda j: orig.substr(
                                    run_bounds(j)[0] + 1,
                                    run_bounds(j)[1] - run_bounds(j)[0] + 1,
                                ).rlike(r"[\r\n.;!?]"),
                            )
                            pids_expr = F.aggregate(
                                sepf_expr,
                                F.struct(
                                    F.array().cast("array<int>").alias("arr"),
                                    F.lit(0).alias("cur"),
                                ),
                                lambda acc, f: F.struct(
                                    F.concat(
                                        acc["arr"], F.array(acc["cur"])
                                    ).alias("arr"),
                                    (
                                        acc["cur"] + F.when(f, 1).otherwise(0)
                                    ).alias("cur"),
                                ),
                                lambda acc: acc["arr"],
                            )
                        else:
                            pids_expr = F.transform(
                                F.sequence(F.lit(0), n_runs - 1),
                                lambda _: F.lit(0),
                            )

                        def with_pids(pids):
                            def record(j: Column) -> Column:
                                start, end = run_bounds(j)
                                length = end - start + 1
                                return F.struct(
                                    orig.substr(start + 1, length).alias(
                                        "word"
                                    ),
                                    F.substring(
                                        fstr, start + 1, length
                                    ).alias("simplified"),
                                    (~F.element_at(flags, start + 1)).alias(
                                        "is_word"
                                    ),
                                    j.cast("int").alias("index"),
                                    F.element_at(pids, j + 1).alias(
                                        "phrase_id"
                                    ),
                                )

                            return F.transform(
                                F.sequence(F.lit(0), n_runs - 1), record
                            )

                        return _let(pids_expr, with_pids)

                    return _let(starts_expr, with_starts)

                return _let(
                    F.concat_ws("", final),
                    lambda fstr: _let(
                        flags_expr, lambda flags: with_state(fstr, flags)
                    ),
                )

            return _let(final_expr, with_final)

        empty = F.array().cast(_WORD_RECORD_SCHEMA)
        return F.when(n_chars == 0, empty).otherwise(
            _let(F.split(s, ""), with_chars)
        )

    s_expr = blank_urls_builtin(orig) if links_as_separators else orig
    staged = df.select(
        F.col(id_col), _let(s_expr, records_for).alias("_recs_")
    )
    return staged.select(F.col(id_col), F.explode("_recs_").alias("_w_")).select(
        id_col,
        F.col("_w_.word").alias("word"),
        F.col("_w_.simplified").alias("simplified"),
        F.col("_w_.is_word").alias("is_word"),
        F.col("_w_.index").alias("index"),
        F.col("_w_.phrase_id").alias("phrase_id"),
    )
