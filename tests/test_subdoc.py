from __future__ import annotations

from demy_spark.operators.subdoc import duplicated_spans, line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_strips_cross_doc_lines(spark):
    docs = _docs(
        spark,
        [
            (1, "unique alpha\nCopyright Footer\nunique beta"),
            (2, "other text\ncopyright footer"),
            (3, "solo document"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(docs, "doc_id", "text").collect()
    }
    # the footer matches case-insensitively and is removed from BOTH docs
    assert out[1]["text_clean"] == "unique alpha\nunique beta"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[1]["chars_removed"] == len("Copyright Footer")
    assert out[2]["text_clean"] == "other text"
    assert out[2]["n_removed"] == 1
    assert out[3]["text_clean"] == "solo document"
    assert out[3]["n_removed"] == 0 and out[3]["chars_removed"] == 0


def test_line_dedup_preserves_order_and_drops_blanks(spark):
    docs = _docs(spark, [(1, "z line\n\n  \na line\nz line")])
    out = line_dedup(docs, "doc_id", "text").collect()[0]
    # blank / whitespace-only lines vanish; original order is kept
    # (NOT sorted alphabetically); within-doc repeats are not cross-doc
    assert out["text_clean"] == "z line\na line\nz line"
    assert out["n_lines"] == 3


def test_line_dedup_max_docs_threshold(spark):
    docs = _docs(spark, [(1, "shared"), (2, "shared"), (3, "shared")])
    keep2 = line_dedup(docs, "doc_id", "text", max_docs=2).collect()
    assert all(r["n_removed"] == 1 for r in keep2)
    keep3 = line_dedup(docs, "doc_id", "text", max_docs=3).collect()
    assert all(r["n_removed"] == 0 for r in keep3)


def test_duplicated_spans_merges_overlaps(spark):
    shared = "one two three four five six"  # 6 tokens -> two 5-grams
    docs = _docs(
        spark,
        [
            (1, f"{shared} tail words here only once"),
            (2, f"prefix {shared}"),
        ],
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(docs, "doc_id", "text", k=5).collect()
    }
    # overlapping gram hits merge into ONE maximal span per doc
    assert spans[1] == (0, 5, 6)
    assert spans[2] == (1, 6, 6)


def test_duplicated_spans_within_doc_repeat_counts(spark):
    phrase = "a b c d e"
    docs = _docs(spark, [(1, f"{phrase} x y z {phrase}")])
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, "doc_id", "text", k=5).collect()
    )
    # the doc repeats its own 5-gram: both occurrences flagged,
    # separated by the x y z gap -> two spans
    assert spans == [(0, 4), (8, 12)]


def test_duplicated_spans_short_docs_empty(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])
    assert duplicated_spans(docs, "doc_id", "text", k=5).count() == 0


def test_strip_spans_cuts_covered_tokens(spark):
    shared = "one two three four five six"
    docs = _docs(
        spark,
        [
            (1, f"{shared} tail words here only once"),
            (2, f"prefix {shared}"),
        ],
    )
    from demy_spark.operators.subdoc import strip_duplicated_spans

    out = {
        r["doc_id"]: r
        for r in strip_duplicated_spans(docs, "doc_id", "text", k=5).collect()
    }
    assert out[1]["text_clean"] == "tail words here only once"
    assert out[1]["n_tokens"] == 11 and out[1]["tokens_removed"] == 6
    assert out[2]["text_clean"] == "prefix"
    assert out[2]["tokens_removed"] == 6


def test_strip_spans_keeps_clean_docs_intact(spark):
    from demy_spark.operators.subdoc import strip_duplicated_spans

    docs = _docs(spark, [(1, "Totally Unique Words Here"), (2, "other stuff")])
    out = {r["doc_id"]: r for r in strip_duplicated_spans(docs, "doc_id", "text").collect()}
    # normalization lowercases, but nothing is removed
    assert out[1]["text_clean"] == "totally unique words here"
    assert out[1]["tokens_removed"] == 0
    assert len(out) == 2
