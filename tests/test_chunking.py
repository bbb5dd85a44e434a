"""Document chunking tests."""

from __future__ import annotations

import pytest

from demy_spark.operators.chunking import chunk_documents


def _chunks(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in chunk_documents(docs, "doc_id", "text", **kw).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["tok_start"], r["n_tokens"], r["chunk_text"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_chunk_overlap_and_tail(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _chunks(spark, [(1, text)], chunk_tokens=4, stride=3)
    assert got[1] == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
        (3, 9, 1, "t9"),  # short tail chunk
    ]


def test_chunk_disjoint_blocks_cover_exactly(spark):
    """stride == chunk_tokens partitions the token stream: chunks are
    disjoint and their token counts sum to the document length."""
    text = " ".join(f"w{i}" for i in range(11))
    got = _chunks(spark, [(1, text)], chunk_tokens=4, stride=4)
    assert [c[1] for c in got[1]] == [0, 4, 8]
    assert sum(c[2] for c in got[1]) == 11
    assert " ".join(c[3] for c in got[1]) == text.lower()


def test_chunk_empty_and_whitespace_docs_emit_nothing(spark):
    # NB "  \t " is NOT empty under the oracle contract: trim strips
    # spaces only (both engines), so the tab survives as one token
    got = _chunks(spark, [(1, ""), (2, "    "), (3, "one two")], chunk_tokens=4, stride=4)
    assert set(got) == {3}
    assert got[3] == [(0, 0, 2, "one two")]


def test_chunk_normalizes_via_contract_tokens(spark):
    # norm_tokens: lowercase + single-space contract
    got = _chunks(spark, [(1, "  Hello   WORLD  ")], chunk_tokens=8, stride=8)
    assert got[1] == [(0, 0, 2, "hello world")]


def test_chunk_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", stride=0)


def test_chunking_composes_into_streaming(spark, sf_dir, tmp_path):
    """chunk_documents is a stateless projection, so it drops into
    Structured Streaming unchanged — the crawl-firehose → chunker →
    training-shard shape. Streaming output must equal the batch run
    over the same files."""
    import os

    from pyspark.sql import types as T

    from demy_spark.streaming.windows import run_stream_to_memory

    src = os.path.join(sf_dir, "documents.parquet")
    stage = tmp_path / "docs_stream"
    stage.mkdir()
    os.symlink(src, stage / "documents.parquet")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(str(stage))
    assert stream.isStreaming
    out = chunk_documents(stream, "doc_id", "text", chunk_tokens=16, stride=12)
    got = run_stream_to_memory(out, "chunk_stream")
    batch = chunk_documents(
        spark.read.parquet(src), "doc_id", "text", chunk_tokens=16, stride=12
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    g, b = key(got), key(batch)
    assert g == b and len(g) > 0


def test_chunk_rejects_gap_stride(spark):
    """stride > chunk_tokens would silently drop the tokens between
    windows — refused (the docstring promises full coverage)."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=4, stride=8)
