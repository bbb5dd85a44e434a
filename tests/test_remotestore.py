"""EpiFiles-style remote store client (remotestore.py): the full
chunk/manifest/XML wire surface against an in-memory fake server —
zero network. The fake implements exactly the endpoints the reference
client speaks (EpiFiles.scala:20-185)."""

from __future__ import annotations

import pytest

from demy_spark.remotestore import (
    HttpFileStore,
    MemoryEpiServer,
    RemoteFile,
    fetch_to_spool,
)


# The in-memory server now ships IN the module (MemoryEpiServer) so
# the q143 oracle query, demos and these tests share one
# implementation; FakeServer stays as the local name.
FakeServer = MemoryEpiServer


@pytest.fixture()
def server():
    return FakeServer()


@pytest.fixture()
def store(server):
    return HttpFileStore(
        "http://remote", chunk_size=8, transport=server.transport
    )


def test_upload_download_roundtrip_chunked(store, server):
    data = b"0123456789abcdefghij"  # 20 bytes -> 3 chunks of 8
    fid = store.upload("corpus.txt", data, comment="crawl 2026-08")
    assert len(server.files[fid]["chunks"]) == 3
    assert store.download(fid) == data
    assert store.exists(fid)
    assert not store.exists("does-not-exist")


def test_find_newest_with_patterns(store):
    store.upload("a_v1.txt", b"1", comment="first")
    store.upload("a_v2.txt", b"2", comment="second batch")
    store.upload("other.bin", b"3", comment="second run")
    got = store.find(name_pattern=r"^a_")
    assert isinstance(got, RemoteFile) and got.name == "a_v2.txt"  # newest
    got = store.find(comment_pattern="second", name_pattern=r"\.bin$")
    assert got.name == "other.bin"
    assert store.find(name_pattern="zzz") is None
    assert store.modification_time(name_pattern=r"^a_") is not None


def test_put_write_modes_no_overwrite(store):
    fid = store.put("x.txt", b"one")
    # ignore_if_exists short-circuits to the existing id
    assert store.put("x.txt", b"two") == fid
    assert store.download(fid) == b"one"
    with pytest.raises(FileExistsError):
        store.put("x.txt", b"three", write_mode="fail_if_exists")
    with pytest.raises(ValueError):
        store.put("x.txt", b"four", write_mode="overwrite")


def test_get_lines_with_filter(store):
    store.upload("log.txt", b"keep 1\ndrop\nkeep 2\n", comment="logs")
    assert store.get_lines(name_pattern="log", line_pattern="^keep") == [
        "keep 1",
        "keep 2",
    ]
    assert store.get_lines(name_pattern="none") is None


def test_fetch_to_spool_then_spark_reads(store, spark, tmp_path):
    fid = store.upload("t.csv", b"k;v\n1;a\n2;b\n")
    p = str(tmp_path / "spool" / "t.csv")
    assert fetch_to_spool(store, fid, p) == p
    df = spark.read.option("header", "true").option("sep", ";").csv(p)
    assert df.count() == 2


def test_xml_special_chars_in_name_and_comment_roundtrip(store):
    """Filenames/comments containing &, <, > must survive the XML
    envelopes intact — the server escapes on emit and the ET client
    unescapes on parse (ADVICE r9: raw interpolation produced
    malformed XML that broke manifest/chunk parsing)."""
    name = "a&b <v2>.txt"
    comment = "batch <2> & final"
    fid = store.upload(name, b"payload", comment=comment)
    assert store.download(fid) == b"payload"
    got = store.find(name_pattern=r"a&b")
    assert got is not None and got.name == name
    assert got.comment == comment
