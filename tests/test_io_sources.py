"""Source-format scans and checkpoint round-trips."""

from __future__ import annotations

import json
import os

from demy_spark.io import checkpoint, read_csv, read_json, read_text_corpus


def test_read_text_corpus(spark, tmp_path):
    p = os.path.join(str(tmp_path), "corpus.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("first line\nsecond line\n")
    df = read_text_corpus(spark, p)
    assert [r["line"] for r in df.orderBy("line").collect()] == [
        "first line",
        "second line",
    ]


def test_read_csv_semicolon_default(spark, tmp_path):
    p = os.path.join(str(tmp_path), "tracks.csv")
    with open(p, "w", encoding="utf-8") as f:
        f.write("grippe;fr\nflu;en\n")
    df = read_csv(spark, p)
    rows = [tuple(r) for r in df.collect()]
    assert ("grippe", "fr") in rows and ("flu", "en") in rows


def test_read_json(spark, tmp_path):
    p = os.path.join(str(tmp_path), "conf.json")
    with open(p, "w", encoding="utf-8") as f:
        f.write(json.dumps({"url": "http://x", "depth": 2}) + "\n")
    r = read_json(spark, p).first()
    assert (r["url"], r["depth"]) == ("http://x", 2)


def test_checkpoint_escapes_bad_column_names(spark, tmp_path):
    # column names parquet can't store must round-trip (util.scala:60-77)
    df = spark.range(3).withColumnRenamed("id", "my col,with{bad}chars")
    path = os.path.join(str(tmp_path), "snap")
    out = checkpoint(df, path)
    assert out.columns == ["my col,with{bad}chars"]
    assert out.count() == 3
