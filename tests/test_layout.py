"""Storage-layout operators: bucketed shuffle-free joins, partition
pruning, compaction — each asserted from the PHYSICAL PLAN or the file
layout, not just the result values (the oracle covers values via
q64/q65)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from demy_spark.operators import layout


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("wh"))
    db = "demy_layout_test"
    layout.ensure_database(spark, db, loc)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    layout.write_bucketed(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        f"{db}.orders_b",
        bucket_cols=["o_custkey"],
        num_buckets=4,
        sort_cols=["o_custkey"],
    )
    layout.write_bucketed(
        customer.select("c_custkey", "c_mktsegment"),
        f"{db}.customer_b",
        bucket_cols=["c_custkey"],
        num_buckets=4,
        sort_cols=["c_custkey"],
    )
    return db


def test_bucketed_join_has_no_exchange(spark, bucketed_db):
    j = layout.colocated_join(
        spark,
        f"{bucketed_db}.orders_b",
        f"{bucketed_db}.customer_b",
        lambda l, r: l["o_custkey"] == r["c_custkey"],
    )
    plan = layout.plan_string(j)
    assert "SortMergeJoin" in plan
    assert layout.exchange_count(j) == 0, plan
    assert layout.scan_is_bucketed(j)


def test_plain_join_pays_exchanges(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    j = orders.hint("merge").join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    )
    assert layout.exchange_count(j) >= 2


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed_db):
    j = layout.colocated_join(
        spark,
        f"{bucketed_db}.orders_b",
        f"{bucketed_db}.customer_b",
        lambda l, r: l["o_custkey"] == r["c_custkey"],
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    plain = orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
    assert j.count() == plain.count()
    a = j.agg(F.round(F.sum("o_totalprice"), 2)).first()[0]
    b = plain.agg(F.round(F.sum("o_totalprice"), 2)).first()[0]
    assert a == b


def test_partition_pruning_reads_only_matching_dirs(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_part")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    layout.write_partitioned(
        orders.select("o_orderkey", "o_orderpriority"), path, ["o_orderpriority"]
    )
    full = spark.read.parquet(path)
    pruned = full.where(F.col("o_orderpriority") == "1-URGENT")
    files = layout.pruned_files(pruned)
    assert files and all("o_orderpriority=1-URGENT" in f for f in files)
    assert len(files) < len(layout.pruned_files(full))
    assert (
        pruned.count()
        == orders.where(F.col("o_orderpriority") == "1-URGENT").count()
    )


def test_compaction_reduces_file_count(spark, sf_dir, tmp_path):
    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    orders.repartition(16).write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    n_dst = layout.compact_parquet(spark, src, dst, target_file_mb=128)
    assert n_src == 16
    assert n_dst < n_src
    assert spark.read.parquet(dst).count() == orders.count()


def test_zorder_bits_overflow_rejected(spark, sf_dir):
    """bits*len(cols) must fit a signed long: shiftleft wraps mod 64 on
    the JVM, which would silently corrupt the interleaved key."""
    from demy_spark.operators.layout import zorder_key

    df = spark.read.parquet(os.path.join(sf_dir, "part.parquet")).select(
        "p_retailprice", "p_size", "p_partkey"
    )
    cols5 = ["p_retailprice", "p_size", "p_partkey", "p_retailprice", "p_size"]
    with pytest.raises(ValueError, match="63"):
        zorder_key(df, cols5, bits=16)  # 80 bit positions
    with pytest.raises(ValueError, match="63"):
        zorder_key(df, cols5[:4], bits=16)  # 64: sign bit breaks ordering
    # 48 positions fits — must not raise
    zorder_key(df, ["p_retailprice", "p_size", "p_partkey"], bits=16)
