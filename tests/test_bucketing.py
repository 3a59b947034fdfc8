"""Bucketed tables: the co-located join/aggregate plan shapes and value
parity with the unbucketed plans."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from docs2kg_spark.io.bucketing import write_bucketed

SF = "/root/testdata/sf0.001"


def _ops(df):
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return Counter(re.findall(r"\(\d+\) ([A-Za-z]+)", plan))


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(orders, "t_orders_b", "o_custkey", 8)
    write_bucketed(cust, "t_cust_b", "c_custkey", 8)
    yield spark.table("t_orders_b"), spark.table("t_cust_b"), orders, cust
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_bucketed_join_is_exchange_free(spark, bucketed):
    ob, cb, _, _ = bucketed
    # disable broadcast so the join strategy is SMJ on both variants
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ob.join(cb, ob["o_custkey"] == cb["c_custkey"]).select(
            "o_orderkey", "c_name"
        )
        ops = _ops(j)
        assert ops["SortMergeJoin"] == 1
        assert ops["Exchange"] == 0  # both sides read pre-bucketed
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_pays_two_exchanges(spark, bucketed):
    _, _, orders, cust = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
            "o_orderkey", "c_name"
        )
        assert _ops(j)["Exchange"] == 2  # the cost bucketing pre-pays
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_is_exchange_free(spark, bucketed):
    ob, _, _, _ = bucketed
    agg = ob.groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert _ops(agg)["Exchange"] == 0


def test_value_parity_with_unbucketed(spark, bucketed):
    ob, cb, orders, cust = bucketed
    a = sorted(
        ob.join(cb, ob["o_custkey"] == cb["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    b = sorted(
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# TableStore.compact — small-file compaction for unpartitioned tables
# ---------------------------------------------------------------------------


def test_compact_merges_small_files_and_preserves_rows(spark, tmp_path):
    import os

    from docs2kg_spark.io.sinks import TableStore

    store = TableStore(spark, str(tmp_path))
    df = spark.range(0, 1000).withColumnRenamed("id", "v")
    # simulate many tiny delta appends
    for i in range(8):
        store.append(df.filter((F.col("v") % 8) == i).repartition(4), "t")
    before = {tuple(r) for r in store.read("t").collect()}
    files_before = sum(
        f.endswith(".parquet") for f in os.listdir(store.path("t"))
    )
    assert files_before >= 16

    res = store.compact("t", target_file_bytes=1 << 30)
    assert res["rewritten"] and res["files_after"] == 1
    files_after = sum(f.endswith(".parquet") for f in os.listdir(store.path("t")))
    assert files_after == 1
    assert {tuple(r) for r in store.read("t").collect()} == before
    # no leftover swap dirs
    assert not os.path.exists(store.path("t") + "__compact_tmp")
    assert not os.path.exists(store.path("t") + "__compact_old")


def test_compact_noop_when_already_packed(spark, tmp_path):
    from docs2kg_spark.io.sinks import TableStore

    store = TableStore(spark, str(tmp_path))
    store.write(spark.range(0, 10).coalesce(1), "t")
    res = store.compact("t", target_file_bytes=1 << 30)
    assert not res["rewritten"] and res["files_before"] == res["files_after"]


def test_compact_refuses_partitioned_delta_logs(spark, tmp_path):
    import pytest as _pytest

    from docs2kg_spark.io.sinks import TableStore

    store = TableStore(spark, str(tmp_path))
    store.append_batch(spark.range(0, 10).withColumnRenamed("id", "v"), "log", 0)
    with _pytest.raises(ValueError, match="partitioned layout"):
        store.compact("log")


def test_compact_preserves_resume_marker(spark, tmp_path):
    """Compaction rewrites bytes, not content: a stage marker written
    before compaction must still satisfy stage_complete after."""
    from docs2kg_spark.io.sinks import TableStore

    store = TableStore(spark, str(tmp_path))
    for i in range(4):
        store.append(spark.range(i * 10, (i + 1) * 10).repartition(3), "seg")
    store.write_marker("seg", "fp123")
    store.compact("seg", target_file_bytes=1 << 30)
    assert store.stage_complete("seg", "fp123")
    assert store.read("seg").count() == 40
