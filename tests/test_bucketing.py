"""Plan contracts for bucketed co-located joins (sources/sinks.py).

The 100 TB story under test: pre-bucketing both sides of a recurring join
on the join key eliminates the shuffle entirely. These tests machine-check
the physical plan, not just the row values — a regression that silently
reintroduces the exchange fails even though results stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drill_logfile_plugin_spark.sources.sinks import write_bucketed

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
        (F.col("id") * 10 % 997).cast("double").alias("o_totalprice"),
    )
    items = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("l_orderkey"),
        (F.col("id") % 50).alias("l_partkey"),
        (F.col("id") % 100).cast("double").alias("l_quantity"),
    )
    for t in ("b_orders", "b_items"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], N_BUCKETS, sort_by=["o_orderkey"]
    )
    write_bucketed(
        items, "b_items", ["l_orderkey"], N_BUCKETS, sort_by=["l_orderkey"]
    )
    yield orders, items
    for t in ("b_orders", "b_items"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _joined(spark):
    bo = spark.table("b_orders")
    bi = spark.table("b_items")
    return bo.join(bi, bo.o_orderkey == bi.l_orderkey)


@pytest.fixture()
def no_broadcast(spark):
    # At test scale the planner would broadcast (also shuffle-free, but not
    # the strategy under test); disable it so the plan must rely on the
    # bucket distribution — the situation two 100 TB fact tables are in.
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield
    spark.conf.set(key, old)


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair, no_broadcast):
    plan = _joined(spark)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_cobucketed_sorted_join_skips_sort(spark, bucketed_pair, no_broadcast):
    # sortBy at write time means the per-bucket merge needs no Sort either —
    # but since Spark 3.0 the scan only reports its sort order under the
    # legacy flag (multiple files per bucket would make the order a lie;
    # write_bucketed's repartition guarantees one file per bucket, making
    # the flag sound here).
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(key, "true")
    try:
        plan = _joined(spark)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, "false")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Sort " not in plan.replace("SortMergeJoin", ""), plan


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    orders, items = bucketed_pair
    expected = sorted(
        orders.join(items, orders.o_orderkey == items.l_orderkey).collect(),
        key=str,
    )
    got = sorted(_joined(spark).collect(), key=str)
    assert got == expected


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    # Aggregation on the bucket key also rides the existing distribution.
    agg = (
        spark.table("b_items")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
