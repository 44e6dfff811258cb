"""Bucketed co-located join contracts.

The scale claim behind sources/bucketed.py is falsifiable in a plan
string: a join between two tables bucketed identically on the join key
must contain NO Exchange. These tests write small bucketed copies of
orders/lineitem into a temp warehouse and pin that plan shape, plus the
correctness of the joined result against the plain (shuffled) join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.plans.inspect import (
    join_strategies,
    num_shuffles,
    physical_plan,
)
from opentelemetry_iceberg_exporter_spark.sources.bucketed import (
    cobucketed_join,
    write_bucketed,
)
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], num_buckets=8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = cobucketed_join(spark, left, right, on=[("o_orderkey", "l_orderkey")])
    plan = physical_plan(joined, "simple")
    assert "SortMergeJoin" in join_strategies(joined) or "ShuffledHashJoin" not in plan
    assert num_shuffles(joined) == 0, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    l = spark.table(left)
    r = spark.table(right)
    bucketed = (
        l.join(r, l.o_orderkey == r.l_orderkey)
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").cast("double").alias("qty"),
        )
        .collect()[0]
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").cast("double").alias("qty"),
        )
        .collect()[0]
    )
    assert bucketed.n == plain.n
    assert abs(bucketed.qty - plain.qty) < 1e-6


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    """Bonus contract: groupBy on the bucket key aggregates in place."""
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_orderkey").agg(F.count("*").alias("n"))
    assert num_shuffles(agg) == 0, physical_plan(agg, "simple")


def test_bucket_pruning_on_equality_filter(spark, bucketed_tables):
    """Equality on the bucket column must prune to 1 of 8 buckets.

    autoBucketedScan=true drops bucketed reading for scans where no
    operator exploits the distribution — which also drops bucket
    pruning — so point-lookup workloads flip it off (see bucketed.py).
    """
    left, _ = bucketed_tables
    key = spark.table(left).select("o_orderkey").limit(1).collect()[0][0]
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        filtered = spark.table(left).filter(F.col("o_orderkey") == key)
        plan = physical_plan(filtered, "formatted")
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
