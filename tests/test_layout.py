"""Z-order clustering contracts: row preservation, multi-column
locality, and the plan shape (one range shuffle, no UDFs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.layout import (
    cluster_by_zorder,
    file_stat_ranges,
)
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

N_FILES = 16


def _avg_range(stats: list[dict], col: str, full_span: float) -> float:
    """Mean per-partition value-range width, normalized by the full
    column span (1.0 = every file covers everything = no pruning)."""
    widths = [
        (s[f"max_{col}"] - s[f"min_{col}"]) / full_span
        for s in stats
        if s[f"max_{col}"] is not None
    ]
    return sum(widths) / len(widths)


def test_zorder_preserves_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    clustered = cluster_by_zorder(li, ["l_orderkey", "l_partkey"], N_FILES)
    assert clustered.count() == li.count()
    assert (
        clustered.agg(F.sum("l_quantity")).first()[0]
        == li.agg(F.sum("l_quantity")).first()[0]
    )
    assert clustered.columns == li.columns  # helper key dropped


def test_zorder_tightens_both_columns(spark, sf_dir):
    """The point of Z-order vs a linear sort: per-file ranges shrink on
    BOTH clustered columns. A sort by l_orderkey alone leaves l_partkey
    ranges at ~full width (no pruning on the second predicate)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    spans = li.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("a"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("b"),
    ).first()

    z = cluster_by_zorder(li, ["l_orderkey", "l_partkey"], N_FILES)
    z_stats = file_stat_ranges(z, ["l_orderkey", "l_partkey"])
    linear = li.repartitionByRange(N_FILES, "l_orderkey")
    lin_stats = file_stat_ranges(linear, ["l_orderkey", "l_partkey"])

    # the linear layout wins on its sort column but fails on the other
    assert _avg_range(lin_stats, "l_partkey", spans["b"]) > 0.9
    # z-order: both columns substantially narrower than full width
    z_a = _avg_range(z_stats, "l_orderkey", spans["a"])
    z_b = _avg_range(z_stats, "l_partkey", spans["b"])
    assert z_a < 0.5 and z_b < 0.5, (z_a, z_b)


def test_zorder_plan_is_one_range_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    plan = (
        cluster_by_zorder(li, ["l_orderkey", "l_partkey"], N_FILES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("rangepartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sort_by_zorder_orders_rows_without_shuffle(spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.operators.layout import sort_by_zorder

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .coalesce(1)
    )
    out = sort_by_zorder(li, ["l_orderkey", "l_partkey"])
    # row-preserving
    assert out.count() == li.count()
    # no exchange added beyond the coalesce (sortWithinPartitions is
    # shuffle-free)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan
    assert "Sort" in plan
