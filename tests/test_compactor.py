"""Small-file compaction round-trip + planning contracts."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.recovery.compactor import (
    compact_table,
    plan_compaction,
    partition_file_stats,
)
from opentelemetry_iceberg_exporter_spark.recovery.scanner import scan_files
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table


@pytest.fixture()
def fragmented_table(spark, sf_dir, tmp_path):
    """A Hive-partitioned table where each partition holds 8 tiny files —
    the post-ingestion state compaction exists to repair."""
    root = str(tmp_path / "warehouse")
    events = load_table(spark, sf_dir, "events").withColumn(
        "year", F.year("ts")
    ).withColumn("month", F.month("ts"))
    (
        events.repartition(8)  # 8 files per partition
        .write.partitionBy("year", "month")
        .parquet(f"{root}/events/data")
    )
    return root


def test_plan_targets_fragmented_partitions(spark, fragmented_table):
    files = scan_files(spark, fragmented_table)
    plan = plan_compaction(files, target_bytes=128 * 1024 * 1024).collect()
    stats = {r.partition_dir: r for r in partition_file_stats(files).collect()}
    assert plan, "expected fragmented partitions in the plan"
    for row in plan:
        assert row.n_files == 8
        # tiny partitions always compact to a single file
        assert row.target_files == 1
        assert stats[row.partition_dir].total_bytes == row.total_bytes


def test_compact_round_trip_preserves_data(spark, fragmented_table):
    root = fragmented_table
    before = spark.read.parquet(f"{root}/events/data")
    n_before = before.count()
    sum_before = before.agg(F.sum(F.hash("event_id"))).collect()[0][0]

    results = compact_table(spark, root)
    assert results, "expected at least one compacted partition"
    for r in results:
        assert r.files_before == 8
        assert r.files_after == 1

    files_left = glob.glob(f"{root}/events/data/**/*.parquet", recursive=True)
    per_dir: dict[str, int] = {}
    for f in files_left:
        per_dir[os.path.dirname(f)] = per_dir.get(os.path.dirname(f), 0) + 1
    assert all(n == 1 for n in per_dir.values()), per_dir

    after = spark.read.parquet(f"{root}/events/data")
    assert after.count() == n_before
    assert after.agg(F.sum(F.hash("event_id"))).collect()[0][0] == sum_before


def test_dry_run_touches_nothing(spark, fragmented_table):
    root = fragmented_table
    files_before = sorted(
        glob.glob(f"{root}/events/data/**/*.parquet", recursive=True)
    )
    results = compact_table(spark, root, dry_run=True)
    assert results and all(r.rows == -1 for r in results)
    assert (
        sorted(glob.glob(f"{root}/events/data/**/*.parquet", recursive=True))
        == files_before
    )


def test_already_compact_partition_not_planned(spark, sf_dir, tmp_path):
    root = str(tmp_path / "warehouse2")
    nation = load_table(spark, sf_dir, "nation")
    nation.coalesce(1).write.parquet(f"{root}/nation/data/year=2024")
    plan = plan_compaction(scan_files(spark, root)).collect()
    assert plan == []
