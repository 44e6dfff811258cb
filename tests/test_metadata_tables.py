"""Iceberg-style metadata inspection tables (snapshots / history /
files / all_files / manifests) over both catalog transports, plus the
`inspect` CLI. Layout follows the public Iceberg metadata-table columns
(required subset); values are cross-checked against the raw metadata
and the physical files."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

from rest_stub import make_server


@pytest.fixture()
def table_with_history(spark, tmp_path):
    df = (
        spark.range(40)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % 4).cast("int"))
            ),
        )
        .withColumn("name", F.concat(F.lit("n"), F.col("id")))
    )
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "ev", df.schema, partition_source="ts")
    s1 = t.append_dataframe(df.filter("id < 20"))
    s2 = t.append_dataframe(df.filter("id >= 20"))
    return t, (s1, s2), df


class TestMetadataTables:
    def test_snapshots(self, spark, table_with_history):
        t, (s1, s2), _ = table_with_history
        rows = {r["snapshot_id"]: r for r in t.metadata_table(spark, "snapshots").collect()}
        assert set(rows) == {s1, s2}
        assert rows[s1]["parent_id"] is None and rows[s2]["parent_id"] == s1
        assert rows[s2]["operation"] == "append"
        assert rows[s2]["summary"]["added-data-files"] == "4"  # 4 hour partitions
        assert rows[s1]["committed_at"] <= rows[s2]["committed_at"]

    def test_history_marks_current_ancestors(self, spark, table_with_history):
        t, (s1, s2), _ = table_with_history
        rows = {r["snapshot_id"]: r for r in t.metadata_table(spark, "history").collect()}
        assert rows[s1]["is_current_ancestor"] and rows[s2]["is_current_ancestor"]

    def test_files_matches_plan_and_footers(self, spark, table_with_history):
        t, _, _ = table_with_history
        files = t.metadata_table(spark, "files").collect()
        planned = {f.file_path for f in t.plan_files()[0]}
        assert {r["file_path"] for r in files} == planned
        for r in files:
            assert r["file_size_in_bytes"] == os.path.getsize(r["file_path"])
            assert r["partition"].get("ts_hour") is not None
        # files (current) vs all_files (every snapshot): appends carry
        # forward, so they agree here
        assert t.metadata_table(spark, "all_files").count() == len(files)

    def test_all_files_keeps_rewritten_history(self, spark, table_with_history):
        t, _, _ = table_with_history
        t.rewrite_data_files(spark, target_bytes=1 << 20, min_files=2)
        live = {r["file_path"] for r in t.metadata_table(spark, "files").collect()}
        every = {r["file_path"] for r in t.metadata_table(spark, "all_files").collect()}
        assert live < every  # old pre-compaction files still time-travelable

    def test_manifests(self, spark, table_with_history):
        t, (s1, s2), _ = table_with_history
        rows = t.metadata_table(spark, "manifests").collect()
        # current snapshot carries its own manifest + s1's forward
        assert {r["added_snapshot_id"] for r in rows} == {s1, s2}
        for r in rows:
            assert r["length"] == os.path.getsize(r["path"])
            assert r["added_data_files_count"] == 4

    def test_refs(self, spark, table_with_history):
        t, (s1, _), _ = table_with_history
        t.set_ref("release-1", s1, "tag")
        rows = {r.name: r for r in t.metadata_table(spark, "refs").collect()}
        assert rows["release-1"].type == "tag"
        assert rows["release-1"].snapshot_id == s1

    def test_partitions_rollup(self, spark, table_with_history):
        t, _, df = table_with_history
        rows = t.metadata_table(spark, "partitions").collect()
        # 4 distinct hours -> 4 partitions, counts roll up to the table
        assert len(rows) == 4
        assert sum(r.record_count for r in rows) == df.count()
        assert all(r.file_count >= 1 and r.total_size_in_bytes > 0 for r in rows)
        # per-partition record counts match a real group-by on the data
        want = {
            str(r.h): r.c
            for r in t.read(spark)
            .groupBy((F.unix_timestamp("ts") / 3600).cast("long").alias("h"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        got = {r.partition["ts_hour"]: r.record_count for r in rows}
        assert got == want

    def test_unknown_name_raises(self, spark, table_with_history):
        t, _, _ = table_with_history
        with pytest.raises(ValueError, match="unknown metadata table"):
            t.metadata_table(spark, "nope")

    def test_rest_table_same_surface(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            df = spark.range(6).withColumn(
                "ts", F.to_timestamp(F.lit("2024-03-01 00:00:00"))
            )
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "m", df.schema, partition_source="ts")
            sid = t.append_dataframe(df)
            snaps = t.metadata_table(spark, "snapshots").collect()
            assert [r["snapshot_id"] for r in snaps] == [sid]
            assert t.metadata_table(spark, "files").count() == 1
        finally:
            server.shutdown()


class TestInspectCli:
    def test_inspect_snapshots_json(self, spark, table_with_history, capsys):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        t, (s1, s2), _ = table_with_history
        warehouse = os.path.dirname(os.path.dirname(t.location))
        rc = main(
            [
                "inspect",
                "--warehouse",
                warehouse,
                "--table",
                "ev",
                "--what",
                "snapshots",
            ]
        )
        assert rc == 0
        lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
        assert {ln["snapshot_id"] for ln in lines} == {s1, s2}
