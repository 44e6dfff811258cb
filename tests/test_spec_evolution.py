"""Partition-spec evolution (Iceberg hidden-partitioning evolution).

A table partitioned hourly at low volume should switch to daily (or to
unpartitioned) WITHOUT rewriting history: the evolution is a
metadata-only commit, existing files keep their original spec (their
manifests record partition_spec_id and their own partition tuple), and
only new writes use the new layout. Scans prune on the default spec's
field and keep old-spec files conservatively.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import read_ocf
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    evolved_spec,
)

from rest_stub import make_server


def _df(spark, n=96, start="2024-03-01 00:00:00"):
    # one row per hour over 4 days -> 4 daily partitions, 96 hourly ones
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit(start).cast("timestamp")
                + F.make_interval(hours=F.col("id").cast("int"))
            ),
        )
        .withColumn("v", F.col("id") * 10)
    )


@pytest.fixture()
def fs_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "otel", "events", _df(spark).schema, partition_source="ts", granularity="hourly"
    )
    t.append_dataframe(_df(spark))
    return t


class TestEvolvedSpec:
    def test_fresh_field_id_above_last_partition_id(self, spark, fs_table):
        md = fs_table.metadata()
        spec = evolved_spec(md, "ts", "daily")
        assert spec["spec-id"] == 1
        assert spec["fields"][0]["name"] == "ts_day"
        assert spec["fields"][0]["transform"] == "days"
        assert spec["fields"][0]["field-id"] == md["last-partition-id"] + 1

    def test_noop_returns_none(self, spark, fs_table):
        assert evolved_spec(fs_table.metadata(), "ts", "hourly") is None

    def test_unknown_source_rejected(self, spark, fs_table):
        with pytest.raises(ValueError, match="nope"):
            evolved_spec(fs_table.metadata(), "nope", "daily")

    def test_round_trip_reuses_field_id(self, spark, fs_table):
        t = fs_table
        t.update_partition_spec("ts", "daily")
        t.update_partition_spec("ts", "hourly")
        md = t.metadata()
        specs = {s["spec-id"]: s for s in md["partition-specs"]}
        assert len(specs) == 3
        # hourly came back with its ORIGINAL field-id (Iceberg reuse rule)
        assert specs[2]["fields"] == specs[0]["fields"]


class TestFsEvolution:
    def test_new_writes_use_new_spec_old_files_untouched(self, spark, fs_table):
        t = fs_table
        old_files = {f.file_path for f in t.plan_files()[0]}
        sid = t.update_partition_spec("ts", "daily")
        assert sid == 1
        assert t.partition_spec()[0]["name"] == "ts_day"
        # old files still present, unrewritten
        assert {f.file_path for f in t.plan_files()[0]} == old_files

        t.append_dataframe(_df(spark, start="2024-04-01 00:00:00"))
        data, _, _ = t.plan_scan()
        new_files = [f for f in data if f.file_path not in old_files]
        # 4 days of data -> daily partition values on the new files
        new_vals = {f.partition.get("ts_day") for f in new_files}
        assert len(new_vals) == 4
        assert all(v is not None and 19000 < v < 20500 for v in new_vals), new_vals
        # old files carry the hourly field, not the daily one
        old = [f for f in data if f.file_path in old_files]
        assert all("ts_day" not in f.partition and "ts_hour" in f.partition for f in old)
        # read spans both specs
        assert t.read(spark).count() == 192

    def test_new_manifest_records_new_spec_id(self, spark, fs_table):
        t = fs_table
        t.update_partition_spec("ts", "daily")
        t.append_dataframe(_df(spark, start="2024-04-01 00:00:00"))
        snapshot = t.current_snapshot()
        _, _, manifests = read_ocf(snapshot["manifest-list"])
        by_spec = {m["partition_spec_id"] for m in manifests}
        assert by_spec == {0, 1}

    def test_pruning_on_new_spec_keeps_old_files_conservatively(self, spark, fs_table):
        t = fs_table
        t.update_partition_spec("ts", "daily")
        t.append_dataframe(_df(spark, start="2024-04-01 00:00:00"))
        # a 1-day window: of the 4 new daily files, 1 survives the prune;
        # all 96-hour-old-spec files are kept conservatively
        day = next(
            v
            for f in t.plan_files()[0]
            if (v := f.partition.get("ts_day")) is not None
        )
        files, pruned = t.plan_files(partition_range=(day, day))
        assert pruned == 3  # the other 3 daily files skipped
        kept_new = [f for f in files if f.partition.get("ts_day") is not None]
        assert len(kept_new) == 1
        # count parity with a row filter on the pruned scan
        assert t.read(spark, partition_range=(day, day)).count() >= 24

    def test_evolve_to_unpartitioned(self, spark, fs_table):
        t = fs_table
        sid = t.update_partition_spec(None)
        assert sid == 1
        assert t.partition_spec() == []
        t.append_dataframe(_df(spark, start="2024-05-01 00:00:00"))
        assert t.read(spark).count() == 192
        # appended files carry an empty partition tuple
        data, _, _ = t.plan_scan()
        fresh = [f for f in data if not f.partition]
        assert fresh

    def test_noop_evolution_commits_nothing(self, spark, fs_table):
        t = fs_table
        v = t.current_version()
        assert t.update_partition_spec("ts", "hourly") is None
        assert t.current_version() == v

    def test_mor_delete_across_specs(self, spark, fs_table):
        t = fs_table
        t.update_partition_spec("ts", "daily")
        t.append_dataframe(
            _df(spark, start="2024-04-01 00:00:00").withColumn(
                "id", F.col("id") + 1000
            )
        )
        sid, n = t.delete_where(spark, "v % 100 = 50", mode="merge-on-read")
        assert n == 20  # 10 per 96-row batch
        assert t.read(spark).count() == 172
        assert t.read(spark).filter("v % 100 = 50").count() == 0


class TestRestEvolution:
    def test_update_spec_over_rest(self, spark, tmp_path):
        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table(
                "otel", "events", _df(spark).schema, partition_source="ts"
            )
            t.append_dataframe(_df(spark))
            sid = t.update_partition_spec("ts", "daily")
            assert sid == 1
            md = t.metadata()
            assert md["default-spec-id"] == 1
            assert len(md["partition-specs"]) == 2
            t.append_dataframe(_df(spark, start="2024-04-01 00:00:00"))
            assert t.read(spark).count() == 192
            assert t.update_partition_spec("ts", "daily") is None  # no-op
        finally:
            server.shutdown()
