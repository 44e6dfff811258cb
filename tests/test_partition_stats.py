"""Partition statistics files (Iceberg spec "Partition Statistics").

One small Parquet per snapshot, registered under metadata
`partition-statistics`, answering "how big is each partition" without
walking manifests — pinned against the `partitions` inspection table
(computed independently from the manifest walk), with the spec's
field ids asserted on the written footer, merge-on-read delete counts
included, re-compute replacing the snapshot's entry, and REST parity
via the set-partition-statistics update action."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    read_partition_stats,
)

from rest_stub import make_server


def _df(spark, n=48, hours=4):
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % hours).cast("int"))
            ),
        )
        .withColumn("v", F.col("id") * 10)
    )


@pytest.fixture()
def fs_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
    t.append_dataframe(_df(spark))
    t.append_dataframe(_df(spark))
    return t


class TestFsPartitionStats:
    def test_matches_partitions_inspection_table(self, spark, fs_table):
        t = fs_table
        entry = t.compute_partition_stats()
        assert entry["snapshot-id"] == t.current_snapshot()["snapshot-id"]
        assert os.path.getsize(entry["statistics-path"]) == entry["file-size-in-bytes"]
        stats = {
            r["partition"]["ts_hour"]: (
                r["data_record_count"],
                r["data_file_count"],
                r["total_data_file_size_in_bytes"],
            )
            for r in t.partition_stats(spark).collect()
        }
        expect = {
            int(r["partition"]["ts_hour"]): (
                r["record_count"],
                r["file_count"],
                r["total_size_in_bytes"],
            )
            for r in t.metadata_table(spark, "partitions").collect()
        }
        assert stats == expect and len(stats) == 4

    def test_spec_field_ids_in_footer(self, spark, fs_table):
        import pyarrow.parquet as pq

        entry = fs_table.compute_partition_stats()
        schema = pq.read_schema(entry["statistics-path"])
        ids = {
            f.name: int(f.metadata[b"PARQUET:field_id"])
            for f in schema
            if f.metadata and b"PARQUET:field_id" in f.metadata
        }
        assert ids["partition"] == 1
        assert ids["spec_id"] == 2
        assert ids["data_record_count"] == 3
        assert ids["data_file_count"] == 4
        assert ids["total_data_file_size_in_bytes"] == 5
        # nested partition field carries the SPEC field id (>= 1000)
        part = schema.field("partition").type
        nested = part.field(0)
        assert int(nested.metadata[b"PARQUET:field_id"]) >= 1000

    def test_delete_counts_roll_up(self, spark, fs_table):
        t = fs_table
        _, n = t.delete_where(spark, "v < 50", mode="merge-on-read")
        assert n > 0
        t.compute_partition_stats()
        stats = t.partition_stats(spark)
        assert (
            stats.agg(F.sum("position_delete_record_count")).collect()[0][0] == n
        )
        assert stats.agg(F.sum("position_delete_file_count")).collect()[0][0] >= 1
        # data counts are raw file counts (deletes are separate columns)
        assert stats.agg(F.sum("data_record_count")).collect()[0][0] == 96

    def test_recompute_replaces_entry(self, spark, fs_table):
        t = fs_table
        t.compute_partition_stats()
        t.compute_partition_stats()
        md = t.metadata()
        sid = t.current_snapshot()["snapshot-id"]
        assert [e["snapshot-id"] for e in md["partition-statistics"]] == [sid]
        # older snapshot stats coexist with the current one's
        first = t.snapshots()[0]["snapshot-id"]
        t.compute_partition_stats(snapshot_id=first)
        assert {e["snapshot-id"] for e in t.metadata()["partition-statistics"]} == {
            sid,
            first,
        }

    def test_empty_table_returns_none(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh2"))
        t = cat.create_table("otel", "empty", _df(spark).schema, partition_source="ts")
        assert t.compute_partition_stats() is None
        with pytest.raises(ValueError, match="no partition statistics"):
            t.partition_stats(spark)

    def test_unregistered_snapshot_raises(self, spark, fs_table):
        fs_table.compute_partition_stats()
        first = fs_table.snapshots()[0]["snapshot-id"]
        with pytest.raises(ValueError, match="no partition statistics"):
            read_partition_stats(spark, fs_table.metadata(), first)


class TestRestPartitionStats:
    def test_rest_parity(self, spark, tmp_path):
        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri)
            client.ensure_namespace("otel")
            t = client.ensure_table(
                "otel", "ev", _df(spark).schema, partition_source="ts"
            )
            t.append_dataframe(_df(spark))
            entry = t.compute_partition_stats()
            assert entry is not None
            md = t.metadata()
            assert md["partition-statistics"] == [entry]
            stats = {
                r["partition"]["ts_hour"]: r["data_record_count"]
                for r in t.partition_stats(spark).collect()
            }
            assert sum(stats.values()) == 48 and len(stats) == 4
        finally:
            server.shutdown()


class TestExpiryCleansStats:
    def test_expire_drops_expired_snapshot_stats(self, spark, fs_table):
        t = fs_table
        first = t.snapshots()[0]["snapshot-id"]
        current = t.current_snapshot()["snapshot-id"]
        e_old = t.compute_partition_stats(snapshot_id=first)
        e_cur = t.compute_partition_stats()
        t.rewrite_data_files(spark, target_bytes=1 << 20, min_files=2)
        t.expire_snapshots(keep_last=1)
        remaining = t.metadata().get("partition-statistics", [])
        assert first not in {e["snapshot-id"] for e in remaining}
        assert current not in {e["snapshot-id"] for e in remaining}
        assert not os.path.exists(e_old["statistics-path"])
        assert not os.path.exists(e_cur["statistics-path"])
