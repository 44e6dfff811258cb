"""The write half of the native format: df.write.format('iceberg_fs')
commits executor-written files atomically; writeStream commits one
idempotent snapshot per epoch (exactly-once on replay)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog
from opentelemetry_iceberg_exporter_spark.sinks.transforms import bucket_value
from opentelemetry_iceberg_exporter_spark.sources.iceberg_source import (
    IcebergFsDataSource,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("v", StringType(), True),
    ]
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(IcebergFsDataSource)
    return spark


def _df(spark, lo, hi):
    return spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(lo, hi)])


class TestBatchWrite:
    def test_append_roundtrip_unpartitioned(self, registered, tmp_path):
        t = FsCatalog(str(tmp_path / "wh")).create_table("ns", "w1", SCHEMA)
        _df(registered, 0, 40).write.format("iceberg_fs").mode("append").save(t.location)
        assert sorted(r.id for r in t.read(registered).collect()) == list(range(40))
        # a second append is a second snapshot
        _df(registered, 40, 50).write.format("iceberg_fs").mode("append").save(t.location)
        assert t.read(registered).count() == 50
        assert len(t.snapshots()) == 2
        # and the native READ path sees it too
        assert (
            registered.read.format("iceberg_fs").load(t.location).count() == 50
        )

    def test_bucket_partition_values_recorded(self, registered, tmp_path):
        t = FsCatalog(str(tmp_path / "wh")).create_table(
            "ns", "w2", SCHEMA, partition_by=[("id", "bucket[4]")]
        )
        _df(registered, 0, 120).write.format("iceberg_fs").mode("append").save(t.location)
        files, _ = t.plan_files()
        assert {f.partition["id_bucket"] for f in files} <= {0, 1, 2, 3}
        for f in files:
            for r in registered.read.parquet(f.file_path).select("id").collect():
                assert bucket_value(r.id, 4, "long") == f.partition["id_bucket"]
        # point lookup prunes files written by the native writer
        keep, n_pruned = t.plan_files(source_predicate=("id", 7))
        assert n_pruned > 0

    def test_hourly_partition_values(self, registered, tmp_path):
        schema = StructType(
            [StructField("ts", TimestampType(), True), StructField("n", LongType(), True)]
        )
        t = FsCatalog(str(tmp_path / "wh")).create_table(
            "ns", "w3", schema, partition_source="ts", granularity="hourly"
        )
        df = registered.range(40).select(
            F.to_timestamp(
                F.lit("2024-03-01 00:30:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % 4).cast("int"))
            ).alias("ts"),
            F.col("id").alias("n"),
        )
        df.write.format("iceberg_fs").mode("append").save(t.location)
        files, _ = t.plan_files()
        hours = {f.partition["ts_hour"] for f in files}
        assert len(hours) == 4
        assert t.read(registered).count() == 40

    def test_overwrite_mode_refused(self, registered, tmp_path):
        t = FsCatalog(str(tmp_path / "wh")).create_table("ns", "w4", SCHEMA)
        with pytest.raises(Exception, match="append"):
            _df(registered, 0, 5).write.format("iceberg_fs").mode("overwrite").save(
                t.location
            )

    def test_empty_append_commits_nothing(self, registered, tmp_path):
        t = FsCatalog(str(tmp_path / "wh")).create_table("ns", "w5", SCHEMA)
        empty = registered.createDataFrame([], SCHEMA)
        empty.write.format("iceberg_fs").mode("append").save(t.location)
        assert t.snapshots() == []


class TestStreamWrite:
    def test_stream_into_catalog_exactly_once(self, registered, tmp_path):
        """rate-limited file source -> iceberg_fs sink: every input row
        lands exactly once, one snapshot per non-empty epoch, each
        stamped with its batch id."""
        src = tmp_path / "in"
        src.mkdir()
        t = FsCatalog(str(tmp_path / "wh")).create_table("ns", "ws", SCHEMA)
        _df(registered, 0, 20).coalesce(1).write.json(str(src / "a"))
        _df(registered, 20, 30).coalesce(1).write.json(str(src / "b"))
        q = (
            registered.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src / "*"))
            .writeStream.format("iceberg_fs")
            .option("path", t.location)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(r.id for r in t.read(registered).collect()) == list(range(30))
        snaps = t.snapshots()
        assert len(snaps) >= 2  # one per micro-batch
        batch_ids = {s["summary"].get("spark-batch-id") for s in snaps}
        assert None not in batch_ids and len(batch_ids) == len(snaps)

    def test_epoch_replay_is_idempotent(self, registered, tmp_path):
        """Simulate the restart-between-commit-and-checkpoint crash:
        re-committing an epoch whose batch id is already on main's
        ancestry must drop the duplicate files and keep ONE snapshot."""
        from opentelemetry_iceberg_exporter_spark.sources.iceberg_writer import (
            IcebergFsStreamWriter,
        )

        t = FsCatalog(str(tmp_path / "wh")).create_table("ns", "wr", SCHEMA)
        writer = IcebergFsStreamWriter({"path": t.location}, overwrite=False)
        batches = _df(registered, 0, 10).toArrow().to_batches()
        msg = writer.write(iter(batches))
        writer.commit([msg], batchId=7)
        assert t.read(registered).count() == 10
        # replay epoch 7 with fresh files
        writer2 = IcebergFsStreamWriter({"path": t.location}, overwrite=False)
        msg2 = writer2.write(iter(_df(registered, 0, 10).toArrow().to_batches()))
        writer2.commit([msg2], batchId=7)
        assert t.read(registered).count() == 10  # not duplicated
        assert len(t.snapshots()) == 1
        # and the replayed files were cleaned up
        import os

        for path, *_ in msg2.files:
            assert not os.path.exists(path)
