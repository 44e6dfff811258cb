"""Executable Iceberg catalog semantics (pure-Python filesystem catalog).

The container has no Iceberg jars, so C1/C2/K3/K4 were previously tested
only at SQL-generation level. These tests run the actual commit protocol
end to end via sinks/iceberg_fs.py: create-if-absent DDL, atomic
snapshot append with the reference's snapshot properties
(writer.go:256-297), add_files over the raw sink's Hive layout
(catalog_rest.go:306-367), snapshot isolation / time travel, and
manifest-level partition pruning.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark import schemas as S
from opentelemetry_iceberg_exporter_spark.config import (
    CatalogConfig,
    ExporterConfig,
    PartitionConfig,
    StorageConfig,
)
from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import (
    MAGIC,
    read_ocf,
    write_ocf,
)
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    CommitConflictError,
    FsCatalog,
    iceberg_schema,
    transform_value,
)
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import FsIcebergSink
from opentelemetry_iceberg_exporter_spark.streaming import export_batch

from test_otlp_flatten import _span, _traces_payload
from test_sinks_pipeline import _write_jsonl
from datetime import datetime, timezone


# --------------------------------------------------------------------------
# Avro object container files
# --------------------------------------------------------------------------

AVRO_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "flag", "type": "boolean"},
        {"name": "d", "type": "double"},
    ],
}

AVRO_ROWS = [
    {"s": "héllo", "n": -(2**40), "opt": None, "arr": [1, -2, 3], "m": {"a": "x"}, "flag": True, "d": 1.5},
    {"s": "", "n": 0, "opt": 7, "arr": [], "m": {}, "flag": False, "d": -0.25},
]


class TestAvroOcf:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.avro")
        length = write_ocf(path, AVRO_SCHEMA, AVRO_ROWS, {"k": "v"})
        assert length == os.path.getsize(path)
        schema, meta, rows = read_ocf(path)
        assert rows == AVRO_ROWS
        assert schema["name"] == "t"
        assert meta["k"] == "v"

    def test_container_structure(self, tmp_path):
        """Golden structural bytes: magic, then the metadata map must be
        parseable and carry the embedded schema + null codec."""
        path = str(tmp_path / "t.avro")
        write_ocf(path, AVRO_SCHEMA, AVRO_ROWS)
        raw = open(path, "rb").read()
        assert raw[:4] == MAGIC
        _, meta, _ = read_ocf(path)
        assert meta["avro.codec"] == "null"
        assert json.loads(meta["avro.schema"]) == AVRO_SCHEMA

    def test_empty_file(self, tmp_path):
        path = str(tmp_path / "e.avro")
        write_ocf(path, AVRO_SCHEMA, [])
        _, _, rows = read_ocf(path)
        assert rows == []


# --------------------------------------------------------------------------
# catalog DDL (C1/C2) + metadata shape (R4)
# --------------------------------------------------------------------------


@pytest.fixture()
def events_df(spark):
    """100 rows spread over 4 distinct hours, with a proper timestamp."""
    return (
        spark.range(100)
        .select(
            F.col("id").alias("event_id"),
            F.to_timestamp(
                F.lit("2024-03-01 00:30:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % 4).cast("int"))
            ).alias("ts"),
            (F.col("id") * 2).alias("value"),
        )
    )


class TestCatalog:
    def test_create_and_reload(self, tmp_path, events_df):
        cat = FsCatalog(str(tmp_path))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        md = t.metadata()
        assert md["format-version"] == 2
        assert md["current-snapshot-id"] == -1
        spec = t.partition_spec()
        assert spec == [
            {"name": "ts_hour", "transform": "hours", "source-id": 2, "field-id": 1000}
        ]
        # create-if-absent: second create loads, does not reset
        again = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        assert again.metadata()["table-uuid"] == md["table-uuid"]

    def test_schema_field_ids(self, spark):
        df = spark.createDataFrame([], "a bigint, b array<string>, c string")
        schema = iceberg_schema(df.schema)
        ids = [f["id"] for f in schema["fields"]]
        assert ids == [1, 2, 3]  # top-level first
        assert schema["fields"][1]["type"]["element-id"] == 4  # nested after

    def test_transform_values(self):
        ts = datetime(2024, 3, 1, 5, tzinfo=timezone.utc)
        assert transform_value(ts, "hours") == int(ts.timestamp()) // 3600
        assert transform_value(ts, "days") == int(ts.timestamp()) // 86400
        assert transform_value(ts, "months") == (2024 - 1970) * 12 + 2


# --------------------------------------------------------------------------
# append + snapshot isolation + time travel (K3)
# --------------------------------------------------------------------------


class TestAppend:
    def test_roundtrip(self, spark, tmp_path, events_df):
        cat = FsCatalog(str(tmp_path))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        sid = t.append_dataframe(events_df, {"otel.record_count": "100"})

        got = t.read(spark)
        assert got.count() == 100
        assert sorted(got.columns) == ["event_id", "ts", "value"]  # hidden partition col
        assert (
            got.agg(F.sum("value")).first()[0]
            == events_df.agg(F.sum("value")).first()[0]
        )
        snap = t.current_snapshot()
        assert snap["snapshot-id"] == sid
        assert snap["summary"]["otel.record_count"] == "100"
        assert snap["summary"]["operation"] == "append"

    def test_time_travel(self, spark, tmp_path, events_df):
        cat = FsCatalog(str(tmp_path))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        first = t.append_dataframe(events_df.filter("event_id < 40"))
        second = t.append_dataframe(events_df.filter("event_id >= 40"))

        assert [s["snapshot-id"] for s in t.snapshots()] == [first, second]
        assert t.read(spark).count() == 100
        assert t.read(spark, snapshot_id=first).count() == 40
        # sequence numbers are monotonic; parent chain links the snapshots
        snaps = t.snapshots()
        assert snaps[1]["parent-snapshot-id"] == first
        assert snaps[1]["sequence-number"] == snaps[0]["sequence-number"] + 1

    def test_partition_pruning(self, spark, tmp_path, events_df):
        """Files outside the requested hour range are skipped at the
        MANIFEST level — the scan plan never lists them."""
        cat = FsCatalog(str(tmp_path))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        t.append_dataframe(events_df)
        base_hour = int(
            datetime(2024, 3, 1, 0, tzinfo=timezone.utc).timestamp()
        ) // 3600

        all_files, _ = t.plan_files()
        kept, pruned = t.plan_files(partition_range=(base_hour, base_hour + 1))
        assert pruned > 0
        assert len(kept) + pruned == len(all_files)
        got = t.read(spark, partition_range=(base_hour, base_hour + 1))
        expect = events_df.filter(
            F.expr(f"CAST(ts AS LONG) div 3600 BETWEEN {base_hour} AND {base_hour + 1}")
        )
        assert got.count() == expect.count() > 0

    def test_reader_trusts_manifests_not_directory(self, spark, tmp_path, events_df):
        """Iceberg's core consistency property: uncommitted files in the
        data directory are INVISIBLE (a crashed writer leaves garbage
        bytes, never phantom rows)."""
        cat = FsCatalog(str(tmp_path))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        t.append_dataframe(events_df.filter("event_id < 10"))
        # a crashed second writer: data files written, commit never ran
        orphan_dir = os.path.join(t.location, "data", "orphan")
        events_df.filter("event_id >= 10").write.parquet(orphan_dir)

        assert t.read(spark).count() == 10
        assert len(glob.glob(os.path.join(orphan_dir, "*.parquet"))) > 0

    def test_commit_conflict(self, tmp_path, events_df):
        cat = FsCatalog(str(tmp_path))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        # another writer claims the next version first
        v = t.current_version()
        with open(os.path.join(t.location, "metadata", f"v{v + 1}.metadata.json"), "w") as f:
            f.write("{}")
        with pytest.raises(CommitConflictError):
            t.append_dataframe(events_df)


# --------------------------------------------------------------------------
# exporter sink surface (C1/C2/K3/K4 through the pipeline)
# --------------------------------------------------------------------------


def _fs_config(tmp_path) -> ExporterConfig:
    return ExporterConfig(
        storage=StorageConfig(provider="filesystem", bucket=str(tmp_path), prefix="raw"),
        catalog=CatalogConfig(catalog_type="fs", warehouse=str(tmp_path / "warehouse")),
        partition=PartitionConfig(granularity="hourly"),
    )


    def test_fanout_spreads_hot_partition(self, spark, tmp_path):
        """A backfill concentrated in ONE hour must not funnel through a
        single writer: fanout splits the partition into multiple files,
        all correctly recorded and read back."""
        df = spark.range(400).select(
            F.col("id").alias("event_id"),
            F.to_timestamp(F.lit("2024-03-01 00:30:00")).alias("ts"),  # one hour
            (F.col("id") * 2).alias("value"),
        )
        cat = FsCatalog(str(tmp_path))
        plain = cat.create_table("ns", "plain", df.schema, "ts", "hourly")
        plain.append_dataframe(df)
        fan = cat.create_table("ns", "fan", df.schema, "ts", "hourly")
        fan.append_dataframe(df, fanout=4)
        n_plain = len(plain.plan_files()[0])
        n_fan = len(fan.plan_files()[0])
        assert n_plain == 1  # default: one large file for the hour
        assert n_fan > 1  # fanout: several writers shared the hour
        hours = {f.partition["ts_hour"] for f in fan.plan_files()[0]}
        assert len(hours) == 1  # still ONE logical partition
        got = fan.read(spark)
        assert got.count() == 400
        assert sorted(r.event_id for r in got.collect()) == list(range(400))


class TestFsIcebergSink:
    def test_ensure_all_tables(self, spark, tmp_path):
        sink = FsIcebergSink(spark, _fs_config(tmp_path))
        tables = sink.ensure_all_tables()
        assert len(tables) == len(S.ALL_SIGNALS)
        for table in tables:
            t = sink.catalog.load_table("otel", table)
            assert t.partition_spec()[0]["transform"] == "hours"
            # the reserved format-version property is CONSUMED at create
            # (real-catalog semantics): the metadata field is authoritative
            assert t.metadata()["format-version"] == 2

    def test_export_batch_to_iceberg(self, spark, tmp_path):
        """The reference's main loop, executed: OTLP/JSON batch ->
        flatten -> conform -> Iceberg snapshot commit -> read back."""
        cfg = _fs_config(tmp_path)
        inp = tmp_path / "in" / "traces.jsonl"
        _write_jsonl(str(inp), [_traces_payload([_span()])])
        export_batch(spark, str(inp.parent), "traces", cfg)

        sink = FsIcebergSink(spark, cfg)
        got = sink.read(S.SIGNAL_TRACES)
        assert got.count() == 1
        row = got.first()
        assert row.service_name == "svc-a"
        t = sink.catalog.load_table("otel", sink._table_name(S.SIGNAL_TRACES))
        summary = t.current_snapshot()["summary"]
        assert summary["otel.exporter"] == "opentelemetry-iceberg-exporter-spark"

    def test_add_files_registers_hive_layout(self, spark, tmp_path, events_df):
        """K4: the raw sink's year=/month=/day=/hour= files join the
        table by METADATA only — same inode, no copy."""
        hive_dir = str(tmp_path / "hive")
        (
            events_df.withColumn("year", F.date_format("ts", "yyyy"))
            .withColumn("month", F.date_format("ts", "MM"))
            .withColumn("day", F.date_format("ts", "dd"))
            .withColumn("hour", F.date_format("ts", "HH"))
            .repartition(2)
            .write.partitionBy("year", "month", "day", "hour")
            .parquet(hive_dir)
        )
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        t.add_files_hive(hive_dir)

        files, _ = t.plan_files()
        assert files and all(f.file_path.startswith(os.path.abspath(hive_dir)) for f in files)
        assert t.read(spark).count() == 100
        # partition transform values derived from the Hive path
        base_hour = int(datetime(2024, 3, 1, 0, tzinfo=timezone.utc).timestamp()) // 3600
        hours = {f.partition["ts_hour"] for f in files}
        assert hours == {base_hour + i for i in range(4)}


# --------------------------------------------------------------------------
# recovery against the REAL catalog (S6 + T1-T6 + X1, executed)
# --------------------------------------------------------------------------

from opentelemetry_iceberg_exporter_spark.recovery.fs_adapter import (  # noqa: E402
    recover_fs_warehouse,
)


class TestRecoveryAgainstFsCatalog:
    def _crashed_append(self, t, df):
        """A writer that died after the Spark job, before the commit:
        data files exist under data/, no snapshot references them."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            transform_column,
        )

        pf = t.partition_spec()[0]
        orphan_dir = os.path.join(t.location, "data", "crashed")
        (
            df.withColumn(pf["name"], transform_column("ts", pf["transform"]))
            .write.partitionBy(pf["name"])
            .parquet(orphan_dir)
        )

    def test_orphans_reenter_the_table(self, spark, tmp_path, events_df):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "ev", events_df.schema, "ts", "hourly")
        t.append_dataframe(events_df.filter("event_id < 60"))
        self._crashed_append(t, events_df.filter("event_id >= 60"))
        assert t.read(spark).count() == 60  # invisible until recovered

        res = recover_fs_warehouse(spark, cat, "otel", ["ev"])
        assert res.orphaned == res.recovered > 0
        assert res.failed == 0 and res.catalog_only == 0
        assert t.read(spark).count() == 100
        # recovered files carry partition values parsed from their paths
        files, _ = t.plan_files()
        assert all("ts_hour" in f.partition for f in files)
        # add_files snapshot is marked as recovery
        assert t.current_snapshot()["summary"]["otel.recovery"] == "true"

    def test_dry_run_changes_nothing(self, spark, tmp_path, events_df):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "ev", events_df.schema, "ts", "hourly")
        t.append_dataframe(events_df.filter("event_id < 60"))
        self._crashed_append(t, events_df.filter("event_id >= 60"))
        before = t.current_version()

        res = recover_fs_warehouse(spark, cat, "otel", ["ev"], dry_run=True)
        assert res.orphaned > 0 and res.recovered == 0
        assert t.current_version() == before
        assert t.read(spark).count() == 60

    def test_catalog_only_detects_deleted_storage(self, spark, tmp_path, events_df):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "ev", events_df.schema, "ts", "hourly")
        t.append_dataframe(events_df)
        victim = t.plan_files()[0][0].file_path
        os.remove(victim)

        res = recover_fs_warehouse(spark, cat, "otel", ["ev"], dry_run=True)
        assert res.catalog_only == 1


# --------------------------------------------------------------------------
# table maintenance: rewrite_data_files + expire_snapshots
# --------------------------------------------------------------------------


class TestMaintenance:
    def _small_file_table(self, spark, tmp_path, events_df):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        # two appends covering the SAME hours -> 2 small files per partition
        t.append_dataframe(events_df.filter("event_id < 50"))
        t.append_dataframe(events_df.filter("event_id >= 50"))
        return t

    def test_rewrite_compacts_partitions(self, spark, tmp_path, events_df):
        t = self._small_file_table(spark, tmp_path, events_df)
        before, _ = t.plan_files()
        pre_rewrite_snapshot = t.current_snapshot()["snapshot-id"]

        sid = t.rewrite_data_files(spark, target_bytes=1 << 20, min_files=2)
        assert sid is not None
        after, _ = t.plan_files()
        assert len(after) == 4  # one file per hour partition
        assert len(after) < len(before)
        # rows and values unchanged
        assert t.read(spark).count() == 100
        assert t.read(spark).agg(F.sum("value")).first()[0] == sum(i * 2 for i in range(100))
        assert t.current_snapshot()["summary"]["operation"] == "replace"
        # time travel to pre-rewrite still sees the old layout
        assert t.read(spark, snapshot_id=pre_rewrite_snapshot).count() == 100

    def test_rewrite_noop_when_files_large_enough(self, spark, tmp_path, events_df):
        t = self._small_file_table(spark, tmp_path, events_df)
        assert t.rewrite_data_files(spark, target_bytes=1, min_files=2) is None

    def test_expire_reclaims_rewritten_files(self, spark, tmp_path, events_df):
        t = self._small_file_table(spark, tmp_path, events_df)
        old_files = {f.file_path for f in t.plan_files()[0]}
        t.rewrite_data_files(spark, target_bytes=1 << 20, min_files=2)

        deleted = t.expire_snapshots(keep_last=1)
        assert set(deleted) == old_files  # every pre-rewrite file reclaimed
        assert all(not os.path.exists(p) for p in deleted)
        assert len(t.snapshots()) == 1
        # current read is intact after physical deletion
        assert t.read(spark).count() == 100

    def test_expire_keeps_shared_files(self, spark, tmp_path, events_df):
        """Files referenced by BOTH an expired and a retained snapshot
        (normal append chains) must survive expiration."""
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        t.append_dataframe(events_df.filter("event_id < 60"))
        t.append_dataframe(events_df.filter("event_id >= 60"))

        deleted = t.expire_snapshots(keep_last=1)
        assert deleted == []  # snapshot 2 references snapshot 1's files too
        assert t.read(spark).count() == 100


# --------------------------------------------------------------------------
# streaming exporter -> catalog: one snapshot per micro-batch (X3 + K3)
# --------------------------------------------------------------------------

from opentelemetry_iceberg_exporter_spark.streaming import start_export_stream  # noqa: E402


class TestStreamingToCatalog:
    def test_stream_commits_snapshot_per_batch_and_restarts_cleanly(
        self, spark, tmp_path
    ):
        """The reference's steady state: collector batches arrive, each
        append is one atomic catalog commit; a restart resumes from the
        checkpoint without duplicating data in the table."""
        cfg = _fs_config(tmp_path)
        src_dir = tmp_path / "stream-in"
        ckpt = str(tmp_path / "ckpt")
        _write_jsonl(str(src_dir / "b1.jsonl"), [_traces_payload([_span()])])

        q = start_export_stream(spark, str(src_dir), "traces", cfg, ckpt, trigger_once=True)
        q.awaitTermination(120)

        sink = FsIcebergSink(spark, cfg)
        table = sink.catalog.load_table("otel", sink._table_name(S.SIGNAL_TRACES))
        assert table.read(spark).count() == 1
        assert len(table.snapshots()) == 1

        _write_jsonl(
            str(src_dir / "b2.jsonl"),
            [_traces_payload([_span(spanId="bbbb030405060708")])],
        )
        q2 = start_export_stream(spark, str(src_dir), "traces", cfg, ckpt, trigger_once=True)
        q2.awaitTermination(120)

        got = table.read(spark)
        assert got.count() == 2  # b1 NOT reprocessed
        assert got.select("span_id").distinct().count() == 2
        assert len(table.snapshots()) == 2  # one commit per micro-batch
        for s in table.snapshots():
            assert s["summary"]["otel.exporter"] == "opentelemetry-iceberg-exporter-spark"


# --------------------------------------------------------------------------
# empty-append short-circuit + optimistic-concurrency retry
# --------------------------------------------------------------------------

import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as ifs  # noqa: E402
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import DataFile  # noqa: E402


class TestCommitEdgeCases:
    def test_empty_append_commits_nothing(self, spark, tmp_path, events_df):
        """F1 for the catalog path: the metric demux routinely yields
        empty per-type frames; they must not create empty snapshots."""
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        assert t.append_dataframe(events_df.filter("event_id < 0")) is None
        assert t.snapshots() == []
        assert t.current_version() == 1

    def test_commit_retries_when_another_writer_wins(
        self, tmp_path, events_df, monkeypatch
    ):
        """Appends never conflict logically: when a concurrent writer
        takes the next version between our read and our CAS, the commit
        rebuilds on the new base and both appends survive."""
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        mine = DataFile("/data/mine.parquet", 100, 10, {"ts_hour": 1})
        theirs = DataFile("/data/theirs.parquet", 200, 20, {"ts_hour": 2})

        real = ifs._write_metadata_version
        state = {"raced": False}

        def racy(location, version, metadata):
            if not state["raced"]:
                state["raced"] = True
                monkeypatch.setattr(ifs, "_write_metadata_version", real)
                ifs.FsTable(location).append_files([theirs])  # foreign commit wins
                monkeypatch.setattr(ifs, "_write_metadata_version", racy)
            return real(location, version, metadata)

        monkeypatch.setattr(ifs, "_write_metadata_version", racy)
        t.append_files([mine])

        paths = {f.file_path for f in t.plan_files()[0]}
        assert paths == {"/data/mine.parquet", "/data/theirs.parquet"}
        assert len(t.snapshots()) == 2

    def test_genuinely_concurrent_two_writer_race(self, spark, tmp_path, events_df):
        """Real concurrency, not an injected race: two threads run the
        full append path (Spark data write + CAS commit) against one
        table simultaneously. The version-file CAS admits one; the loser
        retries on the new base. Both snapshots land, history is linear,
        no files are lost."""
        import threading

        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "race", events_df.schema, "ts", "hourly")
        results: list[int] = []
        errors: list[Exception] = []
        barrier = threading.Barrier(2)

        def appender(tag: int) -> None:
            try:
                barrier.wait()
                results.append(
                    t.append_dataframe(events_df, {"otel.writer": str(tag)})
                )
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=appender, args=(i,)) for i in (1, 2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors
        snaps = t.snapshots()
        assert {s["snapshot-id"] for s in snaps} == set(results) and len(results) == 2
        assert [s["sequence-number"] for s in snaps] == [1, 2]
        # linear parentage: second snapshot's parent is the first
        assert snaps[1]["parent-snapshot-id"] == snaps[0]["snapshot-id"]
        assert t.read(spark).count() == events_df.count() * 2

    def test_rewrite_with_zorder_sorts_rows(self, spark, tmp_path, events_df):
        """Compaction + layout in one pass: the rewritten file's rows
        follow the Z-curve (here 1-D: plain ascending event_id)."""
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        t.append_dataframe(events_df.filter("event_id < 50"))
        t.append_dataframe(events_df.filter("event_id >= 50"))
        t.rewrite_data_files(
            spark, target_bytes=1 << 20, min_files=2, zorder_by=["event_id"]
        )
        assert t.read(spark).count() == 100
        # each compacted file is internally sorted by the z-key
        for f in t.plan_files()[0]:
            import pyarrow.parquet as pq

            ids = pq.read_table(f.file_path, columns=["event_id"])["event_id"].to_pylist()
            assert ids == sorted(ids)
        # the clustering is discoverable from the snapshot summary
        assert t.current_snapshot()["summary"]["zorder-by"] == "event_id"


# --------------------------------------------------------------------------
# review regressions: floor transforms, null partitions, replace conflicts
# --------------------------------------------------------------------------


class TestReviewRegressions:
    def test_transform_floor_semantics_pre_1970(self, spark):
        """`div` truncates toward zero; the Iceberg transforms FLOOR.
        23:59:59 on 1969-12-31 is hour -1, and executor-side
        transform_column must agree with driver-side transform_value."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            transform_column,
        )

        df = spark.sql(
            "SELECT to_timestamp('1969-12-31 23:59:59') AS ts "
            "UNION ALL SELECT to_timestamp('1970-01-01 00:00:01')"
        )
        got = sorted(
            r[0]
            for r in df.select(transform_column("ts", "hours").alias("h")).collect()
        )
        assert got == [-1, 0]
        ts = datetime(1969, 12, 31, 23, 59, 59, tzinfo=timezone.utc)
        assert transform_value(ts, "hours") == -1
        assert transform_value(ts, "days") == -1

    def test_null_timestamp_rows_commit_as_null_partition(self, spark, tmp_path):
        """A record with no timestamp (proto3 omits zero fields) must not
        crash the commit; it lands in the null partition and is never
        pruned away."""
        df = spark.sql(
            "SELECT 1 AS event_id, to_timestamp('2024-03-01 05:00:00') AS ts, 2 AS value "
            "UNION ALL SELECT 2, CAST(NULL AS timestamp), 4"
        )
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", df.schema, "ts", "hourly")
        assert t.append_dataframe(df) is not None
        assert t.read(spark).count() == 2
        parts = {
            f.partition.get("ts_hour") for f in t.plan_files()[0]
        }
        assert None in parts  # null-ts file has a null partition value
        # pruning keeps the null-partition file (can't prove it's outside)
        base_hour = int(datetime(2024, 3, 1, 5, tzinfo=timezone.utc).timestamp()) // 3600
        got = t.read(spark, partition_range=(base_hour, base_hour))
        assert got.count() == 2

    def test_rewrite_raises_when_table_advances_mid_plan(
        self, spark, tmp_path, events_df, monkeypatch
    ):
        """A replace commit planned against snapshot A must not merge
        with a concurrent append B — it raises for a re-plan instead of
        silently dropping B's files."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            ReplaceConflictError,
        )

        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        t.append_dataframe(events_df.filter("event_id < 50"))
        t.append_dataframe(events_df.filter("event_id >= 50 AND event_id < 80"))

        real_plan = t.plan_scan
        state = {"raced": False}

        def racy_plan(*a, **k):
            out = real_plan(*a, **k)
            if not state["raced"]:
                state["raced"] = True
                # concurrent append lands AFTER the rewrite planned
                t.append_files(
                    [DataFile("/data/late.parquet", 10, 1, {"ts_hour": 1})]
                )
            return out

        monkeypatch.setattr(t, "plan_scan", racy_plan)
        with pytest.raises(ReplaceConflictError):
            t.rewrite_data_files(spark, target_bytes=1 << 20, min_files=2)
        # nothing lost: the late append's file is still live
        paths = {f.file_path for f in real_plan()[0]}
        assert "/data/late.parquet" in paths


# --------------------------------------------------------------------------
# incremental (snapshot-diff) consumption
# --------------------------------------------------------------------------


class TestIncrementalRead:
    def _three_appends(self, spark, tmp_path, events_df):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        s1 = t.append_dataframe(events_df.filter("event_id < 30"))
        s2 = t.append_dataframe(events_df.filter("event_id >= 30 AND event_id < 70"))
        s3 = t.append_dataframe(events_df.filter("event_id >= 70"))
        return t, (s1, s2, s3)

    def test_window_yields_only_new_rows(self, spark, tmp_path, events_df):
        t, (s1, s2, s3) = self._three_appends(spark, tmp_path, events_df)
        ids = {
            r["event_id"] for r in t.read_changes(spark, from_snapshot_id=s1).collect()
        }
        assert ids == set(range(30, 100))
        mid = {
            r["event_id"]
            for r in t.read_changes(
                spark, from_snapshot_id=s1, to_snapshot_id=s2
            ).collect()
        }
        assert mid == set(range(30, 70))

    def test_from_none_is_full_history(self, spark, tmp_path, events_df):
        t, _ = self._three_appends(spark, tmp_path, events_df)
        assert t.read_changes(spark).count() == 100

    def test_empty_window(self, spark, tmp_path, events_df):
        t, (_, _, s3) = self._three_appends(spark, tmp_path, events_df)
        out = t.read_changes(spark, from_snapshot_id=s3)
        assert out.count() == 0
        assert "event_id" in out.columns  # placeholder schema preserved

    def test_compaction_not_replayed(self, spark, tmp_path, events_df):
        """A replace snapshot rewrites layout, not logical data: consumers
        that already processed the appends must see NOTHING new after a
        compaction — re-emitting rewritten files would double-process."""
        t, (s1, s2, s3) = self._three_appends(spark, tmp_path, events_df)
        t.rewrite_data_files(spark, target_bytes=1 << 20, min_files=2)
        assert t.read_changes(spark, from_snapshot_id=s3).count() == 0
        # while a window over the appends still yields exactly the appends
        assert t.read_changes(spark, from_snapshot_id=s1).count() == 70

    def test_incremental_scan_returns_window_end_not_current(
        self, spark, tmp_path, events_df
    ):
        """incremental_scan returns the LAST snapshot the scan covered —
        the checkpoint value. With --to-snapshot it is that id even when
        newer snapshots exist; on an empty table it is None."""
        t, (s1, s2, s3) = self._three_appends(spark, tmp_path, events_df)
        files, end = t.incremental_scan(from_snapshot_id=s1, to_snapshot_id=s2)
        assert end == s2  # NOT s3 — a consumer checkpointing s3 skips it
        _, end_open = t.incremental_scan(from_snapshot_id=s1)
        assert end_open == s3
        cat = FsCatalog(str(tmp_path / "wh2"))
        empty = cat.create_table("ns", "none", events_df.schema, "ts", "hourly")
        assert empty.incremental_scan() == ([], None)

    def test_unknown_operation_in_window_raises(self, spark, tmp_path, events_df):
        """Iceberg's incremental append scan FAILS on overwrite/delete
        snapshots rather than silently dropping their effects; pin the
        same contract (today only append/replace are ever committed, so
        this guards a future operation being added without updating the
        change-stream semantics)."""
        import json as json_mod

        t, (s1, _, _) = self._three_appends(spark, tmp_path, events_df)
        # hand-forge an 'overwrite' snapshot in the metadata history
        version = t.current_version()
        md_path = os.path.join(t.location, "metadata", f"v{version}.metadata.json")
        with open(md_path) as f:
            md = json_mod.load(f)
        forged = dict(md["snapshots"][-1])
        forged["snapshot-id"] = 999999
        # link the forged snapshot into MAIN's ancestry (the walk follows
        # the parent chain, so an unlinked snapshot would be ignored)
        forged["parent-snapshot-id"] = md["current-snapshot-id"]
        forged["summary"] = {"operation": "overwrite"}
        md["snapshots"] = md["snapshots"] + [forged]
        md["current-snapshot-id"] = 999999
        with open(md_path, "w") as f:
            json_mod.dump(md, f)
        with pytest.raises(ValueError, match="overwrite"):
            t.incremental_files(from_snapshot_id=s1)

    def test_consumer_checkpoint_loop(self, spark, tmp_path, events_df):
        """The intended consumption pattern: checkpoint the last snapshot
        processed, pass it as from on the next poll — every row arrives
        exactly once across polls."""
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "ev", events_df.schema, "ts", "hourly")
        seen: set[int] = set()
        last = None
        for lo, hi in [(0, 25), (25, 60), (60, 100)]:
            t.append_dataframe(
                events_df.filter(f"event_id >= {lo} AND event_id < {hi}")
            )
            batch = {
                r["event_id"]
                for r in t.read_changes(spark, from_snapshot_id=last).collect()
            }
            assert batch == set(range(lo, hi))  # only the new append
            assert not (seen & batch)
            seen |= batch
            last = t.current_snapshot()["snapshot-id"]
        assert seen == set(range(100))

    def test_unknown_snapshot_rejected(self, spark, tmp_path, events_df):
        t, _ = self._three_appends(spark, tmp_path, events_df)
        with pytest.raises(ValueError, match="unknown from snapshot"):
            t.incremental_files(from_snapshot_id=12345)
