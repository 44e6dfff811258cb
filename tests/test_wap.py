"""Write-audit-publish (WAP) branch staging on both catalog transports.

The Iceberg WAP pattern (spark.wap.branch): a pipeline stages its
output on an audit branch, validation reads the branch, and a
fast-forward of `main` publishes atomically — or drop_ref abandons the
staged snapshots without main's readers ever seeing them. Branch
commits advance ONLY the branch ref; main's current snapshot and
history log are untouched until publish.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

from rest_stub import make_server


def _df(spark, n=100, base=0):
    return (
        spark.range(n)
        .withColumn("id", F.col("id") + base)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % 4).cast("int"))
            ),
        )
        .withColumn("v", F.col("id") * 10)
    )


@pytest.fixture()
def fs_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
    t.append_dataframe(_df(spark))
    return t


class TestFsWap:
    def test_staged_append_invisible_on_main(self, spark, fs_table):
        t = fs_table
        main_before = t.current_snapshot()["snapshot-id"]
        sid = t.append_dataframe_to_branch("audit", _df(spark, 50, base=1000))
        assert sid is not None
        # main untouched: same current snapshot, same row count
        assert t.current_snapshot()["snapshot-id"] == main_before
        assert t.read(spark).count() == 100
        # the branch sees staged + base data (forked from main's head)
        assert t.read_ref(spark, "audit").count() == 150
        # snapshot-log records only main history
        assert [e["snapshot-id"] for e in t.metadata()["snapshot-log"]] == [main_before]

    def test_staged_appends_stack_on_the_branch(self, spark, fs_table):
        t = fs_table
        s1 = t.append_dataframe_to_branch("audit", _df(spark, 10, base=1000))
        s2 = t.append_dataframe_to_branch("audit", _df(spark, 10, base=2000))
        assert t.read_ref(spark, "audit").count() == 120
        by_id = {s["snapshot-id"]: s for s in t.snapshots()}
        assert by_id[s2]["parent-snapshot-id"] == s1

    def test_fast_forward_publishes(self, spark, fs_table):
        t = fs_table
        t.append_dataframe_to_branch("audit", _df(spark, 50, base=1000))
        head = t.resolve_ref("audit")
        published = t.fast_forward("audit")
        assert published == head
        assert t.current_snapshot()["snapshot-id"] == head
        assert t.read(spark).count() == 150
        # idempotent: publishing again is a no-op returning the head
        assert t.fast_forward("audit") == head
        # the published snapshot entered main's history log
        assert t.metadata()["snapshot-log"][-1]["snapshot-id"] == head

    def test_fast_forward_refuses_divergence(self, spark, fs_table):
        t = fs_table
        t.append_dataframe_to_branch("audit", _df(spark, 10, base=1000))
        # main advances concurrently -> branch fork point is stale
        t.append_dataframe(_df(spark, 10, base=5000))
        with pytest.raises(ValueError, match="not an ancestor"):
            t.fast_forward("audit")

    def test_abandon_branch_reclaims_staged_files(self, spark, fs_table):
        t = fs_table
        t.append_dataframe_to_branch("audit", _df(spark, 50, base=1000))
        staged = set(t.all_files()) - {
            f.file_path for f in t.plan_files()[0]
        }
        assert staged
        t.drop_ref("audit")
        # push the staged snapshot out of the positional keep-window
        t.append_dataframe(_df(spark, 5, base=9000))
        removed = t.expire_snapshots(keep_last=1)
        assert staged <= set(removed)
        assert not any(os.path.exists(p) for p in staged)
        assert t.read(spark).count() == 105

    def test_dml_on_main_leaves_branch_readable(self, spark, fs_table):
        t = fs_table
        t.append_dataframe_to_branch("audit", _df(spark, 10, base=1000))
        # merge-on-read delete lands on main; branch still reads its fork
        t.delete_where(spark, "id < 5", mode="merge-on-read")
        assert t.read(spark).count() == 95
        assert t.read_ref(spark, "audit").count() == 110


class TestExporterWapConfig:
    def test_sink_stages_on_wap_branch_and_publishes(self, spark, tmp_path):
        """The export pipeline's WAP hookup: with catalog.wap_branch set
        the sink's appends land on the audit branch (main stays empty
        for readers) until publish_staged fast-forwards."""
        from opentelemetry_iceberg_exporter_spark import schemas as S
        from opentelemetry_iceberg_exporter_spark.config import (
            CatalogConfig,
            ExporterConfig,
            PartitionConfig,
            StorageConfig,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
        )

        cfg = ExporterConfig(
            storage=StorageConfig(
                provider="filesystem", bucket=str(tmp_path), prefix="raw"
            ),
            catalog=CatalogConfig(
                catalog_type="fs",
                warehouse=str(tmp_path / "warehouse"),
                wap_branch="audit",
            ),
            partition=PartitionConfig(granularity="hourly"),
        )
        sink = FsIcebergSink(spark, cfg)
        from datetime import datetime, timezone

        from pyspark.sql.types import (
            ArrayType,
            BooleanType,
            IntegerType,
            LongType,
            StringType,
            TimestampType,
        )

        def default(dt):
            if isinstance(dt, StringType):
                return ""
            if isinstance(dt, (LongType, IntegerType)):
                return 0
            if isinstance(dt, BooleanType):
                return False
            if isinstance(dt, TimestampType):
                return datetime(2024, 3, 1, tzinfo=timezone.utc)
            if isinstance(dt, ArrayType):
                return []
            return None

        schema = S.SCHEMAS[S.SIGNAL_TRACES]
        row = {
            f.name: (None if f.nullable else default(f.dataType))
            for f in schema.fields
        }
        row[S.partition_column(S.SIGNAL_TRACES)] = datetime(
            2024, 3, 1, tzinfo=timezone.utc
        )
        df = spark.createDataFrame([row], schema)
        sid = sink.append(df, S.SIGNAL_TRACES, record_count=1)
        assert sid is not None
        # main readers see nothing staged
        assert sink.read(S.SIGNAL_TRACES).count() == 0
        t = sink.catalog.load_table("otel", sink._table_name(S.SIGNAL_TRACES))
        assert t.read_ref(spark, "audit").count() == 1
        # publish: main now serves the batch
        assert sink.publish_staged(S.SIGNAL_TRACES) == sid
        assert sink.read(S.SIGNAL_TRACES).count() == 1
        # idempotent re-publish; and unset-branch configs are no-ops
        assert sink.publish_staged(S.SIGNAL_TRACES) == sid

    def test_wap_branch_main_rejected(self):
        from opentelemetry_iceberg_exporter_spark.config import CatalogConfig

        with pytest.raises(ValueError, match="wap_branch"):
            CatalogConfig(
                catalog_type="fs", warehouse="/tmp/x", wap_branch="main"
            ).validate()


class TestRestWap:
    @pytest.fixture()
    def rest_table(self, spark, tmp_path):
        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        client = RestCatalogClient(uri, warehouse=warehouse)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        yield t
        server.shutdown()

    def test_wap_cycle_over_rest(self, spark, rest_table):
        t = rest_table
        main_before = t.current_snapshot()["snapshot-id"]
        t.append_dataframe_to_branch("audit", _df(spark, 50, base=1000))
        assert t.current_snapshot()["snapshot-id"] == main_before
        assert t.read(spark).count() == 100
        assert t.read_ref(spark, "audit").count() == 150
        head = t.fast_forward("audit")
        assert t.current_snapshot()["snapshot-id"] == head
        assert t.read(spark).count() == 150

    def test_rest_fast_forward_refuses_divergence(self, spark, rest_table):
        t = rest_table
        t.append_dataframe_to_branch("audit", _df(spark, 10, base=1000))
        t.append_dataframe(_df(spark, 10, base=5000))
        with pytest.raises(ValueError, match="not an ancestor"):
            t.fast_forward("audit")


class TestCherryPick:
    """cherry_pick: the publish path when fast-forward is impossible.
    Main advanced since the audit branch forked, so the staged APPEND's
    added files re-commit as a fresh append on today's main (appends
    commute with intervening commits); non-append staged snapshots were
    planned against their own base and refuse to replay."""

    def test_publishes_staged_append_over_advanced_main(self, spark, fs_table):
        t = fs_table
        staged_sid = t.append_dataframe_to_branch("audit", _df(spark, 50, base=1000))
        t.append_dataframe(_df(spark, 10, base=5000))  # main moves on
        with pytest.raises(ValueError, match="not an ancestor"):
            t.fast_forward("audit")
        new_head = t.cherry_pick(staged_sid)
        assert t.current_snapshot()["snapshot-id"] == new_head
        got = t.read(spark)
        assert got.count() == 160  # 100 base + 10 concurrent + 50 staged
        assert got.filter("id >= 1000 and id < 2000").count() == 50
        snap = t.current_snapshot()
        assert snap["summary"]["operation"] == "append"
        assert snap["summary"]["cherry-picked-from-snapshot"] == str(staged_sid)
        # the staged snapshot itself is untouched on its branch
        assert t.read_ref(spark, "audit").count() == 150

    def test_no_data_copied_files_register_by_reference(self, spark, fs_table):
        t = fs_table
        staged_sid = t.append_dataframe_to_branch("audit", _df(spark, 30, base=1000))
        t.append_dataframe(_df(spark, 5, base=5000))
        staged_files = set(t.all_files())
        t.cherry_pick(staged_sid)
        # cherry-pick is metadata-only: no new data file appears
        assert set(t.all_files()) == staged_files

    def test_refuses_non_append_snapshots(self, spark, fs_table):
        t = fs_table
        sid, _ = t.delete_where(spark, "id < 5", mode="merge-on-read")
        with pytest.raises(ValueError, match="only append"):
            t.cherry_pick(sid)
        with pytest.raises(ValueError, match="unknown snapshot"):
            t.cherry_pick(12345)

    def test_refuses_already_published_snapshots(self, spark, fs_table):
        """Cherry-picking a snapshot that is ALREADY on main's ancestry
        would silently duplicate its rows — refused, including the
        fast-forwarded-then-cherry-picked double-publish footgun."""
        t = fs_table
        main_sid = t.append_dataframe(_df(spark, 10, base=7000))
        with pytest.raises(ValueError, match="already on main"):
            t.cherry_pick(main_sid)
        staged = t.append_dataframe_to_branch("audit", _df(spark, 5, base=8000))
        t.fast_forward("audit")  # published: now on main's ancestry
        with pytest.raises(ValueError, match="already on main"):
            t.cherry_pick(staged)
        assert t.read(spark).count() == 115

    def test_equality_delete_scoping_after_cherry_pick(self, spark, fs_table):
        """The re-committed files take the NEW commit's sequence number:
        an equality delete landing between fork and publish applies only
        to rows with STRICTLY LOWER seq, so cherry-picked rows (newer)
        survive it — exactly what a fresh append of the same data would
        do."""
        t = fs_table
        staged_sid = t.append_dataframe_to_branch(
            "audit", _df(spark, 10, base=1000)
        )
        keys = spark.createDataFrame(
            [(1000 + i,) for i in range(10)], "id long"
        )
        t.delete_where_equality(spark, keys, ["id"])  # main moves on
        t.cherry_pick(staged_sid)
        got = t.read(spark)
        # the staged rows carry a seq ABOVE the delete's: all 10 survive
        assert got.filter("id >= 1000 and id < 2000").count() == 10
        assert got.count() == 110

    def test_second_cherry_pick_of_same_snapshot_refused(self, spark, fs_table):
        """A retry after a lost response must treat the FIRST publish as
        the success: the published copy carries a different snapshot id,
        so the ancestry check alone cannot see it — the
        cherry-picked-from-snapshot summary marker does."""
        t = fs_table
        staged = t.append_dataframe_to_branch("audit", _df(spark, 10, base=1000))
        t.append_dataframe(_df(spark, 5, base=5000))  # main moves on
        t.cherry_pick(staged)
        assert t.read(spark).count() == 115
        with pytest.raises(ValueError, match="already cherry-picked"):
            t.cherry_pick(staged)
        assert t.read(spark).count() == 115  # no duplicate rows

    def test_rest_cherry_pick_parity(self, spark, tmp_path):
        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table(
                "otel", "ev", _df(spark).schema, partition_source="ts"
            )
            t.append_dataframe(_df(spark))
            staged_sid = t.append_dataframe_to_branch(
                "audit", _df(spark, 50, base=1000)
            )
            t.append_dataframe(_df(spark, 10, base=5000))
            with pytest.raises(ValueError, match="not an ancestor"):
                t.fast_forward("audit")
            head = t.cherry_pick(staged_sid)
            assert t.current_snapshot()["snapshot-id"] == head
            assert t.read(spark).count() == 160
            snap = t.current_snapshot()
            assert snap["summary"]["cherry-picked-from-snapshot"] == str(
                staged_sid
            )
        finally:
            server.shutdown()
