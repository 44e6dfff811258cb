"""v2 -> v3 format-version upgrade ceremony (Iceberg spec): validate
the v3 delete invariants first (no live parquet position-delete files,
no stacked deletion vectors), bump format-version, initialize
next-row-id; after the upgrade the merge-on-read write paths refuse
parquet position-delete files (v3 forbids them) and MoR MERGE writes
its delete half as deletion vectors instead. Both transports."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    DataFile,
    FsCatalog,
    plan_format_upgrade,
)

from rest_stub import make_server


def _df(spark, n=40, base=0, tag="a"):
    return (
        spark.range(base, base + n)
        .withColumn("ts", F.to_timestamp(F.lit("2024-03-01 00:00:00")))
        .withColumn("v", F.lit(tag))
    )


@pytest.fixture()
def fs_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "up", _df(spark).schema, partition_source="ts")
    t.append_dataframe(_df(spark))
    return t


class TestUpgradeCeremony:
    def test_clean_upgrade_and_noop(self, spark, fs_table):
        t = fs_table
        assert t.metadata().get("format-version") == 2
        assert t.upgrade_format_version(3) == 3
        md = t.metadata()
        assert md["format-version"] == 3
        assert md["next-row-id"] == 0
        v_before = t.current_version()
        assert t.upgrade_format_version(3) == 3  # no-op
        assert t.current_version() == v_before  # no metadata churn

    def test_refusal_matrix(self, spark, fs_table):
        t = fs_table
        with pytest.raises(ValueError, match="unsupported"):
            t.upgrade_format_version(4)
        t.upgrade_format_version(3)
        with pytest.raises(ValueError, match="downgrade"):
            t.upgrade_format_version(2)

    def test_live_parquet_position_deletes_block_upgrade(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id < 5", mode="merge-on-read")
        with pytest.raises(ValueError, match="position-delete"):
            t.upgrade_format_version(3)
        # the documented remedy unblocks it
        t.rewrite_position_deletes(spark)
        assert t.upgrade_format_version(3) == 3
        assert t.read(spark).count() == 35

    def test_stacked_dvs_block_upgrade(self, monkeypatch, fs_table):
        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs as fsmod

        dv = lambda i: DataFile(  # noqa: E731
            file_path=f"/dv{i}.puffin",
            file_size_in_bytes=10,
            record_count=1,
            partition={},
            content=1,
            referenced_data_file="/data/a.parquet",
            content_offset=4,
            content_size_in_bytes=6,
        )
        monkeypatch.setattr(
            fsmod, "live_files", lambda md, sid, only_deletes=False: ([], [dv(1), dv(2)])
        )
        with pytest.raises(ValueError, match="stacked"):
            plan_format_upgrade(fs_table.metadata(), 3)


class TestV3WriteGuards:
    def test_mor_parquet_deletes_refused_dvs_allowed(self, spark, fs_table):
        t = fs_table
        t.upgrade_format_version(3)
        with pytest.raises(ValueError, match="deletion-vectors"):
            t.delete_where(spark, "id < 3", mode="merge-on-read")
        with pytest.raises(ValueError, match="deletion-vectors"):
            t.update_where(spark, "id < 3", {"v": "'x'"}, mode="merge-on-read")
        # the v3-native paths still work
        _, n = t.delete_where(spark, "id < 3", mode="deletion-vectors")
        assert n == 3
        _, n = t.update_where(
            spark, "id = 5", {"v": "'x'"}, mode="deletion-vectors"
        )
        assert n == 1
        _, n = t.delete_where_equality(
            spark, _df(spark).select("id").where("id = 7"), ["id"]
        )
        assert n == 1
        assert t.read(spark).count() == 36
        assert t.read(spark).where("v = 'x'").count() == 1

    def test_v3_merge_mor_writes_deletion_vectors(self, spark, fs_table):
        t = fs_table
        t.upgrade_format_version(3)
        src = _df(spark, n=10, base=35, tag="merged")  # 5 updates + 5 inserts
        sid, n_updated, n_inserted = t.merge_rows(
            spark, src, ["id"], mode="merge-on-read"
        )
        assert (n_updated, n_inserted) == (5, 5)
        _, deletes, _ = t.plan_scan()
        assert deletes and all(f.is_deletion_vector for f in deletes)
        # one live DV per referenced file (the v3 invariant)
        refs = [f.referenced_data_file for f in deletes]
        assert len(refs) == len(set(refs))
        got = t.read(spark)
        assert got.count() == 45
        assert got.where("v = 'merged'").count() == 10
        # second MoR merge folds, never stacks
        t.merge_rows(spark, _df(spark, n=3, base=37, tag="m2"), ["id"],
                     mode="merge-on-read")
        _, deletes, _ = t.plan_scan()
        refs = [f.referenced_data_file for f in deletes if f.is_deletion_vector]
        assert len(refs) == len(set(refs))
        assert t.read(spark).where("v = 'm2'").count() == 3

    def test_v2_merge_mor_still_writes_parquet_deletes(self, spark, fs_table):
        t = fs_table
        t.merge_rows(spark, _df(spark, n=2, base=38, tag="m"), ["id"],
                     mode="merge-on-read")
        _, deletes, _ = t.plan_scan()
        assert deletes and all(not f.is_deletion_vector for f in deletes)
        assert t.read(spark).where("v = 'm'").count() == 2


class TestRestUpgrade:
    @pytest.fixture()
    def rest_table(self, spark, tmp_path):
        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "up", _df(spark).schema,
                                    partition_source="ts")
            t.append_dataframe(_df(spark))
            yield t
        finally:
            server.shutdown()

    def test_rest_upgrade_and_guards(self, spark, rest_table):
        t = rest_table
        assert t.upgrade_format_version(3) == 3
        md = t.metadata()
        assert md["format-version"] == 3 and md["next-row-id"] == 0
        with pytest.raises(ValueError, match="downgrade"):
            t.upgrade_format_version(2)
        with pytest.raises(ValueError, match="deletion-vectors"):
            t.delete_where(spark, "id < 3", mode="merge-on-read")
        _, n = t.delete_where(spark, "id < 3", mode="deletion-vectors")
        assert n == 3
        sid, n_updated, n_inserted = t.merge_rows(
            spark, _df(spark, n=4, base=38, tag="m"), ["id"], mode="merge-on-read"
        )
        assert (n_updated, n_inserted) == (2, 2)
        md = t.metadata()
        _, deletes = t._live_files(md, md["current-snapshot-id"])
        assert all(f.is_deletion_vector for f in deletes)
        assert t.read(spark).count() == 39

    def test_rest_position_deletes_block_upgrade(self, spark, rest_table):
        t = rest_table
        t.delete_where(spark, "id < 5", mode="merge-on-read")
        with pytest.raises(ValueError, match="position-delete"):
            t.upgrade_format_version(3)
        t.rewrite_position_deletes(spark)
        assert t.upgrade_format_version(3) == 3
