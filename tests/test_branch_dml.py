"""Branch-scoped DML: delete_where / update_where against a non-main
branch commit to THAT branch (parented on its head, main untouched)
with the same fold-on-write and liveness validation as main-branch DML.
Copy-on-write is refused on branches (its replace commit pins main's
head by design); tags and unknown refs are refused. Both transports."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

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
    t = cat.create_table("otel", "bd", _df(spark).schema, partition_source="ts")
    t.append_dataframe(_df(spark))
    t.set_ref("audit", t.current_snapshot()["snapshot-id"], "branch")
    return t


class TestFsBranchDml:
    def test_dv_delete_commits_to_branch_only(self, spark, fs_table):
        t = fs_table
        main_before = t.current_snapshot()["snapshot-id"]
        sid, n = t.delete_where(
            spark, "id < 5", mode="deletion-vectors", branch="audit"
        )
        assert n == 5
        # main untouched; the branch advanced to the delete snapshot
        assert t.current_snapshot()["snapshot-id"] == main_before
        assert t.metadata()["refs"]["audit"]["snapshot-id"] == sid
        assert t.read(spark).count() == 40
        assert t.read_ref(spark, "audit").count() == 35

    def test_branch_dml_folds_on_branch_head(self, spark, fs_table):
        """Two DV deletes on the branch: the second must fold the
        first's vector (one live DV per file ON THE BRANCH)."""
        t = fs_table
        t.delete_where(spark, "id = 1", mode="deletion-vectors", branch="audit")
        t.delete_where(spark, "id = 2", mode="deletion-vectors", branch="audit")
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import live_files

        head = t.resolve_ref("audit")
        _, deletes = live_files(t.metadata(), head)
        dvs = [f for f in deletes if f.is_deletion_vector]
        refs = [f.referenced_data_file for f in dvs]
        assert len(refs) == len(set(refs))  # folded, never stacked
        assert t.read_ref(spark, "audit").count() == 38

    def test_mor_update_on_branch(self, spark, fs_table):
        t = fs_table
        sid, n = t.update_where(
            spark, "id < 3", {"v": "'u'"}, mode="deletion-vectors", branch="audit"
        )
        assert n == 3
        assert t.metadata()["refs"]["audit"]["snapshot-id"] == sid
        got = t.read_ref(spark, "audit")
        assert got.count() == 40
        assert got.where("v = 'u'").count() == 3
        # main sees none of it
        assert t.read(spark).where("v = 'u'").count() == 0

    def test_refusals(self, spark, fs_table):
        t = fs_table
        with pytest.raises(ValueError, match="copy-on-write"):
            t.delete_where(spark, "id < 5", mode="copy-on-write", branch="audit")
        with pytest.raises(ValueError, match="unknown branch"):
            t.delete_where(spark, "id < 5", mode="deletion-vectors",
                           branch="ghost")
        t.set_ref("rel", t.current_snapshot()["snapshot-id"], "tag")
        with pytest.raises(ValueError, match="tag"):
            t.update_where(spark, "id < 5", {"v": "'x'"},
                           mode="deletion-vectors", branch="rel")

    def test_branch_dml_then_fast_forward_publishes(self, spark, fs_table):
        """The WAP shape: stage a deletion on the audit branch, audit
        it, then fast-forward main to publish."""
        t = fs_table
        t.delete_where(spark, "id >= 30", mode="deletion-vectors",
                       branch="audit")
        assert t.read(spark).count() == 40  # unpublished
        t.fast_forward("audit")
        assert t.read(spark).count() == 30


class TestRestBranchDml:
    def test_rest_branch_dv_delete(self, spark, tmp_path):
        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "bd", _df(spark).schema,
                                    partition_source="ts")
            t.append_dataframe(_df(spark))
            main_before = t.current_snapshot()["snapshot-id"]
            t.set_ref("audit", main_before, "branch")
            sid, n = t.delete_where(
                spark, "id < 5", mode="deletion-vectors", branch="audit"
            )
            assert n == 5
            assert t.current_snapshot()["snapshot-id"] == main_before
            assert t.metadata()["refs"]["audit"]["snapshot-id"] == sid
            assert t.read(spark).count() == 40
            assert t.read_ref(spark, "audit").count() == 35
            # fold on the branch over REST too
            t.delete_where(spark, "id = 7", mode="deletion-vectors",
                           branch="audit")
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
                live_files,
            )

            _, deletes = live_files(t.metadata(), t.resolve_ref("audit"))
            refs = [f.referenced_data_file for f in deletes
                    if f.is_deletion_vector]
            assert len(refs) == len(set(refs))
            with pytest.raises(ValueError, match="copy-on-write"):
                t.update_where(spark, "id < 5", {"v": "'x'"},
                               mode="copy-on-write", branch="audit")
        finally:
            server.shutdown()
