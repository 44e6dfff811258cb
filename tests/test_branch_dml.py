"""Branch-scoped DML: delete_where / update_where against a non-main
branch commit to THAT branch (parented on its head, main untouched)
with the same fold-on-write and liveness validation as main-branch DML.
Copy-on-write rewrites are pinned to the BRANCH head (main advancing
concurrently is irrelevant; the branch advancing forces a re-plan).
Tags and unknown refs are refused. Both transports."""

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
        with pytest.raises(ValueError, match="unknown branch"):
            t.delete_where(spark, "id < 5", mode="deletion-vectors",
                           branch="ghost")
        t.set_ref("rel", t.current_snapshot()["snapshot-id"], "tag")
        with pytest.raises(ValueError, match="tag"):
            t.update_where(spark, "id < 5", {"v": "'x'"},
                           mode="deletion-vectors", branch="rel")
        with pytest.raises(ValueError, match="tag"):
            t.delete_where(spark, "id < 5", mode="copy-on-write", branch="rel")

    def test_branch_dml_then_fast_forward_publishes(self, spark, fs_table):
        """The WAP shape: stage a deletion on the audit branch, audit
        it, then fast-forward main to publish."""
        t = fs_table
        t.delete_where(spark, "id >= 30", mode="deletion-vectors",
                       branch="audit")
        assert t.read(spark).count() == 40  # unpublished
        t.fast_forward("audit")
        assert t.read(spark).count() == 30


class TestFsBranchCow:
    def test_cow_delete_parents_on_branch_head(self, spark, fs_table):
        """A copy-on-write delete on a branch that has DIVERGED from
        main rewrites the branch's live set, parents on the BRANCH
        head, and advances only the branch ref."""
        t = fs_table
        main_before = t.current_snapshot()["snapshot-id"]
        t.append_dataframe_to_branch("audit", _df(spark, 10, base=100, tag="b"))
        branch_head = t.resolve_ref("audit")
        sid, n = t.delete_where(
            spark, "id < 5", mode="copy-on-write", branch="audit"
        )
        assert n == 5
        assert t.current_snapshot()["snapshot-id"] == main_before
        assert t.metadata()["refs"]["audit"]["snapshot-id"] == sid
        snap = next(
            s for s in t.metadata()["snapshots"] if s["snapshot-id"] == sid
        )
        assert snap["parent-snapshot-id"] == branch_head
        assert t.read(spark).count() == 40  # main untouched
        got = t.read_ref(spark, "audit")
        assert got.count() == 45  # 40 - 5 + 10 staged
        assert got.where("id < 5").count() == 0

    def test_cow_update_on_branch(self, spark, fs_table):
        t = fs_table
        sid, n = t.update_where(
            spark, "id < 3", {"v": "'u'"}, mode="copy-on-write", branch="audit"
        )
        assert n == 3
        assert t.metadata()["refs"]["audit"]["snapshot-id"] == sid
        assert t.read_ref(spark, "audit").where("v = 'u'").count() == 3
        assert t.read(spark).where("v = 'u'").count() == 0

    def test_branch_cow_ignores_main_advance(self, spark, fs_table, monkeypatch):
        """A concurrent commit to MAIN between planning and commit must
        NOT conflict a branch-scoped rewrite — the replace is pinned to
        the branch's head, and main's history is irrelevant to it."""
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as fsmod

        t = fs_table
        real = fsmod.plan_delete

        def racing_plan(*a, **k):
            out = real(*a, **k)
            t.append_dataframe(_df(spark, 5, base=200, tag="m"))  # main moves
            return out

        monkeypatch.setattr(fsmod, "plan_delete", racing_plan)
        sid, n = t.delete_where(
            spark, "id < 5", mode="copy-on-write", branch="audit"
        )
        assert n == 5
        assert t.read_ref(spark, "audit").count() == 35
        assert t.read(spark).count() == 45  # the raced main append landed

    def test_branch_cow_conflicts_with_branch_advance(
        self, spark, fs_table, monkeypatch
    ):
        """The SAME branch advancing between planning and commit is a
        real conflict: the replace was planned against a stale branch
        head and cannot merge — ReplaceConflictError, re-plan."""
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as fsmod
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            ReplaceConflictError,
        )

        t = fs_table
        real = fsmod.plan_delete

        def racing_plan(*a, **k):
            out = real(*a, **k)
            t.append_dataframe_to_branch("audit", _df(spark, 5, base=300))
            return out

        monkeypatch.setattr(fsmod, "plan_delete", racing_plan)
        with pytest.raises(ReplaceConflictError, match="audit"):
            t.delete_where(spark, "id < 5", mode="copy-on-write", branch="audit")

    def test_cow_then_fast_forward_publishes_rewrite(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id >= 30", mode="copy-on-write", branch="audit")
        assert t.read(spark).count() == 40
        t.fast_forward("audit")
        assert t.read(spark).count() == 30

    def test_branch_cow_changelog_via_lineage(self, spark, tmp_path):
        """On a v3 table the changelog over the BRANCH ancestry recovers
        a branch-scoped CoW update through _row_id diffing — same
        contract as main-branch CoW recovery."""
        cat = FsCatalog(str(tmp_path / "wh3"))
        t = cat.create_table("otel", "bd3", _df(spark).schema,
                             partition_source="ts")
        t.upgrade_format_version(3)
        t.append_dataframe(_df(spark, 20))
        fork = t.current_snapshot()["snapshot-id"]
        t.set_ref("audit", fork, "branch")
        id_map = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        sid, n = t.update_where(
            spark, "id IN (3, 7)", {"v": "'u'"},
            mode="copy-on-write", branch="audit",
        )
        assert n == 2
        log = t.changelog_scan(
            spark, from_snapshot_id=fork, to_snapshot_id=sid, with_lineage=True
        ).collect()
        dels = {r["id"]: r["_row_id"] for r in log
                if r["_change_type"] == "delete"}
        ins = {(r["id"], r["v"]): r["_row_id"] for r in log
               if r["_change_type"] == "insert"}
        assert dels == {3: id_map[3], 7: id_map[7]}
        assert ins == {(3, "u"): id_map[3], (7, "u"): id_map[7]}


class TestCliBranchDml:
    def test_cli_delete_and_update_on_branch(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        t = cat.create_table("otel", "cb", _df(spark).schema,
                             partition_source="ts")
        t.append_dataframe(_df(spark))
        t.set_ref("audit", t.current_snapshot()["snapshot-id"], "branch")
        base = ["--warehouse", wh, "--table", "cb"]
        assert main(["delete", *base, "--where", "id < 5",
                     "--mode", "copy-on-write", "--branch", "audit"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["deleted_rows"] == 5
        assert main(["update", *base, "--where", "id = 10",
                     "--set", "v = 'u'", "--mode", "deletion-vectors",
                     "--branch", "audit"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["updated_rows"] == 1
        # main untouched; the branch carries both
        assert t.read(spark).count() == 40
        got = t.read_ref(spark, "audit")
        assert got.count() == 35
        assert got.where("v = 'u'").count() == 1


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
        finally:
            server.shutdown()

    def test_rest_branch_cow(self, spark, tmp_path):
        """Branch-scoped copy-on-write over REST: the replace pins the
        BRANCH ref via assert-ref-snapshot-id and advances only it; a
        raced commit to the same branch 409s into
        ReplaceConflictError."""
        warehouse = str(tmp_path / "rwh2")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
                ReplaceConflictError,
            )
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "bc", _df(spark).schema,
                                    partition_source="ts")
            t.append_dataframe(_df(spark))
            main_before = t.current_snapshot()["snapshot-id"]
            t.set_ref("audit", main_before, "branch")
            sid, n = t.update_where(
                spark, "id < 4", {"v": "'u'"},
                mode="copy-on-write", branch="audit",
            )
            assert n == 4
            assert t.current_snapshot()["snapshot-id"] == main_before
            assert t.metadata()["refs"]["audit"]["snapshot-id"] == sid
            assert t.read_ref(spark, "audit").where("v = 'u'").count() == 4
            assert t.read(spark).where("v = 'u'").count() == 0
            # raced branch advance -> 409 -> ReplaceConflictError
            # (delete_where imports plan_delete from iceberg_fs at call
            # time, so patching the fs module attribute intercepts it)
            import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as fsmod

            real = fsmod.plan_delete

            def racing_plan(*a, **k):
                out = real(*a, **k)
                t.append_dataframe_to_branch(
                    "audit", _df(spark, 5, base=300)
                )
                return out

            fsmod.plan_delete = racing_plan
            try:
                with pytest.raises(ReplaceConflictError):
                    t.delete_where(spark, "id < 2", mode="copy-on-write",
                                   branch="audit")
            finally:
                fsmod.plan_delete = real
        finally:
            server.shutdown()
