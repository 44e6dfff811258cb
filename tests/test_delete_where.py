"""Row-level copy-on-write DELETE (delete_where) on both catalog
transports: only files containing matches are rewritten, untouched
files survive by reference, whole-file deletes write no replacement,
time travel still sees pre-delete rows, the overwrite snapshot breaks
incremental append scans (Iceberg's incremental contract), and a
concurrent advance conflicts instead of losing rows."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    ReplaceConflictError,
)

from rest_stub import make_server


def _docs_df(spark, n=40):
    """4 hourly partitions x 10 rows; `flag` marks rows to purge."""
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % 4).cast("int"))
            ),
        )
        .withColumn("flag", (F.col("id") % 10 == 3))
        .withColumn("txt", F.concat(F.lit("doc-"), F.col("id")))
    )


@pytest.fixture()
def fs_table(spark, tmp_path):
    df = _docs_df(spark)
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "docs", df.schema, partition_source="ts")
    t.append_dataframe(df)
    return t, df


class TestFsDeleteWhere:
    def test_deletes_matching_rows_only(self, spark, fs_table):
        t, _ = fs_table
        pre_snapshot = t.current_snapshot()["snapshot-id"]
        sid, n = t.delete_where(spark, "flag")
        assert n == 4  # one flagged row per hour partition
        out = t.read(spark)
        assert out.count() == 36
        assert out.filter("flag").count() == 0
        snap = t.current_snapshot()
        assert snap["snapshot-id"] == sid
        assert snap["summary"]["operation"] == "overwrite"
        assert snap["summary"]["deleted-records"] == "4"
        # time travel: the purge is a new snapshot, not history rewrite
        assert t.read(spark, snapshot_id=pre_snapshot).count() == 40

    def test_untouched_files_survive_by_reference(self, spark, fs_table):
        t, _ = fs_table
        before = {f.file_path for f in t.plan_files()[0]}
        t.delete_where(spark, "id = 3")  # matches exactly one partition's file
        after = {f.file_path for f in t.plan_files()[0]}
        # 3 of 4 files unchanged (same physical path), 1 replaced
        assert len(before & after) == 3
        assert len(after - before) == 1

    def test_whole_file_delete_writes_no_replacement(self, spark, fs_table):
        t, _ = fs_table
        sid, n = t.delete_where(spark, "hour(ts) = 2")  # an entire partition
        assert n == 10
        files = t.plan_files()[0]
        assert len(files) == 3  # partition's file gone, nothing written for it
        assert t.read(spark).count() == 30

    def test_null_predicate_rows_are_kept(self, spark, tmp_path):
        """SQL DELETE semantics: a predicate evaluating NULL does not
        match — those rows must survive (a bare NOT(pred) filter would
        silently drop them)."""
        df = _docs_df(spark).withColumn(
            "maybe", F.when(F.col("id") % 2 == 0, F.col("id"))
        )  # odd ids -> NULL
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "nulls", df.schema, partition_source="ts")
        t.append_dataframe(df)
        sid, n = t.delete_where(spark, "maybe = 0")  # NULL for odd ids
        assert n == 1  # only id=0 matches
        out = t.read(spark)
        assert out.count() == 39
        assert out.filter("maybe IS NULL").count() == 20  # all odd rows kept

    def test_no_match_is_a_noop(self, spark, fs_table):
        t, _ = fs_table
        assert t.delete_where(spark, "id = 99999") == (None, 0)
        assert len(t.snapshots()) == 1  # no empty overwrite snapshot

    def test_overwrite_breaks_incremental_scans(self, spark, fs_table):
        """Iceberg's incremental append scan cannot represent deletes —
        a window crossing the overwrite must raise, never silently skip
        (consumers full-rescan after a purge)."""
        t, _ = fs_table
        s1 = t.current_snapshot()["snapshot-id"]
        t.delete_where(spark, "flag")
        with pytest.raises(ValueError, match="overwrite"):
            t.incremental_files(from_snapshot_id=s1)

    def test_concurrent_advance_conflicts(self, spark, fs_table, monkeypatch):
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as ifs

        t, df = fs_table
        real = ifs._write_metadata_version
        state = {"raced": False}

        def racy(location, version, metadata):
            if not state["raced"]:
                state["raced"] = True
                monkeypatch.setattr(ifs, "_write_metadata_version", real)
                ifs.FsTable(location).append_dataframe(df.limit(2))
                monkeypatch.setattr(ifs, "_write_metadata_version", racy)
            return real(location, version, metadata)

        monkeypatch.setattr(ifs, "_write_metadata_version", racy)
        with pytest.raises(ReplaceConflictError):
            t.delete_where(spark, "flag")

    def test_expire_reclaims_predelete_files(self, spark, fs_table):
        t, _ = fs_table
        t.delete_where(spark, "flag")
        deleted = t.expire_snapshots(keep_last=1)
        assert deleted  # the 4 pre-delete files (all contained a match)
        assert t.read(spark).count() == 36
        for p in deleted:
            assert not os.path.exists(p)


class TestRemoveOrphanFiles:
    def test_sweeps_only_old_unreferenced(self, spark, fs_table):
        """Orphans older than the age guard are reclaimed; referenced
        files and fresh orphans survive."""
        import time as time_mod

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )

        t, df = fs_table
        referenced = set(t.all_files())
        orphans = {
            f.file_path for f in write_partitioned_batch(df, t.location, t.metadata())
        }
        # fresh orphans are NOT swept (in-flight-commit protection)
        assert t.remove_orphan_files(older_than_seconds=3600) == []
        # age them past the cutoff
        old = time_mod.time() - 10
        for p in orphans:
            os.utime(p, (old, old))
        deleted = set(t.remove_orphan_files(older_than_seconds=5))
        assert deleted == orphans
        for p in referenced:
            assert os.path.exists(p)
        assert t.read(spark).count() == 40  # table untouched

    def test_recovery_beats_sweep_when_both_apply(self, spark, fs_table):
        """The two orphan treatments compose: files re-registered by
        recovery become referenced and are never swept."""
        import time as time_mod

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )

        t, df = fs_table
        orphans = [
            f.file_path for f in write_partitioned_batch(df, t.location, t.metadata())
        ]
        t.add_data_files(orphans)  # recovery path registers them
        old = time_mod.time() - 10
        for p in orphans:
            os.utime(p, (old, old))
        assert t.remove_orphan_files(older_than_seconds=5) == []
        assert t.read(spark).count() == 80


class TestDeleteCli:
    def test_delete_subcommand(self, spark, fs_table, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        t, _ = fs_table
        warehouse = os.path.dirname(os.path.dirname(t.location))
        rc = main(
            [
                "delete",
                "--warehouse",
                warehouse,
                "--table",
                "docs",
                "--where",
                "flag",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["deleted_rows"] == 4
        assert t.read(spark).count() == 36


class TestRestDeleteWhere:
    def test_delete_over_rest(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            df = _docs_df(spark)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "docs", df.schema, partition_source="ts")
            t.append_dataframe(df)
            sid, n = t.delete_where(spark, "flag")
            assert n == 4 and sid is not None
            assert t.read(spark).count() == 36
            assert t.current_snapshot()["summary"]["operation"] == "overwrite"

            # conflict path: injected 409 on the overwrite commit
            state.inject(
                409,
                "CommitFailedException",
                "Requirement failed: branch main has changed",
                method="POST",
                path_re=r"/tables/docs$",
            )
            with pytest.raises(ReplaceConflictError):
                t.delete_where(spark, "id >= 0")
        finally:
            server.shutdown()
