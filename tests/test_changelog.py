"""Row-level changelog (CDC read) over a snapshot window — the read
half of the CDC story (equality upserts / merge-on-read deletes are the
write half). `changelog_scan` emits `insert` rows for appends, FULL
pre-image `delete` rows for position deletes (tuples joined back to the
parent snapshot's files — cost tracks deleted rows, never the table),
and key-only `delete_key` rows for equality deletes; compaction and
delete-folding (`replace`) are logical no-ops and are skipped;
copy-on-write overwrites raise (their removals are invisible to a
metadata walk). A downstream materializer applying
delete-then-insert per commit reproduces the table exactly — pinned
below.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

from rest_stub import make_server


def _df(spark, n=100, hours=4, base=0, tag="a"):
    return (
        spark.range(base, base + n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % hours).cast("int"))
            ),
        )
        .withColumn("v", F.col("id") * 10)
        .withColumn("tag", F.lit(tag))
    )


@pytest.fixture()
def fs_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "events", _df(spark).schema, partition_source="ts")
    t.append_dataframe(_df(spark))
    return t


class TestChangelog:
    def test_appends_emit_inserts(self, spark, fs_table):
        t = fs_table
        s1 = t.current_snapshot()["snapshot-id"]
        t.append_dataframe(_df(spark, n=50, base=1000, tag="b"))
        out = t.changelog_scan(spark)
        assert out.count() == 150
        assert out.filter("_change_type != 'insert'").count() == 0
        # per-commit attribution + global ordering column
        by_snap = {
            r["_commit_snapshot_id"]: r["count"]
            for r in out.groupBy("_commit_snapshot_id").count().collect()
        }
        assert by_snap[s1] == 100
        assert out.select("_commit_sequence_number").distinct().count() == 2

    def test_window_from_checkpoint(self, spark, fs_table):
        t = fs_table
        ckpt = t.current_snapshot()["snapshot-id"]
        t.append_dataframe(_df(spark, n=30, base=500, tag="b"))
        out = t.changelog_scan(spark, from_snapshot_id=ckpt)
        assert out.count() == 30
        assert out.filter("tag = 'b'").count() == 30

    def test_position_delete_emits_full_rows(self, spark, fs_table):
        t = fs_table
        ckpt = t.current_snapshot()["snapshot-id"]
        t.delete_where(spark, "id % 10 = 3", mode="merge-on-read")
        out = t.changelog_scan(spark, from_snapshot_id=ckpt)
        assert out.count() == 10
        rows = out.collect()
        # full pre-image content, not just keys
        assert all(
            r["_change_type"] == "delete"
            and r["v"] == r["id"] * 10
            and r["tag"] == "a"
            for r in rows
        )

    def test_equality_delete_emits_keys(self, spark, fs_table):
        t = fs_table
        ckpt = t.current_snapshot()["snapshot-id"]
        t.delete_where_equality(
            spark, spark.createDataFrame([(7,), (8,)], "id long"), ["id"]
        )
        out = t.changelog_scan(spark, from_snapshot_id=ckpt).collect()
        assert len(out) == 2
        assert {r["id"] for r in out} == {7, 8}
        assert all(
            r["_change_type"] == "delete_key" and r["v"] is None and r["tag"] is None
            for r in out
        )

    def test_upsert_emits_delete_keys_then_inserts(self, spark, fs_table):
        t = fs_table
        ckpt = t.current_snapshot()["snapshot-id"]
        t.upsert_equality(spark, _df(spark, n=5, tag="new"), ["id"])
        out = t.changelog_scan(spark, from_snapshot_id=ckpt)
        kinds = {
            r["_change_type"]: r["count"]
            for r in out.groupBy("_change_type").count().collect()
        }
        assert kinds == {"delete_key": 5, "insert": 5}
        # both halves belong to the SAME commit
        assert out.select("_commit_snapshot_id").distinct().count() == 1

    def test_compaction_and_fold_are_skipped(self, spark, fs_table):
        t = fs_table
        t.append_dataframe(_df(spark, n=40, base=2000, tag="b"))
        t.delete_where(spark, "id = 1", mode="merge-on-read")
        n_before = t.changelog_scan(spark).count()
        t.rewrite_data_files(spark, target_bytes=1 << 30, min_files=2)
        t.rewrite_position_deletes(spark)
        assert t.changelog_scan(spark).count() == n_before

    def test_cow_overwrite_raises(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id = 5", mode="copy-on-write")
        with pytest.raises(ValueError, match="copy-on-write"):
            t.changelog_scan(spark)
        # but a window BEFORE the overwrite still reads
        first = t.snapshots()[0]["snapshot-id"]
        assert t.changelog_scan(spark, to_snapshot_id=first).count() == 100

    def test_materializer_roundtrip(self, spark, fs_table):
        """Applying the changelog per commit (delete-then-insert)
        reproduces the live table exactly — the contract a downstream
        CDC consumer relies on."""
        t = fs_table
        t.append_dataframe(_df(spark, n=20, base=300, tag="b"))
        t.delete_where(spark, "id % 7 = 1", mode="merge-on-read")
        t.upsert_equality(
            spark, _df(spark, n=10, base=5, tag="up"), ["id"]
        )
        t.delete_where_equality(
            spark, spark.createDataFrame([(9,), (301,)], "id long"), ["id"]
        )
        log = t.changelog_scan(spark)
        commits = [
            r["_commit_sequence_number"]
            for r in log.select("_commit_sequence_number").distinct().sort(
                "_commit_sequence_number"
            ).collect()
        ]
        state = None
        for c in commits:
            batch = log.filter(F.col("_commit_sequence_number") == c)
            dels = batch.filter("_change_type in ('delete', 'delete_key')").select("id")
            ins = batch.filter("_change_type = 'insert'").drop(
                "_change_type", "_commit_snapshot_id", "_commit_sequence_number"
            )
            if state is not None:
                state = state.join(dels, "id", "left_anti")
                state = state.unionByName(ins)
            else:
                state = ins
        expect = {(r["id"], r["v"], r["tag"]) for r in t.read(spark).collect()}
        got = {(r["id"], r["v"], r["tag"]) for r in state.collect()}
        assert got == expect


class TestBranchIsolation:
    def test_staged_commits_invisible_until_published(self, spark, fs_table):
        """WAP staging must not leak into main's change streams: a
        branch-staged append is invisible to incremental_scan AND
        changelog_scan (and does not advance the checkpoint) until
        fast_forward publishes it — then it appears exactly once."""
        t = fs_table
        ck = t.current_snapshot()["snapshot-id"]
        t.append_dataframe_to_branch("audit", _df(spark, n=5, base=900, tag="staged"))
        files, end = t.incremental_scan(from_snapshot_id=ck)
        assert files == [] and end == ck
        assert t.changelog_scan(spark, from_snapshot_id=ck).count() == 0
        # a staged snapshot id is not a valid main checkpoint either
        staged_sid = t.metadata()["refs"]["audit"]["snapshot-id"]
        with pytest.raises(ValueError, match="ancestor"):
            t.incremental_scan(from_snapshot_id=staged_sid)
        t.fast_forward("audit")
        files2, end2 = t.incremental_scan(from_snapshot_id=ck)
        assert sum(f.record_count for f in files2) == 5
        assert end2 == t.current_snapshot()["snapshot-id"]
        log = t.changelog_scan(spark, from_snapshot_id=ck)
        assert log.count() == 5
        assert log.filter("tag = 'staged'").count() == 5


class TestChangelogCli:
    def test_changes_changelog_cli(self, spark, fs_table, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        t = fs_table
        ckpt = t.current_snapshot()["snapshot-id"]
        t.upsert_equality(spark, _df(spark, n=5, tag="up"), ["id"])
        out_dir = str(tmp_path / "out")
        wh = os.path.dirname(os.path.dirname(t.location))
        rc = main(
            [
                "changes",
                "--warehouse", wh,
                "--table", "events",
                "--from-snapshot", str(ckpt),
                "--output", out_dir,
                "--changelog",
            ]
        )
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and res["rows"] == 10 and res["changelog"] is True
        assert res["checkpoint_snapshot"] == t.current_snapshot()["snapshot-id"]
        written = spark.read.parquet(out_dir)
        assert written.filter("_change_type = 'insert'").count() == 5
        assert written.filter("_change_type = 'delete_key'").count() == 5


class TestRestChangelog:
    def test_changelog_over_rest(self, spark, tmp_path):
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
                "otel", "ev", _df(spark).schema, partition_source="ts"
            )
            t.append_dataframe(_df(spark, n=50))
            ckpt = t.current_snapshot()["snapshot-id"]
            t.upsert_equality(spark, _df(spark, n=5, tag="up"), ["id"])
            out = t.changelog_scan(spark, from_snapshot_id=ckpt)
            kinds = {
                r["_change_type"]: r["count"]
                for r in out.groupBy("_change_type").count().collect()
            }
            assert kinds == {"delete_key": 5, "insert": 5}
        finally:
            server.shutdown()
