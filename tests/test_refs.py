"""Named refs (tags + branches) on both catalog transports: a tag pins
a snapshot (a dataset release) against expiry, reads resolve through
refs, appends preserve existing refs, and dropping a ref makes its
snapshot expirable again."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

from rest_stub import make_server


def _df(spark, n=20, tag=""):
    return (
        spark.range(n)
        .withColumn("ts", F.to_timestamp(F.lit("2024-03-01 00:00:00")))
        .withColumn("v", F.lit(tag))
    )


@pytest.fixture()
def table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "r", _df(spark).schema, partition_source="ts")
    s1 = t.append_dataframe(_df(spark, tag="v1"))
    s2 = t.append_dataframe(_df(spark, tag="v2"))
    return t, (s1, s2)


class TestFsRefs:
    def test_tag_pins_and_reads(self, spark, table):
        t, (s1, s2) = table
        t.set_ref("release-1", s1, "tag")
        assert t.resolve_ref("release-1") == s1
        out = t.read_ref(spark, "release-1")
        assert out.count() == 20 and out.filter("v = 'v2'").count() == 0
        # main still reads the latest
        assert t.read(spark).count() == 40

    def test_appends_preserve_refs(self, spark, table):
        t, (s1, _) = table
        t.set_ref("release-1", s1, "tag")
        t.append_dataframe(_df(spark, tag="v3"))
        assert t.resolve_ref("release-1") == s1  # not clobbered by append
        assert t.metadata()["refs"]["main"]["snapshot-id"] == t.current_snapshot()["snapshot-id"]

    def test_tagged_snapshot_survives_expiry(self, spark, table):
        t, (s1, s2) = table
        t.set_ref("release-1", s1, "tag")
        deleted = t.expire_snapshots(keep_last=1)
        ids = {s["snapshot-id"] for s in t.snapshots()}
        assert s1 in ids and s2 in ids  # s1 pinned by tag, s2 is tail
        assert deleted == []  # nothing was actually expirable
        # drop the tag -> s1 becomes expirable
        t.drop_ref("release-1")
        t.expire_snapshots(keep_last=1)
        ids = {s["snapshot-id"] for s in t.snapshots()}
        assert s1 not in ids and s2 in ids
        assert t.read(spark).count() == 40  # current data intact

    def test_ref_validation(self, spark, table):
        t, (s1, _) = table
        with pytest.raises(ValueError, match="unknown snapshot"):
            t.set_ref("x", 123456789, "tag")
        with pytest.raises(ValueError, match="tag|branch"):
            t.set_ref("x", s1, "bookmark")
        with pytest.raises(ValueError, match="main"):
            t.drop_ref("main")
        with pytest.raises(ValueError, match="unknown ref"):
            t.resolve_ref("ghost")


class TestRollbackAndAsOf:
    def test_rollback_unpublishes_then_as_of_reflects_it(self, spark, table):
        import time as _time

        t, (s1, s2) = table
        before_rollback_ms = int(_time.time() * 1000)
        assert t.read(spark).count() == 40
        # un-publish the bad second append
        assert t.rollback_to(s1) == s1
        assert t.metadata()["current-snapshot-id"] == s1
        assert t.read(spark).count() == 20
        # rolled-past snapshot still readable by explicit id (time travel)
        assert t.read(spark, snapshot_id=s2).count() == 40
        # timestamp as-of: a reader "before the rollback" saw s2...
        assert t.snapshot_as_of(before_rollback_ms) == s2
        # ...and a reader "now" sees s1 (the rollback is in the log)
        _time.sleep(0.01)
        assert t.snapshot_as_of(int(_time.time() * 1000)) == s1
        # appends continue from the rolled-back head
        s4 = t.append_dataframe(_df(spark, tag="v4"))
        snap = t.current_snapshot()
        assert snap["snapshot-id"] == s4 and snap["parent-snapshot-id"] == s1
        got = t.read(spark)
        assert got.count() == 40 and got.filter("v = 'v2'").count() == 0

    def test_rollback_rejects_non_ancestor(self, spark, table):
        t, (s1, s2) = table
        t.rollback_to(s1)
        s3 = t.append_dataframe(_df(spark, tag="v3"))
        # s2 forked off: it is no longer on main's ancestry
        with pytest.raises(ValueError, match="not an ancestor"):
            t.rollback_to(s2)
        assert t.metadata()["current-snapshot-id"] == s3

    def test_as_of_before_first_commit_is_none(self, spark, table):
        t, _ = table
        assert t.snapshot_as_of(0) is None

    def test_cli_rollback(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "rc", _df(spark).schema)
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        t.append_dataframe(_df(spark, tag="v2"))
        rc = main(
            [
                "rollback",
                "--warehouse", str(tmp_path / "wh"),
                "--table", "rc",
                "--to-snapshot", str(s1),
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["current_snapshot"] == s1
        assert t.read(spark).count() == 20

    def test_rest_rollback(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "wh_rest")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "rr", _df(spark).schema)
            s1 = t.append_dataframe(_df(spark, tag="v1"))
            t.append_dataframe(_df(spark, tag="v2"))
            assert t.rollback_to(s1) == s1
            assert t.metadata()["current-snapshot-id"] == s1
            assert t.read(spark).count() == 20
            with pytest.raises(ValueError, match="not an ancestor"):
                t.rollback_to(123456789)
        finally:
            server.shutdown()


class TestRestRefs:
    def test_tag_over_rest(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table(
                "otel", "r", _df(spark).schema, partition_source="ts"
            )
            s1 = t.append_dataframe(_df(spark, tag="v1"))
            s2 = t.append_dataframe(_df(spark, tag="v2"))
            t.set_ref("release-1", s1, "tag")
            assert t.resolve_ref("release-1") == s1
            # tagging does NOT move the current snapshot
            assert t.current_snapshot()["snapshot-id"] == s2
            assert t.read_ref(spark, "release-1").count() == 20
            # append preserves the tag (stub merges refs)
            t.append_dataframe(_df(spark, tag="v3"))
            assert t.resolve_ref("release-1") == s1
        finally:
            server.shutdown()


class TestMetadataCommitRetryBudget:
    """`commit.retry.num-retries` governs EVERY commit the engine can
    make — the metadata-only paths (set_ref, drop_ref, expire,
    _commit_metadata) included, not just data commits. A contended
    multi-writer table can raise the budget per table; the old
    hard-coded 3 attempts could not be raised at all."""

    def _contend(self, monkeypatch, n_conflicts: int):
        """Make the next `n_conflicts` metadata CAS writes lose to a
        simulated concurrent writer: the competitor's version actually
        lands (so the loser's wait-for-advance sees progress, exactly
        like a real race) and the caller gets CommitConflictError."""
        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs as fsmod

        real_write = fsmod._write_metadata_version
        state = {"left": n_conflicts, "seen": 0}

        def contended(location, version, md):
            state["seen"] += 1
            if state["left"] > 0:
                state["left"] -= 1
                real_write(location, version, md)
                fsmod._swap_version_hint(location, version)
                raise fsmod.CommitConflictError(f"raced at v{version}")
            return real_write(location, version, md)

        monkeypatch.setattr(fsmod, "_write_metadata_version", contended)
        return state

    def test_raised_budget_survives_contention_that_exhausts_default(
        self, spark, table, monkeypatch
    ):
        t, (s1, _) = table
        # default budget is 4 retries = 5 attempts; the old hard-code
        # was 3. 8 consecutive losses exhaust both — raising the table
        # property is the only way through, which is the point.
        t.set_properties({"commit.retry.num-retries": "12"})
        state = self._contend(monkeypatch, 8)
        t.set_ref("release-1", s1, "tag")
        assert state["left"] == 0
        assert t.resolve_ref("release-1") == s1

    def test_zero_retry_budget_fails_on_first_conflict(
        self, spark, table, monkeypatch
    ):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            CommitConflictError,
        )

        t, (s1, _) = table
        t.set_properties({"commit.retry.num-retries": "0"})
        state = self._contend(monkeypatch, 1)
        with pytest.raises(CommitConflictError):
            t.set_ref("release-1", s1, "tag")
        assert state["seen"] == 1  # exactly one attempt, no silent retries

    def test_expire_honors_budget(self, spark, table, monkeypatch):
        t, (s1, s2) = table
        t.set_properties({"commit.retry.num-retries": "12"})
        state = self._contend(monkeypatch, 8)
        t.expire_snapshots(keep_last=1)
        # the competitor's landed metadata IS the expire result, so the
        # re-plan legitimately short-circuits once it sees it — what
        # matters is that conflicts were consumed without raising and
        # the expiry took effect
        assert state["left"] < 8
        ids = {s["snapshot-id"] for s in t.snapshots()}
        assert s1 not in ids and s2 in ids
