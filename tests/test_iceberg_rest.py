"""Executed Iceberg REST catalog protocol (pure-Python client vs an
in-process HTTP stub server).

The reference's production catalog mode is the REST client
(catalog_rest.go:86-467). These tests run the actual HTTP protocol end
to end: /v1/config handshake (with a server-assigned prefix), the
EnsureNamespace / EnsureTable load-create-reload race ladders, atomic
appends via CommitTable with assert-ref-snapshot-id (including genuine
two-thread commit races arbitrated by the server), AddFiles over the
raw sink layout, ListDataFiles across all snapshots, X2 error
classification of REST failures, and o05-style reconciliation over the
REST listing.
"""

from __future__ import annotations

import os
import threading

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.errors import (
    PERMANENT,
    TRANSIENT,
    classify_error,
)
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
    RestCatalogClient,
    RestCommitConflictError,
    RestCommitStateUnknownError,
    RestError,
    RestTable,
)
from opentelemetry_iceberg_exporter_spark.recovery.rest_adapter import (
    recover_rest_warehouse,
    rest_registered_files,
)

from rest_stub import make_server


@pytest.fixture()
def catalog(tmp_path):
    warehouse = str(tmp_path / "warehouse")
    os.makedirs(warehouse)
    server, state, uri = make_server(warehouse)
    client = RestCatalogClient(uri, warehouse=warehouse)
    yield client, state, warehouse
    server.shutdown()


def _events_df(spark, n=40, hours=4):
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % hours).cast("int"))
            ),
        )
        .withColumn("name", F.concat(F.lit("evt-"), F.col("id")))
        .select("id", "ts", "name")
    )


# --------------------------------------------------------------------------
# handshake + namespaces + tables (catalog_rest.go:86-240)
# --------------------------------------------------------------------------


class TestCatalogProtocol:
    def test_config_handshake_applies_server_prefix(self, catalog):
        client, state, _ = catalog
        assert client.prefix == "catalogs/demo"
        # all subsequent routes carry the prefix
        client.ensure_namespace("otel")
        assert any("/catalogs/demo/namespaces" in p for _, p in state.requests)

    def test_ensure_namespace_idempotent_and_race_tolerant(self, catalog):
        client, state, _ = catalog
        client.ensure_namespace("otel")
        assert client.namespace_exists("otel")
        client.ensure_namespace("otel")  # second call: load short-circuits
        # create race: another writer created it between our 404 and our
        # POST -> AlreadyExists resolves to success via re-load
        # (catalog_rest.go:144-161)
        state.namespaces["racing"] = {}
        state.inject(404, "NoSuchNamespaceException", "Namespace does not exist: racing")
        client.ensure_namespace("racing")

    def test_ensure_table_caches_and_tolerates_create_race(self, catalog, spark):
        client, state, _ = catalog
        df = _events_df(spark)
        client.ensure_namespace("otel")
        client.ensure_table("otel", "traces", df.schema, partition_source="ts")
        n_before = len(state.requests)
        client.ensure_table("otel", "traces", df.schema, partition_source="ts")
        assert len(state.requests) == n_before  # cache hit: zero HTTP calls

        # create race (go:214-219): our existence check 404s, our create
        # then collides with the concurrent creator -> resolved by re-load
        client2 = RestCatalogClient(client.uri, warehouse=client.warehouse)
        state.inject(404, "NoSuchTableException", "Table does not exist: otel.traces")
        t = client2.ensure_table("otel", "traces", df.schema, partition_source="ts")
        assert t.metadata()["table-uuid"]

    def test_create_table_metadata_shape(self, catalog, spark):
        client, _, warehouse = catalog
        df = _events_df(spark)
        client.ensure_namespace("otel")
        t = client.ensure_table(
            "otel", "traces", df.schema, partition_source="ts", granularity="hourly"
        )
        md = t.metadata()
        assert md["format-version"] == 2
        assert md["location"] == os.path.join(warehouse, "otel", "traces")
        spec = t.partition_spec()
        assert spec[0]["transform"] == "hours" and spec[0]["name"] == "ts_hour"
        names = [f["name"] for f in md["schemas"][0]["fields"]]
        assert names == ["id", "ts", "name"]

    def test_missing_table_raises_404_resterror(self, catalog):
        client, _, _ = catalog
        client.ensure_namespace("otel")
        with pytest.raises(RestError) as exc_info:
            client.load_table("otel", "nope")
        assert exc_info.value.status == 404


# --------------------------------------------------------------------------
# commit protocol (catalog_rest.go:243-303)
# --------------------------------------------------------------------------


class TestRestCommit:
    def test_append_dataframe_roundtrip_with_snapshot_props(self, catalog, spark):
        client, _, _ = catalog
        df = _events_df(spark)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "events", df.schema, partition_source="ts")
        sid = t.append_dataframe(df, {"otel.exporter": "iceberg", "otel.record_count": "40"})
        assert sid is not None
        snap = t.current_snapshot()
        assert snap["snapshot-id"] == sid
        assert snap["summary"]["otel.exporter"] == "iceberg"
        assert snap["summary"]["operation"] == "append"
        back = t.read(spark)
        assert back.count() == 40
        assert {r.name for r in back.select("name").limit(3).collect()} <= {
            f"evt-{i}" for i in range(40)
        }

    def test_empty_append_commits_nothing(self, catalog, spark):
        client, _, _ = catalog
        df = _events_df(spark).limit(0)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "empty", df.schema, partition_source="ts")
        assert t.append_dataframe(df) is None  # F1 short-circuit
        assert t.snapshots() == []

    def test_sequential_appends_accumulate(self, catalog, spark):
        client, _, _ = catalog
        df = _events_df(spark, n=20)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "acc", df.schema, partition_source="ts")
        t.append_dataframe(df)
        t.append_dataframe(df)
        assert len(t.snapshots()) == 2
        assert t.read(spark).count() == 40
        seqs = [s["sequence-number"] for s in t.snapshots()]
        assert seqs == [1, 2]

    def test_injected_conflict_retries_and_lands(self, catalog, spark):
        client, state, _ = catalog
        df = _events_df(spark, n=10)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "retry", df.schema, partition_source="ts")
        state.inject(
            409,
            "CommitFailedException",
            "Requirement failed: branch main has changed",
            method="POST",
            path_re=r"/tables/retry$",
        )
        # injection consumes the first commit POST; the retry reloads and lands
        sid = t.append_dataframe(df)
        assert sid is not None and t.current_snapshot()["snapshot-id"] == sid

    def test_exhausted_retries_raise_conflict(self, catalog, spark):
        client, state, _ = catalog
        df = _events_df(spark, n=5)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "lose", df.schema, partition_source="ts")
        files = []
        # every commit POST conflicts -> the client gives up after 3 tries
        state.inject(
            409,
            "CommitFailedException",
            "Requirement failed: branch main has changed",
            times=10,
            method="POST",
            path_re=r"/tables/lose$",
        )
        with pytest.raises(RestCommitConflictError):
            t.append_files(files)

    def test_concurrent_two_writer_race_both_land(self, catalog, spark):
        """Genuine concurrency: two threads commit to one table at once.
        The server's lock admits one; the loser's assert-ref-snapshot-id
        fails with 409 and its client-side retry rebuilds on the new
        base — both snapshots land, linear history, no lost updates."""
        client, _, _ = catalog
        df = _events_df(spark, n=12)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "race", df.schema, partition_source="ts")
        # pre-write both file sets so threads only race the COMMIT
        md = t.metadata()
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )

        files_a = write_partitioned_batch(df, md["location"], md)
        files_b = write_partitioned_batch(df, md["location"], md)
        results, errors = [], []
        barrier = threading.Barrier(2)

        def commit(files):
            try:
                barrier.wait()
                results.append(t.append_files(files))
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=commit, args=(fs,)) for fs in (files_a, files_b)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors
        assert len(results) == 2
        snaps = t.snapshots()
        assert {s["snapshot-id"] for s in snaps} == set(results)
        assert [s["sequence-number"] for s in snaps] == [1, 2]
        assert t.read(spark).count() == 24  # no lost update


# --------------------------------------------------------------------------
# add_files + listing (catalog_rest.go:306-467)
# --------------------------------------------------------------------------


class TestCommitAmbiguity:
    """The case errors.go punts on: the server APPLIES a commit but the
    response is lost (503 after the state advanced). The snapshot id is
    client-generated, so the engine resolves the ambiguity by reloading
    and looking for it — landed = idempotent success (never a double
    commit), verified-absent = rebuild + retry, reload-also-failed =
    RestCommitStateUnknownError."""

    def _table(self, catalog, spark, name):
        client, state, _ = catalog
        df = _events_df(spark, n=4)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", name, df.schema, partition_source="ts")
        return state, t

    def _file(self, i=0):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import DataFile

        return DataFile(f"/data/amb{i}.parquet", 100, 10, {"ts_hour": 1 + i})

    def test_lost_response_append_is_idempotent(self, catalog, spark):
        state, t = self._table(catalog, spark, "amb1")
        state.lose_commit_responses = 1
        sid = t.append_files([self._file()])
        snaps = t.snapshots()
        assert [s["snapshot-id"] for s in snaps] == [sid]  # exactly ONE commit
        assert t.metadata()["current-snapshot-id"] == sid

    def test_pre_commit_5xx_retries_cleanly(self, catalog, spark):
        """A 503 BEFORE the server applied anything: the landed-check
        finds the snapshot absent and the retry commits fresh."""
        state, t = self._table(catalog, spark, "amb2")
        state.inject(
            503,
            "ServiceUnavailableException",
            "upstream hiccup",
            times=1,
            method="POST",
            path_re=r"/tables/amb2$",
        )
        sid = t.append_files([self._file()])
        assert [s["snapshot-id"] for s in t.snapshots()] == [sid]

    def test_definite_4xx_raises_without_retry(self, catalog, spark):
        state, t = self._table(catalog, spark, "amb3")
        state.inject(
            400,
            "BadRequestException",
            "malformed",
            times=1,
            method="POST",
            path_re=r"/tables/amb3$",
        )
        with pytest.raises(RestError) as exc_info:
            t.append_files([self._file()])
        assert exc_info.value.status == 400
        assert t.snapshots() == []

    def test_reload_failure_surfaces_state_unknown(self, catalog, spark):
        """Lost response AND the landed-check reload fails: the one
        genuinely unresolvable outcome gets its own error type (callers
        must NOT blindly re-commit on it). Driven through the resolver
        against the live stub — an injected GET outage cannot
        distinguish the pre-commit load from the landed-check reload."""
        state, t = self._table(catalog, spark, "amb4")
        state.inject(
            503,
            "ServiceUnavailableException",
            "reload also down",
            times=3,
            method="GET",
            path_re=r"/tables/amb4$",
        )
        ambiguous = RestError(503, "ServiceUnavailableException", "response lost")
        with pytest.raises(RestCommitStateUnknownError) as exc_info:
            t._resolve_ambiguous_commit(ambiguous, 12345)
        assert "may or may not be committed" in str(exc_info.value)
        # a DEFINITE rejection is never treated as ambiguous
        with pytest.raises(RestError):
            t._resolve_ambiguous_commit(
                RestError(400, "BadRequestException", "nope"), 12345
            )

    def test_garbage_200_load_surfaces_clean_resterror(self, catalog, spark):
        """Byzantine 2xx: a truncated JSON body from a proxy must become
        a classifiable RestError (transient), never a bare
        JSONDecodeError."""
        import json as json_mod

        from opentelemetry_iceberg_exporter_spark.sinks.errors import (
            TRANSIENT,
            classify_error,
        )

        client, state, _ = catalog
        df = _events_df(spark, n=4)
        client.ensure_namespace("otel")
        client.ensure_table("otel", "gz1", df.schema, partition_source="ts")
        state.inject_garbage(times=1, method="GET", path_re=r"/tables/gz1$")
        with pytest.raises(RestError) as exc_info:
            client.load_table("otel", "gz1")
        assert not isinstance(exc_info.value, json_mod.JSONDecodeError)
        assert exc_info.value.error_type == "InvalidResponseException"
        assert classify_error(exc_info.value) == TRANSIENT
        # next call (outage over) succeeds
        assert client.load_table("otel", "gz1")["metadata"]["table-uuid"]

    def test_garbage_200_after_commit_resolves_via_landed_check(self, catalog, spark):
        """The server applied the commit but the 200 body is garbage:
        the 2xx status makes it ambiguous-but-accepted — the landed
        check finds the client-generated snapshot id and returns
        success without double-committing."""
        state, t = self._table(catalog, spark, "gz2")
        state.garbage_commit_responses = 1
        sid = t.append_files([self._file()])
        assert [s["snapshot-id"] for s in t.snapshots()] == [sid]

    def test_concurrent_writers_with_lost_responses(self, catalog, spark):
        """Two threads, and the server loses the response of the first
        TWO commits it applies: every commit must land exactly once —
        landed-checks resolve the ambiguity, 409 retries resolve the
        contention, and no interleaving double-appends."""
        import threading

        client, state, _ = catalog
        df = _events_df(spark, n=4)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "ambrace", df.schema, partition_source="ts")
        state.lose_commit_responses = 2
        results, errors = [], []
        barrier = threading.Barrier(2)

        def commit(i):
            try:
                barrier.wait()
                results.append(t.append_files([self._file(i)]))
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [
            threading.Thread(target=commit, args=(i,)) for i in range(2)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors
        snaps = t.snapshots()
        assert len(snaps) == 2  # exactly one snapshot per writer
        assert sorted(results) == sorted(s["snapshot-id"] for s in snaps)
        # linear history, each file registered exactly once
        assert snaps[1]["parent-snapshot-id"] == snaps[0]["snapshot-id"]
        assert len(t.all_files()) == 2

    def test_lost_response_transaction_idempotent(self, catalog, spark):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            commit_append_transaction,
        )

        client, state, _ = catalog
        df = _events_df(spark, n=4)
        client.ensure_namespace("otel")
        ta = client.ensure_table("otel", "amb5a", df.schema, partition_source="ts")
        tb = client.ensure_table("otel", "amb5b", df.schema, partition_source="ts")
        state.lose_commit_responses = 1
        sids = commit_append_transaction(
            client,
            [(ta, [self._file(0)], None), (tb, [self._file(1)], None)],
        )
        assert [s["snapshot-id"] for s in ta.snapshots()] == [sids[("otel", "amb5a")]]
        assert [s["snapshot-id"] for s in tb.snapshots()] == [sids[("otel", "amb5b")]]

    def test_lost_response_dv_delete_idempotent(self, catalog, spark):
        """A deletion-vector delete whose commit response is lost must
        resolve through the landed check too — one snapshot, one Puffin,
        no double-applied vectors."""
        state, t = self._table(catalog, spark, "amb7")
        df = _events_df(spark, n=10)
        t.append_dataframe(df)
        state.lose_commit_responses = 1
        sid, n = t.delete_where(spark, "id >= 8", mode="deletion-vectors")
        assert n == 2
        assert [s["snapshot-id"] for s in t.snapshots()][-1] == sid
        assert len(t.snapshots()) == 2
        assert t.read(spark).count() == 8

    def test_ambiguous_upsert_path_idempotent(self, catalog, spark):
        """The merge-on-read delta path commits through the same loop —
        a lost response there must not double-apply the delete+insert."""
        state, t = self._table(catalog, spark, "amb6")
        df = _events_df(spark, n=6)
        t.append_dataframe(df)
        state.lose_commit_responses = 1
        sid = t.upsert_equality(
            spark, df.filter("id = 1").withColumn("name", F.lit("upserted")), ["id"]
        )
        assert [s["snapshot-id"] for s in t.snapshots()][-1] == sid
        assert len(t.snapshots()) == 2
        got = t.read(spark)
        assert got.count() == 6
        assert got.filter("id = 1").first()["name"] == "upserted"


class TestAddFilesAndListing:
    def test_add_files_hive_registers_without_copy(self, catalog, spark, tmp_path):
        client, _, _ = catalog
        df = _events_df(spark, n=30, hours=3)
        raw = str(tmp_path / "raw")
        (
            df.withColumn("year", F.year("ts"))
            .withColumn("month", F.month("ts"))
            .withColumn("day", F.dayofmonth("ts"))
            .withColumn("hour", F.hour("ts"))
            .write.partitionBy("year", "month", "day", "hour")
            .parquet(raw)
        )
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "addf", df.schema, partition_source="ts")
        sid = t.add_files_hive(raw, {"otel.file_count": "3"})
        snap = t.current_snapshot()
        assert snap["snapshot-id"] == sid
        assert snap["summary"]["operation-detail"] == "add_files"
        # files registered in place — not copied under the table location
        listed = t.all_files()
        assert listed and all(p.startswith(raw) for p in listed)
        assert t.read(spark).count() == 30

    def test_all_files_dedupes_across_snapshots(self, catalog, spark):
        client, _, _ = catalog
        df = _events_df(spark, n=8)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "lst", df.schema, partition_source="ts")
        t.append_dataframe(df)
        t.append_dataframe(df)
        files = t.all_files()
        # 2 snapshots, each carrying forward the prior manifest: listing
        # is deduped and matches the union of both appends
        assert len(files) == len(set(files))
        assert t.read(spark).count() == 16

    def test_all_files_missing_table_lists_empty(self, catalog):
        client, _, _ = catalog
        client.ensure_namespace("otel")
        assert RestTable(client, "otel", "ghost").all_files() == []

    def test_incremental_scan_returns_checkpoint_id(self, catalog, spark):
        client, _, _ = catalog
        df = _events_df(spark, n=6)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "incr", df.schema, partition_source="ts")
        s1 = t.append_dataframe(df)
        s2 = t.append_dataframe(df)
        files, end = t.incremental_scan(from_snapshot_id=s1)
        assert end == s2
        assert {f.file_path for f in files} == {
            f.file_path for f in t.incremental_scan(from_snapshot_id=s1, to_snapshot_id=s2)[0]
        }


# --------------------------------------------------------------------------
# streaming export through the REST sink (the reference's steady state)
# --------------------------------------------------------------------------


class TestStreamingToRestCatalog:
    def test_stream_commits_per_batch_and_restarts_cleanly(
        self, catalog, spark, tmp_path
    ):
        """foreachBatch -> REST CommitTable, one atomic commit per
        micro-batch; a restart resumes from the checkpoint without
        duplicating data (exactly-once per micro-batch on the
        production catalog transport)."""
        from opentelemetry_iceberg_exporter_spark import schemas as S
        from opentelemetry_iceberg_exporter_spark.config import (
            CatalogConfig,
            ExporterConfig,
            PartitionConfig,
            StorageConfig,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            RestIcebergSink,
        )
        from opentelemetry_iceberg_exporter_spark.streaming import start_export_stream

        from test_otlp_flatten import _span, _traces_payload
        from test_sinks_pipeline import _write_jsonl

        client, _, warehouse = catalog
        cfg = ExporterConfig(
            storage=StorageConfig(provider="filesystem", bucket=str(tmp_path), prefix="raw"),
            catalog=CatalogConfig(catalog_type="rest", uri=client.uri, warehouse=warehouse),
            partition=PartitionConfig(granularity="hourly"),
        )
        src_dir = tmp_path / "stream-in"
        ckpt = str(tmp_path / "ckpt")
        _write_jsonl(str(src_dir / "b1.jsonl"), [_traces_payload([_span()])])

        q = start_export_stream(spark, str(src_dir), "traces", cfg, ckpt, trigger_once=True)
        q.awaitTermination(120)

        sink = RestIcebergSink(spark, cfg)
        t = sink._load(S.SIGNAL_TRACES)
        assert t.read(spark).count() == 1
        assert len(t.snapshots()) == 1

        _write_jsonl(
            str(src_dir / "b2.jsonl"),
            [_traces_payload([_span(spanId="bbbb030405060708")])],
        )
        q2 = start_export_stream(spark, str(src_dir), "traces", cfg, ckpt, trigger_once=True)
        q2.awaitTermination(120)

        got = t.read(spark)
        assert got.count() == 2  # b1 NOT reprocessed
        assert got.select("span_id").distinct().count() == 2
        assert len(t.snapshots()) == 2  # one commit per micro-batch


# --------------------------------------------------------------------------
# table maintenance over REST (compaction + expiry, server-arbitrated)
# --------------------------------------------------------------------------


class TestRestMaintenance:
    def _small_file_table(self, catalog, spark):
        client, state, _ = catalog
        df = _events_df(spark, n=24, hours=2)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "mnt", df.schema, partition_source="ts")
        t.append_dataframe(df)
        t.append_dataframe(df)  # 2 snapshots x 2 hourly partitions
        return t, state

    def test_rewrite_compacts_and_time_travel_survives(self, catalog, spark):
        t, _ = self._small_file_table(catalog, spark)
        old_snapshot = t.snapshots()[0]["snapshot-id"]
        sid = t.rewrite_data_files(spark, target_bytes=1 << 20, min_files=2)
        assert sid is not None
        snap = t.current_snapshot()
        assert snap["summary"]["operation"] == "replace"
        assert snap["summary"]["compacted-files"] == "4"
        # one file per partition now; 48 rows intact
        assert t.metadata_table(spark, "files").count() == 2
        assert t.read(spark).count() == 48
        # old snapshot still time-travels (its files untouched)
        assert t.read(spark, snapshot_id=old_snapshot).count() == 24

    def test_rewrite_conflicts_when_table_advances(self, catalog, spark):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            ReplaceConflictError,
        )

        t, state = self._small_file_table(catalog, spark)
        state.inject(
            409,
            "CommitFailedException",
            "Requirement failed: branch main has changed",
            method="POST",
            path_re=r"/tables/mnt$",
        )
        with pytest.raises(ReplaceConflictError):
            t.rewrite_data_files(spark, target_bytes=1 << 20, min_files=2)

    def test_expire_reclaims_only_unreferenced(self, catalog, spark):
        import os as os_mod

        t, _ = self._small_file_table(catalog, spark)
        t.rewrite_data_files(spark, target_bytes=1 << 20, min_files=2)
        before = set(t.all_files())
        deleted = t.expire_snapshots(keep_last=1)
        assert deleted  # the pre-compaction files are reclaimed
        assert len(t.snapshots()) == 1
        live = set(t.all_files())
        assert live < before
        for p in deleted:
            assert not os_mod.path.exists(p)
        for p in live:
            assert os_mod.path.exists(p)
        assert t.read(spark).count() == 48

    def test_expire_noop_when_nothing_to_drop(self, catalog, spark):
        client, _, _ = catalog
        df = _events_df(spark, n=4)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "one_snap", df.schema, partition_source="ts")
        t.append_dataframe(df)
        assert t.expire_snapshots(keep_last=1) == []

    def test_remove_orphan_files_sweeps_unreferenced_only(self, catalog, spark):
        import time as time_mod

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )

        t, _ = self._small_file_table(catalog, spark)
        referenced = set(t.all_files())
        df = _events_df(spark, n=24, hours=2)
        orphans = {
            f.file_path for f in write_partitioned_batch(df, t.location(), t.metadata())
        }
        # fresh orphans are protected (may belong to an in-flight commit)
        assert t.remove_orphan_files(older_than_seconds=3600) == []
        old = time_mod.time() - 10
        for p in orphans:
            os.utime(p, (old, old))
        deleted = set(t.remove_orphan_files(older_than_seconds=5))
        assert deleted == orphans
        for p in referenced:
            assert os.path.exists(p)
        assert t.read(spark).count() == 48  # table untouched


# --------------------------------------------------------------------------
# X2 error classification over REST (errors.go:43-115)
# --------------------------------------------------------------------------


class TestRestErrorClassification:
    def test_auth_errors_are_permanent(self, tmp_path):
        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse, token="s3cret")
        try:
            with pytest.raises(RestError) as exc_info:
                RestCatalogClient(uri, warehouse=warehouse)  # no token
            assert exc_info.value.status == 401
            assert classify_error(exc_info.value) == PERMANENT
            # correct token connects
            client = RestCatalogClient(uri, warehouse=warehouse, token="s3cret")
            client.ensure_namespace("otel")
        finally:
            server.shutdown()

    def test_status_matrix(self, catalog):
        client, state, _ = catalog
        cases = [
            (403, "ForbiddenException", "forbidden", PERMANENT),
            (400, "ValidationException", "validation failed: bad schema", PERMANENT),
            (409, "CommitFailedException", "Requirement failed", TRANSIENT),
            (503, "ServiceUnavailableException", "service unavailable", TRANSIENT),
            (500, "InternalServerError", "internal server error", TRANSIENT),
            (429, "TooManyRequestsException", "too many requests, slow down", TRANSIENT),
        ]
        for status, etype, msg, expected in cases:
            state.inject(status, etype, msg)
            with pytest.raises(RestError) as exc_info:
                client.list_namespaces()
            assert exc_info.value.status == status
            assert classify_error(exc_info.value) == expected, (status, etype)

    def test_connection_refused_is_transient(self):
        with pytest.raises(RestError) as exc_info:
            RestCatalogClient("http://127.0.0.1:9", timeout=0.5)  # discard port
        assert classify_error(exc_info.value) == TRANSIENT


# --------------------------------------------------------------------------
# o05-style reconciliation over the REST listing (reconciler.go over
# catalog_rest.go:306-467)
# --------------------------------------------------------------------------


class TestRestRecovery:
    def test_recover_orphans_via_rest(self, catalog, spark):
        client, _, warehouse = catalog
        df = _events_df(spark, n=20)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "traces", df.schema, partition_source="ts")
        t.append_dataframe(df)

        # a crashed writer: data files exist under the table, unregistered
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )

        md = t.metadata()
        orphans = {f.file_path for f in write_partitioned_batch(df, md["location"], md)}
        assert orphans and orphans.isdisjoint(set(t.all_files()))

        result = recover_rest_warehouse(
            spark, client, "otel", ["traces"], warehouse, max_batch_size=2
        )
        assert result.orphaned == len(orphans)
        registered = set(t.all_files())
        assert orphans <= registered
        # re-run is a no-op: listing now covers everything
        again = recover_rest_warehouse(spark, client, "otel", ["traces"], warehouse)
        assert again.orphaned == 0

    def test_export_batch_through_rest_sink(self, catalog, spark, tmp_path):
        """The reference's production main loop, executed over HTTP:
        OTLP/JSON batch -> flatten -> conform -> REST CommitTable ->
        read back (exporter.go consume -> catalog_rest.go append)."""
        from opentelemetry_iceberg_exporter_spark import schemas as S
        from opentelemetry_iceberg_exporter_spark.config import (
            CatalogConfig,
            ExporterConfig,
            PartitionConfig,
            StorageConfig,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import RestIcebergSink
        from opentelemetry_iceberg_exporter_spark.streaming import export_batch

        from test_otlp_flatten import _span, _traces_payload
        from test_sinks_pipeline import _write_jsonl

        client, _, warehouse = catalog
        cfg = ExporterConfig(
            storage=StorageConfig(provider="filesystem", bucket=str(tmp_path), prefix="raw"),
            catalog=CatalogConfig(
                catalog_type="rest", uri=client.uri, warehouse=warehouse
            ),
            partition=PartitionConfig(granularity="hourly"),
        )
        inp = tmp_path / "in" / "traces.jsonl"
        _write_jsonl(str(inp), [_traces_payload([_span()])])
        export_batch(spark, str(inp.parent), "traces", cfg)

        sink = RestIcebergSink(spark, cfg)
        got = sink.read(S.SIGNAL_TRACES)
        assert got.count() == 1
        assert got.first().service_name == "svc-a"
        t = sink._load(S.SIGNAL_TRACES)
        summary = t.current_snapshot()["summary"]
        assert summary["otel.exporter"] == "opentelemetry-iceberg-exporter-spark"

    def test_ensure_all_tables_over_rest(self, catalog, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark import schemas as S
        from opentelemetry_iceberg_exporter_spark.config import (
            CatalogConfig,
            ExporterConfig,
            StorageConfig,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import RestIcebergSink

        client, state, warehouse = catalog
        cfg = ExporterConfig(
            storage=StorageConfig(provider="filesystem", bucket=str(tmp_path)),
            catalog=CatalogConfig(catalog_type="rest", uri=client.uri, warehouse=warehouse),
        )
        sink = RestIcebergSink(spark, cfg)
        tables = sink.ensure_all_tables()
        assert len(tables) == len(S.ALL_SIGNALS)
        for table in tables:
            md = state.tables[("otel", table)]
            assert md["format-version"] == 2
            assert md["partition-specs"][0]["fields"][0]["transform"] == "hours"
            # the reserved format-version property is CONSUMED at create
            # (the server honors it, real-catalog semantics) — the
            # metadata field above is the authoritative place
            assert "format-version" not in md["properties"]
        # second ensure is cache-served: no extra table-create POSTs
        n_before = len(state.requests)
        sink.ensure_all_tables()
        posts = [r for r in state.requests[n_before:] if r[0] == "POST"]
        assert posts == []

    def test_recovery_cli_rest_mode(self, catalog, spark, capsys):
        """`otel-spark-recover --rest-uri ...` end to end: scan, diff
        against ListDataFiles, re-register orphans via REST add_files."""
        import json as json_mod

        from opentelemetry_iceberg_exporter_spark.recovery.cli import main
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )

        client, _, warehouse = catalog
        df = _events_df(spark, n=10)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "cli", df.schema, partition_source="ts")
        t.append_dataframe(df)
        md = t.metadata()
        orphans = {f.file_path for f in write_partitioned_batch(df, md["location"], md)}

        rc = main(
            [
                "--root",
                f"{warehouse}/otel",
                "--rest-uri",
                client.uri,
                "--rest-warehouse",
                warehouse,
            ]
        )
        assert rc == 0
        out = json_mod.loads(capsys.readouterr().out)
        assert out["orphaned"] == len(orphans) and out["failed"] == 0
        assert orphans <= set(t.all_files())

    def test_registered_files_shape(self, catalog, spark):
        client, _, _ = catalog
        df = _events_df(spark, n=4)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "one", df.schema, partition_source="ts")
        t.append_dataframe(df)
        out = rest_registered_files(client, "otel", ["one", "missing"])
        assert set(out) == {"one", "missing"}
        assert out["missing"] == [] and len(out["one"]) >= 1


# --------------------------------------------------------------------------
# multi-table transactions (/v1/{prefix}/transactions/commit)
# --------------------------------------------------------------------------


class TestTransactions:
    def _two_tables(self, catalog, spark):
        client, state, _ = catalog
        df = _events_df(spark)
        client.ensure_namespace("otel")
        ta = client.ensure_table("otel", "ta", df.schema, partition_source="ts")
        tb = client.ensure_table("otel", "tb", df.schema, partition_source="ts")
        return client, state, ta, tb, df

    def test_multi_table_append_commits_both(self, catalog, spark):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            commit_append_transaction,
        )

        client, state, ta, tb, df = self._two_tables(catalog, spark)
        fa = write_partitioned_batch(df, ta.location(), ta.metadata())
        fb = write_partitioned_batch(df.limit(10), tb.location(), tb.metadata())
        sids = commit_append_transaction(
            client, [(ta, fa, {"k": "v"}), (tb, fb, None)]
        )
        assert sids[("otel", "ta")] == ta.current_snapshot()["snapshot-id"]
        assert sids[("otel", "tb")] == tb.current_snapshot()["snapshot-id"]
        assert ta.read(spark).count() == 40
        assert tb.read(spark).count() == 10
        assert ta.current_snapshot()["summary"]["k"] == "v"
        # exactly one transactions/commit POST, zero per-table commits
        commits = [
            p for m, p in state.requests if m == "POST" and "transactions" in p
        ]
        table_commits = [
            p
            for m, p in state.requests
            if m == "POST" and p.endswith(("/tables/ta", "/tables/tb"))
        ]
        assert len(commits) == 1 and table_commits == []

    def test_all_or_nothing_on_stale_requirement(self, catalog, spark):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )

        client, state, ta, tb, df = self._two_tables(catalog, spark)
        fa = write_partitioned_batch(df, ta.location(), ta.metadata())
        reqs_a, upds_a, _ = ta._build_append(ta.metadata(), fa, "append", {})
        fb = write_partitioned_batch(df, tb.location(), tb.metadata())
        reqs_b, upds_b, _ = tb._build_append(tb.metadata(), fb, "append", {})
        # make tb's requirement STALE: its main moved after the build
        tb.append_dataframe(_events_df(spark, n=4))
        with pytest.raises(RestCommitConflictError):
            client.commit_transaction(
                [("otel", "ta", reqs_a, upds_a), ("otel", "tb", reqs_b, upds_b)]
            )
        # the VALID ta change must not have been applied either
        assert ta.current_snapshot() is None
        assert tb.read(spark).count() == 4  # only the interloper commit

    def test_conflict_retries_rebuild_and_land(self, catalog, spark):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            commit_append_transaction,
        )

        client, state, ta, tb, df = self._two_tables(catalog, spark)
        state.inject(
            409,
            "CommitFailedException",
            "Requirement failed: branch main has changed",
            method="POST",
            path_re=r"/transactions/commit$",
        )
        fa = write_partitioned_batch(df, ta.location(), ta.metadata())
        fb = write_partitioned_batch(df, tb.location(), tb.metadata())
        sids = commit_append_transaction(client, [(ta, fa, None), (tb, fb, None)])
        assert len(sids) == 2
        assert ta.read(spark).count() == 40 and tb.read(spark).count() == 40

    def test_lost_response_landing_after_landed_check_not_duplicated(
        self, catalog, spark
    ):
        """THE transaction double-append window: attempt 1's response is
        lost, its landed-check reloads run while the server is still
        processing (verdict: absent on every table), and THEN the
        transaction lands. Without the cross-attempt `attempted` guard
        the rebuilt retry would append every table's rows a second
        time; with it, the loop-top reload recognizes attempt 1's
        snapshot ids and returns them instead of re-committing."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            commit_append_transaction,
        )

        client, state, ta, tb, df = self._two_tables(catalog, spark)
        fa = write_partitioned_batch(df, ta.location(), ta.metadata())
        fb = write_partitioned_batch(df.limit(10), tb.location(), tb.metadata())
        state.defer_commit_responses = 1
        sids = commit_append_transaction(client, [(ta, fa, None), (tb, fb, None)])
        # exactly ONE snapshot per table (the late-landing first
        # attempt) and no duplicated rows
        assert len(ta.snapshots()) == 1 and len(tb.snapshots()) == 1
        assert sids[("otel", "ta")] == ta.current_snapshot()["snapshot-id"]
        assert sids[("otel", "tb")] == tb.current_snapshot()["snapshot-id"]
        assert ta.read(spark).count() == 40
        assert tb.read(spark).count() == 10
        # exactly one transactions/commit POST reached the server — the
        # retry never re-sent the transaction
        commits = [
            p for m, p in state.requests if m == "POST" and "transactions" in p
        ]
        assert len(commits) == 1

    def test_mixed_view_during_late_landing_is_not_an_atomicity_violation(
        self, catalog, spark
    ):
        """The landed-check reloads tables SEQUENTIALLY, so an atomic
        transaction applying between two GETs looks partial without
        being so. One re-read of the absent tables must resolve it as
        the idempotent success — not a false 'server violated
        all-or-nothing' CommitStateUnknownError (which would push the
        caller into a rerun that duplicates every table's rows)."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_partitioned_batch,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            commit_append_transaction,
        )

        client, state, ta, tb, df = self._two_tables(catalog, spark)
        fa = write_partitioned_batch(df, ta.location(), ta.metadata())
        fb = write_partitioned_batch(df.limit(10), tb.location(), tb.metadata())
        state.defer_commit_responses = 1
        # +1 extra load: application lands AFTER the retry's loop-top
        # reload of table A but BEFORE table B's — the mixed view
        state.deferred_extra_loads = 1
        sids = commit_append_transaction(client, [(ta, fa, None), (tb, fb, None)])
        assert len(ta.snapshots()) == 1 and len(tb.snapshots()) == 1
        assert sids[("otel", "ta")] == ta.current_snapshot()["snapshot-id"]
        assert ta.read(spark).count() == 40
        assert tb.read(spark).count() == 10
        commits = [
            p for m, p in state.requests if m == "POST" and "transactions" in p
        ]
        assert len(commits) == 1  # never re-sent

    def test_empty_parts_commit_nothing(self, catalog, spark):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            commit_append_transaction,
        )

        client, state, ta, tb, df = self._two_tables(catalog, spark)
        n_before = len(state.requests)
        assert commit_append_transaction(client, [(ta, [], None)]) == {}
        assert len(state.requests) == n_before  # no HTTP at all

    def test_duplicate_table_rejected(self, catalog, spark):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            commit_append_transaction,
        )

        client, _, ta, _, df = self._two_tables(catalog, spark)
        with pytest.raises(ValueError, match="at most once"):
            commit_append_transaction(
                client, [(ta, [object()], None), (ta, [object()], None)]
            )


class TestAtomicExporterBatches:
    def test_metrics_batch_commits_all_tables_in_one_transaction(
        self, catalog, spark, tmp_path
    ):
        """catalog.atomic_batch: one OTLP metrics batch demuxes into
        gauge+sum tables and BOTH commit in a single CommitTransaction
        (a crash can never persist half a batch)."""
        from opentelemetry_iceberg_exporter_spark import schemas as S
        from opentelemetry_iceberg_exporter_spark.config import (
            CatalogConfig,
            ExporterConfig,
            PartitionConfig,
            StorageConfig,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            RestIcebergSink,
        )
        from opentelemetry_iceberg_exporter_spark.streaming import export_batch

        from test_otlp_flatten import GAUGE_DP, _metrics_payload
        from test_sinks_pipeline import _write_jsonl

        client, state, warehouse = catalog
        cfg = ExporterConfig(
            storage=StorageConfig(
                provider="filesystem", bucket=str(tmp_path), prefix="raw"
            ),
            catalog=CatalogConfig(
                catalog_type="rest",
                uri=client.uri,
                warehouse=warehouse,
                atomic_batch=True,
            ),
            partition=PartitionConfig(granularity="hourly"),
        )
        payload = _metrics_payload(
            [
                {"name": "g", "gauge": {"dataPoints": [GAUGE_DP]}},
                {
                    "name": "s",
                    "sum": {
                        "dataPoints": [GAUGE_DP],
                        "aggregationTemporality": 2,
                        "isMonotonic": True,
                    },
                },
            ]
        )
        inp = tmp_path / "in" / "metrics.jsonl"
        _write_jsonl(str(inp), [payload])
        export_batch(spark, str(inp.parent), "metrics", cfg)

        sink = RestIcebergSink(spark, cfg)
        assert sink.read(S.SIGNAL_METRICS_GAUGE).count() == 1
        assert sink.read(S.SIGNAL_METRICS_SUM).count() == 1
        commits = [
            p for m, p in state.requests if m == "POST" and "transactions" in p
        ]
        assert len(commits) == 1

    def test_atomic_batch_config_validation(self):
        from opentelemetry_iceberg_exporter_spark.config import CatalogConfig

        with pytest.raises(ValueError, match="rest"):
            CatalogConfig(
                catalog_type="fs", warehouse="/w", atomic_batch=True
            ).validate()
        with pytest.raises(ValueError, match="wap_branch"):
            CatalogConfig(
                catalog_type="rest",
                uri="http://x",
                atomic_batch=True,
                wap_branch="audit",
            ).validate()

    def test_streaming_atomic_batch_commits_via_transaction(
        self, catalog, spark, tmp_path
    ):
        """catalog.atomic_batch in STREAMING mode: the foreachBatch body
        routes each micro-batch's signals through one
        CommitTransaction instead of per-table CommitTable posts."""
        from opentelemetry_iceberg_exporter_spark import schemas as S
        from opentelemetry_iceberg_exporter_spark.config import (
            CatalogConfig,
            ExporterConfig,
            PartitionConfig,
            StorageConfig,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            RestIcebergSink,
        )
        from opentelemetry_iceberg_exporter_spark.streaming import start_export_stream

        from test_otlp_flatten import _span, _traces_payload
        from test_sinks_pipeline import _write_jsonl

        client, state, warehouse = catalog
        cfg = ExporterConfig(
            storage=StorageConfig(provider="filesystem", bucket=str(tmp_path), prefix="raw"),
            catalog=CatalogConfig(
                catalog_type="rest",
                uri=client.uri,
                warehouse=warehouse,
                atomic_batch=True,
            ),
            partition=PartitionConfig(granularity="hourly"),
        )
        src_dir = tmp_path / "stream-in"
        ckpt = str(tmp_path / "ckpt")
        _write_jsonl(str(src_dir / "b1.jsonl"), [_traces_payload([_span()])])

        q = start_export_stream(spark, str(src_dir), "traces", cfg, ckpt, trigger_once=True)
        q.awaitTermination(120)

        sink = RestIcebergSink(spark, cfg)
        t = sink._load(S.SIGNAL_TRACES)
        assert t.read(spark).count() == 1
        commits = [
            p for m, p in state.requests if m == "POST" and "transactions" in p
        ]
        assert len(commits) == 1


class TestRestCli:
    """Every table-bound CLI subcommand accepts --rest-uri and runs
    against the REST transport (same handle surface as FsTable)."""

    def test_inspect_maintain_rollback_over_rest(self, catalog, spark, capsys):
        import json as json_mod

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        client, _, warehouse = catalog
        df = _events_df(spark)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "clit", df.schema, partition_source="ts")
        t.append_dataframe(df)
        t.append_dataframe(df)

        rc = main(
            ["inspect", "--rest-uri", client.uri, "--table", "clit", "--what", "snapshots"]
        )
        assert rc == 0
        rows = [json_mod.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
        assert len(rows) == 2 and all(r["operation"] == "append" for r in rows)

        rc = main(
            [
                "maintain",
                "--rest-uri",
                client.uri,
                "--table",
                "clit",
                "--target-bytes",
                str(1 << 20),
                "--expire-keep",
                "1",
                "--remove-orphans-older-than",
                "3600",
            ]
        )
        assert rc == 0
        out = json_mod.loads(capsys.readouterr().out)
        assert out["rewrite_snapshot"] is not None
        assert out["expired_data_files"] > 0
        assert t.read(spark).count() == 80

    def test_delete_where_over_rest_cli(self, catalog, spark, capsys):
        import json as json_mod

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        client, _, _ = catalog
        df = _events_df(spark)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "cldel", df.schema, partition_source="ts")
        t.append_dataframe(df)
        rc = main(
            [
                "delete",
                "--rest-uri",
                client.uri,
                "--table",
                "cldel",
                "--where",
                "id < 10",
            ]
        )
        assert rc == 0
        out = json_mod.loads(capsys.readouterr().out)
        assert out["deleted_rows"] == 10
        assert t.read(spark).count() == 30

    def test_missing_warehouse_without_rest_uri_errors(self):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        with pytest.raises(SystemExit, match="--warehouse"):
            main(["inspect", "--table", "x"])
