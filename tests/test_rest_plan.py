"""REST catalog server-side scan planning (the spec's PlanTableScan
operation family): wire-codec unit tests for sinks/rest_scan.py, and
stub-server roundtrips where the SERVER half (tests/rest_stub.py) is an
independent implementation — its own expression parser and ContentFile
serializer — so these tests exercise the wire format, not a shared
codec. Covers sync/async/paged planning, delete-file applicability
(position deletes, deletion vectors, equality-delete grouping),
capability detection + fallback, refusals, and composition with the
client-side footer pruning pass."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
    RestCatalogClient,
    RestError,
)
from opentelemetry_iceberg_exporter_spark.sinks.rest_scan import (
    group_scan_tasks,
    parse_content_file,
    parse_scan_tasks,
    scan_filter_json,
)

from rest_stub import make_server

EVENTS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("ts", TimestampType(), True),
        StructField("name", StringType(), True),
    ]
)


@pytest.fixture()
def catalog(tmp_path):
    warehouse = str(tmp_path / "warehouse")
    os.makedirs(warehouse)
    server, state, uri = make_server(warehouse)
    client = RestCatalogClient(uri, warehouse=warehouse)
    yield client, state
    server.shutdown()


def _events_df(spark, n=40, hours=4, base=0):
    return (
        spark.range(base, base + n)
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


def _events_table(client, spark, name="evt", appends=2, **kwargs):
    client.ensure_namespace("p")
    t = client.ensure_table("p", name, EVENTS, partition_source="ts", **kwargs)
    for i in range(appends):
        t.append_dataframe(_events_df(spark, base=i * 100))
    return t


def _rows(df):
    return sorted(map(tuple, df.select("id", "name").collect()))


# a minimal metadata dict for codec-only tests (no server, no spark)
_MD = {
    "current-schema-id": 0,
    "schemas": [
        {
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "ts", "type": "timestamp"},
                {"id": 2, "name": "id", "type": "long"},
            ],
        }
    ],
    "default-spec-id": 0,
    "partition-specs": [
        {
            "spec-id": 0,
            "fields": [
                {
                    "name": "ts_hour",
                    "transform": "hours",
                    "source-id": 1,
                    "field-id": 1000,
                }
            ],
        }
    ],
}


class TestWireCodec:
    def test_filter_json_shapes(self):
        expr = scan_filter_json(
            _MD,
            column_range=("id", 5, 9),
            source_predicate=("ts", datetime(2024, 3, 1, 2)),
        )
        # conjuncts AND-fold left-to-right; temporal literals are ISO
        assert expr == {
            "type": "and",
            "left": {
                "type": "and",
                "left": {"type": "gt-eq", "term": "id", "value": 5},
                "right": {"type": "lt-eq", "term": "id", "value": 9},
            },
            "right": {"type": "eq", "term": "ts", "value": "2024-03-01T02:00:00"},
        }

    def test_filter_json_partition_range_is_transform_term(self):
        expr = scan_filter_json(_MD, partition_range=(474792, 474795))
        term = {"type": "transform", "transform": "hours", "term": "ts"}
        assert expr == {
            "type": "and",
            "left": {"type": "gt-eq", "term": term, "value": 474792},
            "right": {"type": "lt-eq", "term": term, "value": 474795},
        }

    def test_filter_json_dedupes_aliased_ranges(self):
        # extract_prune_ranges emits the same (col, lo, hi) under both
        # column_range and source_range; the wire filter carries it once
        expr = scan_filter_json(
            _MD, column_range=[("ts", 1, 2)], source_range=[("ts", 1, 2)]
        )
        assert expr == {
            "type": "and",
            "left": {"type": "gt-eq", "term": "ts", "value": 1},
            "right": {"type": "lt-eq", "term": "ts", "value": 2},
        }

    def test_filter_json_empty(self):
        assert scan_filter_json(_MD) is None

    def test_parse_content_file(self):
        j = {
            "content": "data",
            "file-path": "s3://b/t/data/f1.parquet",
            "file-format": "parquet",
            "spec-id": 0,
            "partition": [474792],
            "file-size-in-bytes": 1234,
            "record-count": 10,
            "first-row-id": 40,
        }
        f = parse_content_file(j, _MD)
        assert f.content == 0
        assert f.partition == {"ts_hour": 474792}
        assert f.first_row_id == 40 and f.record_count == 10
        with pytest.raises(ValueError, match="unknown content"):
            parse_content_file({**j, "content": "bogus"}, _MD)

    def test_dv_without_reference_pins_to_its_task(self):
        result = {
            "delete-files": [
                {
                    "content": "position-deletes",
                    "file-path": "s3://b/t/data/dv.puffin",
                    "file-format": "puffin",
                    "spec-id": 0,
                    "partition": [None],
                    "file-size-in-bytes": 64,
                    "record-count": 2,
                    "content-offset": 4,
                    "content-size-in-bytes": 30,
                    # no referenced-data-file: the task reference IS the
                    # applicability contract
                }
            ],
            "file-scan-tasks": [
                {
                    "data-file": {
                        "content": "data",
                        "file-path": "s3://b/t/data/f1.parquet",
                        "file-format": "parquet",
                        "spec-id": 0,
                        "partition": [1],
                        "file-size-in-bytes": 10,
                        "record-count": 5,
                    },
                    "delete-file-references": [0],
                }
            ],
        }
        tasks, pending = parse_scan_tasks(result, _MD)
        assert pending == []
        (df, refs), = tasks
        assert refs[0].referenced_data_file == df.file_path
        assert refs[0].is_deletion_vector

    def test_group_scan_tasks_by_equality_set(self):
        base = {
            "content": "data",
            "file-format": "parquet",
            "spec-id": 0,
            "partition": [],
            "file-size-in-bytes": 1,
            "record-count": 1,
        }
        eq = {
            "content": "equality-deletes",
            "file-path": "eq1.parquet",
            "file-format": "parquet",
            "spec-id": 0,
            "partition": [],
            "file-size-in-bytes": 1,
            "record-count": 1,
            "equality-ids": [2],
        }
        result = {
            "delete-files": [eq],
            "file-scan-tasks": [
                {"data-file": {**base, "file-path": "old.parquet"},
                 "delete-file-references": [0]},
                {"data-file": {**base, "file-path": "new.parquet"}},
            ],
        }
        md = {**_MD, "partition-specs": [{"spec-id": 0, "fields": []}]}
        tasks, _ = parse_scan_tasks(result, md)
        groups = group_scan_tasks(tasks)
        assert len(groups) == 2
        by_key = {
            tuple(sorted(f.file_path for f in data)): dels for data, dels in groups
        }
        # the referenced group got synthesized seqs that APPLY the delete
        dels = by_key[("old.parquet",)]
        assert len(dels) == 1 and dels[0].content == 2
        assert dels[0].sequence_number == 2  # > data seq 1: applies
        assert by_key[("new.parquet",)] == []


class TestServerPlanning:
    def test_read_parity_and_route(self, catalog, spark):
        client, state = catalog
        t = _events_table(client, spark)
        local = _rows(t.read(spark, server_planning=False))
        remote = _rows(t.read(spark, server_planning=True))
        assert remote == local and len(local) == 80
        assert any("/plan" in p for m, p in state.requests if m == "POST")

    def test_scoped_read_prunes_server_side(self, catalog, spark):
        client, state = catalog
        t = _events_table(client, spark)
        md = t.metadata()
        lo, hi = datetime(2024, 3, 1, 0), datetime(2024, 3, 1, 1, 30)
        # the plan itself shrinks: 2 of 4 hourly partitions survive
        tasks = t.plan_files_server(
            filter_json=scan_filter_json(md, source_range=("ts", lo, hi))
        )
        all_tasks = t.plan_files_server()
        assert 0 < len(tasks) < len(all_tasks)
        scoped = t.read(
            spark, source_range=("ts", lo, hi), server_planning=True
        ).filter(F.col("ts").between(lo, hi))
        local = t.read(
            spark, source_range=("ts", lo, hi), server_planning=False
        ).filter(F.col("ts").between(lo, hi))
        assert _rows(scoped) == _rows(local)

    def test_server_planned_read_loads_metadata_once(
        self, catalog, spark, monkeypatch
    ):
        """read() threads its already-loaded metadata through
        _read_server_planned and plan_files_server — ONE metadata GET
        per read, and the plan is pinned to the SAME snapshot the
        filter/schema came from (no TOCTOU against a racing commit)."""
        client, _ = catalog
        t = _events_table(client, spark)
        calls = {"n": 0}
        real = type(t).metadata

        def counting(self_):
            calls["n"] += 1
            return real(self_)

        monkeypatch.setattr(type(t), "metadata", counting)
        assert len(_rows(t.read(spark, server_planning=True))) == 80
        assert calls["n"] == 1

    def test_where_predicate_parity(self, catalog, spark):
        client, _ = catalog
        t = _events_table(client, spark)
        where = "ts >= TIMESTAMP '2024-03-01 02:00:00' AND id < 110"
        assert _rows(t.read(spark, where=where, server_planning=True)) == _rows(
            t.read(spark, where=where, server_planning=False)
        )

    def test_where_and_tuple_params_refused(self, catalog, spark):
        client, _ = catalog
        t = _events_table(client, spark, appends=1)
        with pytest.raises(ValueError, match="either `where`"):
            t.read(spark, where="id > 1", column_range=("id", 1, 2))

    def test_deletion_vectors_roundtrip(self, catalog, spark):
        client, state = catalog
        t = _events_table(
            client, spark, name="dv", properties={"format-version": "3"}
        )
        t.delete_where(spark, "id % 10 = 3", mode="deletion-vectors")
        state.omit_dv_reference = True  # spec-minimal server: task refs only
        remote = _rows(t.read(spark, server_planning=True))
        local = _rows(t.read(spark, server_planning=False))
        assert remote == local
        assert not any(i % 10 == 3 for i, _ in remote)

    def test_equality_delete_grouping(self, catalog, spark):
        client, _ = catalog
        t = _events_table(client, spark, name="eqd", appends=1)
        # upsert rewrites ids 0-9 via an equality delete, then a LATER
        # append adds files the delete must NOT apply to
        t.upsert_equality(
            spark,
            _events_df(spark, n=10).withColumn("name", F.lit("updated")),
            ["id"],
        )
        t.append_dataframe(_events_df(spark, base=500, n=10))
        tasks = t.plan_files_server()
        groups = group_scan_tasks(tasks)
        assert len(groups) == 2  # pre-delete files vs post-delete files
        remote = _rows(t.read(spark, server_planning=True))
        local = _rows(t.read(spark, server_planning=False))
        assert remote == local
        assert sum(1 for _, name in remote if name == "updated") == 10

    def test_async_polling(self, catalog, spark):
        client, state = catalog
        t = _events_table(client, spark, appends=1)
        state.plan_mode = "async"
        state.async_polls_required = 3
        remote = _rows(
            t.read(spark, server_planning=True)
        )  # read() uses default poll_interval; plan completes on 3rd GET
        assert remote == _rows(t.read(spark, server_planning=False))
        polls = [p for m, p in state.requests if m == "GET" and "/plan/" in p]
        assert len(polls) >= 2

    def test_async_deadline_cancels_server_side(self, catalog, spark):
        client, state = catalog
        t = _events_table(client, spark, appends=1)
        state.plan_mode = "async"
        state.async_polls_required = 10**6
        with pytest.raises(RestError, match="PlanningTimeout"):
            t.plan_files_server(poll_interval=0.01, deadline=0.1)
        assert any(
            m == "DELETE" and "/plan/" in p for m, p in state.requests
        )
        assert all(p["cancelled"] for p in state.plans.values())

    def test_mid_poll_404_does_not_disable_planning(self, catalog, spark):
        """Only the initial submit can prove the route unimplemented: a
        404 for an expired plan-id mid-poll must SURFACE (and leave
        server planning enabled), not silently flip the client to local
        planning forever."""
        client, state = catalog
        t = _events_table(client, spark, appends=1)
        state.plan_mode = "async"
        state.async_polls_required = 5
        state.inject(
            404, "NoSuchPlanIdException", "plan expired", times=1,
            method="GET", path_re="/plan/",
        )
        with pytest.raises(RestError, match="plan expired"):
            t.read(spark)  # auto mode: the poll error surfaces
        assert not client._plan_unsupported
        state.plan_mode = "sync"
        assert len(_rows(t.read(spark))) == 40  # planning still server-side
        assert any(
            m == "POST" and p.endswith("/plan") for m, p in state.requests[-5:]
        )

    def test_deadline_error_survives_cancel_failure(self, catalog, spark):
        """A failing DELETE must not mask the timeout: the caller gets
        PlanningTimeout, not the cancel route's error."""
        client, state = catalog
        t = _events_table(client, spark, appends=1)
        state.plan_mode = "async"
        state.async_polls_required = 10**6
        state.inject(
            500, "ServiceUnavailableException", "cancel route down",
            times=1, method="DELETE", path_re="/plan/",
        )
        with pytest.raises(RestError, match="PlanningTimeout"):
            t.plan_files_server(poll_interval=0.01, deadline=0.1)

    def test_paged_plan_tasks(self, catalog, spark):
        client, state = catalog
        t = _events_table(client, spark)  # 8 files
        state.plan_page_size = 3
        tasks = t.plan_files_server()
        assert len(tasks) == len(t.plan_files()[0])
        fetches = [p for m, p in state.requests if m == "POST" and p.endswith("/tasks")]
        assert len(fetches) >= 2  # 8 files / 3 per page -> 2 extra pages
        assert _rows(t.read(spark, server_planning=True)) == _rows(
            t.read(spark, server_planning=False)
        )

    def test_failed_plan_raises(self, catalog, spark):
        client, state = catalog
        t = _events_table(client, spark, appends=1)
        state.plan_fail_next = True
        with pytest.raises(RestError, match="injected planning failure"):
            t.read(spark, server_planning=True).collect()

    def test_not_advertised_plans_locally(self, catalog, spark):
        client, state = catalog
        state.advertise_plan = False
        # re-handshake so the client sees the shrunken endpoint list
        client2 = RestCatalogClient(client.uri, warehouse=client.warehouse)
        assert not client2.supports_scan_planning()
        t = _events_table(client2, spark, name="noplan", appends=1)
        before = len([1 for m, p in state.requests if "/plan" in p])
        assert len(_rows(t.read(spark))) == 40  # auto mode: local path
        assert len([1 for m, p in state.requests if "/plan" in p]) == before
        with pytest.raises(RestError):
            t.read(spark, server_planning=True)  # explicit: surface the 404

    def test_legacy_server_without_endpoints_field(self, catalog, spark):
        client, state = catalog
        state.advertise_endpoints = False
        client2 = RestCatalogClient(client.uri, warehouse=client.warehouse)
        assert client2.endpoints is None
        assert not client2.supports_scan_planning()

    def test_not_implemented_answer_falls_back_and_remembers(self, catalog, spark):
        client, state = catalog
        t = _events_table(client, spark, appends=1)
        state.inject(
            404, "NotFoundException", "plan route removed", times=1,
            method="POST", path_re="/plan$",
        )
        assert len(_rows(t.read(spark))) == 40  # auto: falls back locally
        assert client._plan_unsupported
        n_plans = len([1 for m, p in state.requests if m == "POST" and p.endswith("/plan")])
        assert len(_rows(t.read(spark))) == 40
        # the probe is remembered: no further plan POSTs
        assert (
            len([1 for m, p in state.requests if m == "POST" and p.endswith("/plan")])
            == n_plans
        )

    def test_lineage_read_refuses_server_planning(self, catalog, spark):
        client, state = catalog
        t = _events_table(
            client, spark, name="v3", appends=1, properties={"format-version": "3"}
        )
        with pytest.raises(ValueError, match="sequence number"):
            t.read(spark, with_lineage=True, server_planning=True)
        # auto mode silently plans locally and still works
        df = t.read(spark, with_lineage=True)
        assert df.select("_row_id").distinct().count() == 40
        assert not any(
            m == "POST" and p.endswith("/plan") for m, p in state.requests
        )

    def test_where_excluding_everything(self, catalog, spark):
        client, _ = catalog
        t = _events_table(client, spark, appends=1)
        df = t.read(spark, where="id > 10000", server_planning=True)
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["id", "ts", "name"]
