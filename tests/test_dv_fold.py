"""Fold-on-write for Iceberg v3 deletion vectors: the spec's
one-DV-per-file WRITER invariant.

A spec-conforming external v3 reader (Trino, Spark-with-jars) treats a
data file's deletion vector as its COMPLETE delete set — not one layer
of a stack to be unioned. So when a second DV delete touches a file
that already has a live vector, the writer must union the prior bitmap
into the new one and supersede the old manifest entry IN THE SAME
COMMIT (plan_deletion_vectors + _supersede_carried_entries). These
tests pin:

* exactly one live DV per data file after overlapping DV deletes, on
  both catalog transports;
* the external-reader contract — each file's single live vector holds
  the FULL deleted-position set;
* DELETED removal markers + summary accounting (running totals track
  the live set);
* changelog exactness over a fold window (only NEW deletes surface);
* the concurrency guard — a vector that lands for the same data file
  between planning and commit forces a re-plan instead of silently
  stacking or dropping rows.

Reference precedent: the reference engine delegates all Iceberg
metadata to iceberg-go and never writes DVs; the invariant here is the
Iceberg v3 table spec ("Deletion vectors ... at most one deletion
vector per data file").
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import read_ocf
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    STATUS_DELETED,
    FsCatalog,
    ReplaceConflictError,
)
from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
    read_deletion_vector_span,
)


def _df(spark, n=40, tag="a"):
    return spark.range(n).select(
        F.col("id"),
        F.to_timestamp(
            F.lit("2024-03-01 00:00:00").cast("timestamp")
            + F.make_interval(hours=(F.col("id") % 4).cast("int"))
        ).alias("ts"),
        F.lit(tag).alias("tag"),
    )


@pytest.fixture()
def fs_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "events", _df(spark).schema, partition_source="ts")
    t.append_dataframe(_df(spark))
    return t


def _live_and_removed_dv_entries(snapshot):
    """(live DV entries, DELETED-marker DV entries) across a snapshot's
    delete manifests — the view an external manifest reader gets."""
    live, removed = [], []
    _, _, manifests = read_ocf(snapshot["manifest-list"])
    for m in manifests:
        if m["content"] != 1:
            continue
        _, _, entries = read_ocf(m["manifest_path"])
        for e in entries:
            d = e["data_file"]
            if d.get("referenced_data_file") is None:
                continue
            (removed if e["status"] == STATUS_DELETED else live).append(e)
    return live, removed


class TestOneDvPerFileInvariant:
    def test_overlapping_deletes_leave_one_live_dv_per_file(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id >= 35", mode="deletion-vectors")
        t.delete_where(spark, "id < 5", mode="deletion-vectors")
        live, removed = _live_and_removed_dv_entries(t.current_snapshot())
        by_file: dict[str, int] = {}
        for e in live:
            rdf = e["data_file"]["referenced_data_file"]
            by_file[rdf] = by_file.get(rdf, 0) + 1
        assert by_file and all(v == 1 for v in by_file.values())
        # the superseded first-round vectors are marked DELETED in the
        # same snapshot (removal markers), not silently dropped
        assert removed
        got = t.read(spark)
        assert got.count() == 30
        assert {r["id"] for r in got.select("id").collect()} == set(range(5, 35))

    def test_external_reader_contract_full_delete_set_per_vector(
        self, spark, fs_table
    ):
        """Simulate a spec-conforming reader: for each data file take
        ONLY its single live vector as the complete delete set."""
        t = fs_table
        t.delete_where(spark, "id >= 35", mode="deletion-vectors")
        t.delete_where(spark, "id < 5", mode="deletion-vectors")
        live, _ = _live_and_removed_dv_entries(t.current_snapshot())
        surviving: set[int] = set()
        for e in live:
            d = e["data_file"]
            positions = set(
                read_deletion_vector_span(
                    d["file_path"], d["content_offset"], d["content_size_in_bytes"]
                ).tolist()
            )
            assert len(positions) == d["record_count"]  # card matches entry
            pdf = (
                spark.read.parquet(d["referenced_data_file"])
                .select("id")
                .toPandas()
            )
            surviving |= {
                int(v) for i, v in enumerate(pdf["id"]) if i not in positions
            }
        assert surviving == set(range(5, 35))

    def test_summary_totals_track_live_set(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id >= 35", mode="deletion-vectors")
        t.delete_where(spark, "id < 5", mode="deletion-vectors")
        s = t.current_snapshot()["summary"]
        live, removed = _live_and_removed_dv_entries(t.current_snapshot())
        assert int(s["total-position-deletes"]) == 10
        assert int(s["total-delete-files"]) == len(live)
        assert int(s["removed-delete-files"]) == len(removed)
        # folding leaves count_rows on the read path (deletes pending),
        # and the read agrees with the totals
        assert t.read(spark).count() == int(s["total-records"]) - 10

    def test_threeway_fold_keeps_union_exact(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id in (0, 4, 8)", mode="deletion-vectors")
        t.delete_where(spark, "id in (12, 16)", mode="deletion-vectors")
        t.delete_where(spark, "id in (20, 24, 28)", mode="deletion-vectors")
        live, _ = _live_and_removed_dv_entries(t.current_snapshot())
        # ids are all ≡ 0 (mod 4): every delete hits the SAME hour file
        assert len(live) == 1
        assert live[0]["data_file"]["record_count"] == 8
        got = t.read(spark)
        assert got.count() == 32
        assert got.filter("id in (0,4,8,12,16,20,24,28)").count() == 0

    def test_update_where_dv_fold(self, spark, fs_table):
        t = fs_table
        t.update_where(spark, "id < 4", {"tag": "'u1'"}, mode="deletion-vectors")
        t.update_where(spark, "id < 2", {"tag": "'u2'"}, mode="deletion-vectors")
        live, _ = _live_and_removed_dv_entries(t.current_snapshot())
        by_file: dict[str, int] = {}
        for e in live:
            rdf = e["data_file"]["referenced_data_file"]
            by_file[rdf] = by_file.get(rdf, 0) + 1
        assert all(v == 1 for v in by_file.values())
        got = t.read(spark)
        assert got.count() == 40
        assert got.filter("tag = 'u2'").count() == 2
        assert got.filter("tag = 'u1'").count() == 2  # ids 2,3 keep u1

    def test_changelog_window_sees_only_new_deletes(self, spark, fs_table):
        t = fs_table
        sid1, _ = t.delete_where(spark, "id >= 35", mode="deletion-vectors")
        t.delete_where(spark, "id < 5", mode="deletion-vectors")
        # the second snapshot's folded vectors CONTAIN the first round's
        # positions; the changelog must still report only ids 0..4
        chg = t.changelog_scan(spark, from_snapshot_id=sid1).collect()
        assert {r["_change_type"] for r in chg} == {"delete"}
        assert sorted(r["id"] for r in chg) == [0, 1, 2, 3, 4]

    def test_time_travel_sees_pre_fold_stack(self, spark, fs_table):
        t = fs_table
        sid1, _ = t.delete_where(spark, "id >= 35", mode="deletion-vectors")
        t.delete_where(spark, "id < 5", mode="deletion-vectors")
        assert t.read(spark, snapshot_id=sid1).count() == 35
        assert t.read(spark).count() == 30

    def test_fold_then_rewrite_restores_vector_free_state(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id >= 35", mode="deletion-vectors")
        t.delete_where(spark, "id < 5", mode="deletion-vectors")
        t.rewrite_position_deletes(spark)
        assert t.plan_scan()[1] == []
        assert t.count_rows() == 30


class TestLegacyStackedVectors:
    def test_next_delete_folds_a_preexisting_stack(self, spark, fs_table):
        """Tables written BEFORE fold-on-write (or by engines that
        stack) can hold several live vectors per file; the next DV
        delete must union ALL of them into the single new vector and
        supersede every stacked entry."""
        import numpy as np

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            DataFile,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
            write_deletion_vector_file,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.roaring import (
            serialize_64,
        )

        t = fs_table
        target = t.plan_scan()[0][0].file_path  # one hour file (ids ≡ h mod 4)
        # hand-commit TWO stacked vectors for the same file in ONE
        # commit (what a legacy pre-fold writer left behind; stacking
        # ACROSS commits is now refused by the commit-time validation —
        # this is the only way to manufacture the state)
        legacy: list[DataFile] = []
        for positions in ([0], [1]):
            vec = serialize_64(np.array(positions, dtype=np.uint64))
            path, spans = write_deletion_vector_file(
                t.location, {target: (vec, len(positions))},
                sequence_number=t.metadata()["last-sequence-number"] + 1,
            )
            off, length, card = spans[target]
            legacy.append(
                DataFile(
                    path,
                    os.path.getsize(path),
                    card,
                    {},
                    content=1,
                    referenced_data_file=target,
                    content_offset=off,
                    content_size_in_bytes=length,
                )
            )
        t._commit_with_retry(
            legacy,
            operation="delete",
            carry_forward=True,
            extra_summary={"deleted-records": "2", "added-dvs": "2"},
        )
        stacked = [
            f
            for f in t.plan_scan()[1]
            if f.is_deletion_vector and f.referenced_data_file == target
        ]
        assert len(stacked) == 2  # the legacy stack is in place
        assert t.read(spark).count() == 38
        # positions 0 and 1 of the file are legacy-deleted; delete the
        # row at FILE position 2 (single-file read preserves row order)
        ids_in_order = [
            r["id"] for r in spark.read.parquet(target).select("id").collect()
        ]
        sid, n = t.delete_where(
            spark, f"id = {ids_in_order[2]}", mode="deletion-vectors"
        )
        assert n == 1
        live, removed = _live_and_removed_dv_entries(t.current_snapshot())
        for_target = [
            e
            for e in live
            if e["data_file"]["referenced_data_file"] == target
        ]
        assert len(for_target) == 1  # the whole stack folded to ONE
        assert for_target[0]["data_file"]["record_count"] == 3
        assert len(removed) == 2  # both legacy entries superseded
        assert t.read(spark).count() == 37


class TestStackingRefused:
    def test_cross_commit_stacking_raises(self, spark, fs_table):
        """A writer that tries to ADD a vector for an already-vectored
        file without superseding the live one (a pre-fold engine, or a
        buggy caller) is refused at commit time — the invariant is
        enforced on every DV-adding commit, not just the fold path."""
        import numpy as np

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            DataFile,
            ReplaceConflictError,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
            write_deletion_vector_file,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.roaring import (
            serialize_64,
        )

        t = fs_table
        t.delete_where(spark, "id = 0", mode="deletion-vectors")
        target = next(
            f.referenced_data_file
            for f in t.plan_scan()[1]
            if f.is_deletion_vector
        )
        vec = serialize_64(np.array([3], dtype=np.uint64))
        path, spans = write_deletion_vector_file(
            t.location, {target: (vec, 1)},
            sequence_number=t.metadata()["last-sequence-number"] + 1,
        )
        off, length, card = spans[target]
        with pytest.raises(ReplaceConflictError, match="deletion vector"):
            t._commit_with_retry(
                [
                    DataFile(
                        path,
                        os.path.getsize(path),
                        card,
                        {},
                        content=1,
                        referenced_data_file=target,
                        content_offset=off,
                        content_size_in_bytes=length,
                    )
                ],
                operation="delete",
                carry_forward=True,
                extra_summary={"deleted-records": "1", "added-dvs": "1"},
            )
        assert t.read(spark).count() == 39  # table unchanged


class TestDvFoldConcurrency:
    def test_concurrent_vector_for_same_file_forces_replan(
        self, spark, tmp_path
    ):
        """A DV that lands for the same data file between planning and
        commit makes the planned vector stale (it would either stack a
        second live DV or, if folding had already run, drop the
        concurrent delete) — the commit must fail with a re-plan
        signal, never corrupt."""
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "events", _df(spark).schema, partition_source="ts"
        )
        t.append_dataframe(_df(spark))
        t2 = cat.load_table("otel", "events")

        real_plan = mod.plan_deletion_vectors
        fired = {"done": False}

        def racing_plan(*args, **kwargs):
            planned = real_plan(*args, **kwargs)
            if not fired["done"]:
                fired["done"] = True
                # lands a vector for the same hour files AFTER planning
                t2.delete_where(spark, "id in (1, 2)", mode="deletion-vectors")
            return planned

        mod.plan_deletion_vectors = racing_plan
        try:
            with pytest.raises(ReplaceConflictError):
                t.delete_where(spark, "id in (5, 6)", mode="deletion-vectors")
        finally:
            mod.plan_deletion_vectors = real_plan
        # the racer's delete is intact; re-planning now succeeds
        assert t.read(spark).count() == 38
        sid, n = t.delete_where(spark, "id in (5, 6)", mode="deletion-vectors")
        assert n == 2 and sid is not None
        assert t.read(spark).count() == 36
        live, _ = _live_and_removed_dv_entries(t.current_snapshot())
        by_file: dict[str, int] = {}
        for e in live:
            rdf = e["data_file"]["referenced_data_file"]
            by_file[rdf] = by_file.get(rdf, 0) + 1
        assert all(v == 1 for v in by_file.values())

    def test_concurrent_rewrite_replacing_target_file_forces_replan(
        self, spark, tmp_path
    ):
        """validateDataFilesExist: a compaction (or partition overwrite)
        that replaces a data file between a DV delete's planning and
        commit must force a re-plan — committing the vector anyway would
        reference a dead path and every 'deleted' row would stay
        readable in the rewritten file."""
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "events", _df(spark).schema, partition_source="ts"
        )
        # two small appends so the rewrite has something to compact
        t.append_dataframe(_df(spark).filter("id < 20"))
        t.append_dataframe(_df(spark).filter("id >= 20"))
        t2 = cat.load_table("otel", "events")

        real_plan = mod.plan_deletion_vectors
        fired = {"done": False}

        def racing_plan(*args, **kwargs):
            planned = real_plan(*args, **kwargs)
            if not fired["done"]:
                fired["done"] = True
                # compaction replaces every data file AFTER planning
                assert t2.rewrite_data_files(spark, min_files=2) is not None
            return planned

        mod.plan_deletion_vectors = racing_plan
        try:
            with pytest.raises(ReplaceConflictError, match="no longer live"):
                t.delete_where(spark, "id in (3, 4)", mode="deletion-vectors")
        finally:
            mod.plan_deletion_vectors = real_plan
        # nothing was deleted and nothing dangles; re-planning succeeds
        assert t.read(spark).count() == 40
        sid, n = t.delete_where(spark, "id in (3, 4)", mode="deletion-vectors")
        assert n == 2 and sid is not None
        assert t.read(spark).count() == 38

    def test_concurrent_append_still_merges_cleanly(self, spark, tmp_path):
        """Appends don't touch vectors: a DV delete racing an append
        retries and lands without re-planning (MoR's append-like
        concurrency contract is preserved by the validation)."""
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "events", _df(spark).schema, partition_source="ts"
        )
        t.append_dataframe(_df(spark))
        t2 = cat.load_table("otel", "events")

        real_plan = mod.plan_deletion_vectors
        fired = {"done": False}

        def racing_plan(*args, **kwargs):
            planned = real_plan(*args, **kwargs)
            if not fired["done"]:
                fired["done"] = True
                t2.append_dataframe(_df(spark, n=45, tag="b").filter("id >= 40"))
            return planned

        mod.plan_deletion_vectors = racing_plan
        try:
            sid, n = t.delete_where(spark, "id < 3", mode="deletion-vectors")
        finally:
            mod.plan_deletion_vectors = real_plan
        assert n == 3 and sid is not None
        assert t.read(spark).count() == 42  # 40 - 3 + 5


class TestDvFoldOverRest:
    def test_rest_fold_parity(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )
        from rest_stub import make_server

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table(
                "otel", "ev", _df(spark).schema, partition_source="ts"
            )
            t.append_dataframe(_df(spark))
            t.delete_where(spark, "id >= 35", mode="deletion-vectors")
            t.delete_where(spark, "id < 5", mode="deletion-vectors")
            live, removed = _live_and_removed_dv_entries(t.current_snapshot())
            by_file: dict[str, int] = {}
            for e in live:
                rdf = e["data_file"]["referenced_data_file"]
                by_file[rdf] = by_file.get(rdf, 0) + 1
            assert by_file and all(v == 1 for v in by_file.values())
            assert removed
            got = t.read(spark)
            assert got.count() == 30
            s = t.current_snapshot()["summary"]
            assert int(s["total-position-deletes"]) == 10
        finally:
            server.shutdown()


class TestParquetDeleteLiveness:
    def test_mor_parquet_delete_racing_rewrite_forces_replan(
        self, spark, tmp_path
    ):
        """validateDataFilesExist covers PLAIN merge-on-read position
        deletes too, not just vectors: tuples referencing a file a
        concurrent compaction replaced would match nothing and the
        'deleted' rows would stay readable."""
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "events", _df(spark).schema, partition_source="ts"
        )
        t.append_dataframe(_df(spark).filter("id < 20"))
        t.append_dataframe(_df(spark).filter("id >= 20"))
        t2 = cat.load_table("otel", "events")

        real_plan = mod.plan_position_delete
        fired = {"done": False}

        def racing_plan(*args, **kwargs):
            planned = real_plan(*args, **kwargs)
            if not fired["done"]:
                fired["done"] = True
                assert t2.rewrite_data_files(spark, min_files=2) is not None
            return planned

        mod.plan_position_delete = racing_plan
        try:
            with pytest.raises(ReplaceConflictError, match="no longer live"):
                t.delete_where(spark, "id in (3, 4)", mode="merge-on-read")
        finally:
            mod.plan_position_delete = real_plan
        assert t.read(spark).count() == 40  # nothing half-deleted
        sid, n = t.delete_where(spark, "id in (3, 4)", mode="merge-on-read")
        assert n == 2 and sid is not None
        assert t.read(spark).count() == 38
