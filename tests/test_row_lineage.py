"""Iceberg v3 row lineage: _row_id / _last_updated_sequence_number.

Assignment: each v3 commit takes its first-row-id from the table's
next-row-id; fresh data files consume id space in commit order
(manifest field 142) and next-row-id advances by the snapshot's
added-rows. Inheritance on read: a row's _row_id = its file's
first_row_id + row position, _last_updated = the file's data sequence
number — unless a CoW rewrite MATERIALIZED the columns, which is how
identity stays stable across an append -> CoW update -> compaction
chain (the verdict's done-criterion). MoR updates preserve _row_id on
the updated copies with the new commit's sequence number. Both
transports."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

from rest_stub import make_server


def _df(spark, n=30, base=0, tag="a"):
    return (
        spark.range(base, base + n)
        .withColumn("ts", F.to_timestamp(F.lit("2024-03-01 00:00:00")))
        .withColumn("v", F.lit(tag))
    )


def _lineage_map(t, spark):
    """{id: (_row_id, _last_updated_sequence_number)} of the live table."""
    rows = t.read(spark, with_lineage=True).collect()
    return {r["id"]: (r["_row_id"], r["_last_updated_sequence_number"]) for r in rows}


@pytest.fixture()
def v3_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "ln", _df(spark).schema, partition_source="ts")
    t.upgrade_format_version(3)
    return t


class TestAssignment:
    def test_v2_read_refuses_lineage(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "v2", _df(spark).schema)
        t.append_dataframe(_df(spark))
        with pytest.raises(ValueError, match="format-version 3"):
            t.read(spark, with_lineage=True)

    def test_append_assigns_contiguous_ids(self, spark, v3_table):
        t = v3_table
        s1 = t.append_dataframe(_df(spark, 30))
        md = t.metadata()
        snap = next(s for s in md["snapshots"] if s["snapshot-id"] == s1)
        assert snap["first-row-id"] == 0
        assert snap["added-rows"] == 30
        assert md["next-row-id"] == 30
        got = _lineage_map(t, spark)
        assert sorted(r for r, _ in got.values()) == list(range(30))
        assert {seq for _, seq in got.values()} == {1}
        # second append continues the id space
        s2 = t.append_dataframe(_df(spark, 10, base=100))
        md = t.metadata()
        assert next(
            s for s in md["snapshots"] if s["snapshot-id"] == s2
        )["first-row-id"] == 30
        assert md["next-row-id"] == 40
        got = _lineage_map(t, spark)
        assert sorted(r for r, _ in got.values()) == list(range(40))

    def test_manifest_records_first_row_id(self, spark, v3_table):
        from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import read_ocf

        t = v3_table
        t.append_dataframe(_df(spark, 30))
        snap = t.current_snapshot()
        _, _, manifests = read_ocf(snap["manifest-list"])
        _, _, entries = read_ocf(manifests[0]["manifest_path"])
        firsts = sorted(e["data_file"]["first_row_id"] for e in entries)
        assert firsts[0] == 0
        assert sum(e["data_file"]["record_count"] for e in entries) == 30


class TestStabilityAcrossRewrites:
    def test_append_cow_update_compaction_chain(self, spark, v3_table):
        """The verdict's done-criterion: ids stable across the chain."""
        t = v3_table
        t.append_dataframe(_df(spark, 30))
        before = _lineage_map(t, spark)

        # CoW UPDATE: updated rows keep _row_id, take the new seq
        _, n = t.update_where(spark, "id < 10", {"v": "'upd'"},
                              mode="copy-on-write")
        assert n == 10
        update_seq = t.current_snapshot()["sequence-number"]
        after_update = _lineage_map(t, spark)
        assert {i: r for i, (r, _) in after_update.items()} == {
            i: r for i, (r, _) in before.items()
        }
        for i, (rid, seq) in after_update.items():
            assert seq == (update_seq if i < 10 else before[i][1])

        # compaction: everything preserved verbatim
        t.rewrite_data_files(spark, target_bytes=1 << 30, min_files=1)
        after_compact = _lineage_map(t, spark)
        assert after_compact == after_update

        # and a second compaction of already-materialized files too
        t.rewrite_data_files(spark, target_bytes=1 << 30, min_files=1)
        assert _lineage_map(t, spark) == after_update

    def test_cow_delete_preserves_survivors(self, spark, v3_table):
        t = v3_table
        t.append_dataframe(_df(spark, 30))
        before = _lineage_map(t, spark)
        t.delete_where(spark, "id >= 20", mode="copy-on-write")
        after = _lineage_map(t, spark)
        assert after == {i: v for i, v in before.items() if i < 20}

    def test_dv_delete_removes_ids_only(self, spark, v3_table):
        t = v3_table
        t.append_dataframe(_df(spark, 30))
        before = _lineage_map(t, spark)
        t.delete_where(spark, "id IN (3, 7)", mode="deletion-vectors")
        after = _lineage_map(t, spark)
        assert after == {i: v for i, v in before.items() if i not in (3, 7)}

    def test_mor_update_preserves_row_ids(self, spark, v3_table):
        t = v3_table
        t.append_dataframe(_df(spark, 30))
        before = _lineage_map(t, spark)
        _, n = t.update_where(spark, "id < 5", {"v": "'m'"},
                              mode="deletion-vectors")
        assert n == 5
        new_seq = t.current_snapshot()["sequence-number"]
        after = _lineage_map(t, spark)
        assert {i: r for i, (r, _) in after.items()} == {
            i: r for i, (r, _) in before.items()
        }
        for i in range(5):
            assert after[i][1] == new_seq

    def test_rewrite_manifests_preserves_lineage(self, spark, v3_table):
        t = v3_table
        t.append_dataframe(_df(spark, 20))
        t.append_dataframe(_df(spark, 10, base=100))
        before = _lineage_map(t, spark)
        assert t.rewrite_manifests(min_count=2) is not None
        assert _lineage_map(t, spark) == before

    def test_merge_inserts_get_fresh_ids(self, spark, v3_table):
        t = v3_table
        t.append_dataframe(_df(spark, 30))
        before = _lineage_map(t, spark)
        # 5 updates (CoW merge: delete+insert, fresh ids per spec) +
        # 5 inserts
        t.merge_rows(spark, _df(spark, 10, base=25, tag="m"), ["id"],
                     mode="copy-on-write")
        after = _lineage_map(t, spark)
        # untouched rows keep identity
        for i in range(25):
            assert after[i] == before[i]
        # merged + inserted rows have fresh ids beyond the old space
        old_ids = {r for r, _ in before.values()}
        for i in range(25, 35):
            assert after[i][0] not in old_ids


class TestRestLineage:
    def test_rest_chain(self, spark, tmp_path):
        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "ln", _df(spark).schema,
                                    partition_source="ts")
            t.upgrade_format_version(3)
            t.append_dataframe(_df(spark, 20))
            assert t.metadata()["next-row-id"] == 20
            before = _lineage_map(t, spark)
            assert sorted(r for r, _ in before.values()) == list(range(20))
            _, n = t.update_where(spark, "id < 4", {"v": "'u'"},
                                  mode="copy-on-write")
            assert n == 4
            after = _lineage_map(t, spark)
            assert {i: r for i, (r, _) in after.items()} == {
                i: r for i, (r, _) in before.items()
            }
            t.append_dataframe(_df(spark, 5, base=200))
            md = t.metadata()
            assert md["next-row-id"] >= 25
            got = _lineage_map(t, spark)
            assert len({r for r, _ in got.values()}) == 25  # all distinct
        finally:
            server.shutdown()


class TestChangelogLineage:
    def test_changelog_carries_row_identity(self, spark, v3_table):
        """A CDC consumer keyed by _row_id sees the SAME id insert,
        update (delete+insert in DV terms: the delete row carries the
        id), and survive CoW rewrites."""
        t = v3_table
        s1 = t.append_dataframe(_df(spark, 20))
        id_map = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        t.delete_where(spark, "id IN (4, 9)", mode="deletion-vectors")
        out = t.changelog_scan(spark, with_lineage=True).collect()
        inserts = {r["id"]: r["_row_id"] for r in out
                   if r["_change_type"] == "insert"}
        deletes = {r["id"]: r["_row_id"] for r in out
                   if r["_change_type"] == "delete"}
        assert inserts == id_map
        assert deletes == {4: id_map[4], 9: id_map[9]}
        # after a compaction, a fresh window's inserts still carry the
        # ORIGINAL ids (materialized by the rewrite)
        t.rewrite_data_files(spark, target_bytes=1 << 30, min_files=1)
        t.append_dataframe(_df(spark, 3, base=500))
        tail = t.changelog_scan(
            spark,
            from_snapshot_id=t.metadata()["snapshots"][-2]["snapshot-id"],
            with_lineage=True,
        ).collect()
        new_ids = {r["_row_id"] for r in tail if r["_change_type"] == "insert"}
        assert len(new_ids) == 3 and new_ids.isdisjoint(set(id_map.values()))

    def test_v2_changelog_refuses_lineage(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "v2c", _df(spark).schema)
        t.append_dataframe(_df(spark))
        with pytest.raises(ValueError, match="format-version 3"):
            t.changelog_scan(spark, with_lineage=True)


class TestCliSurface:
    def test_cli_upgrade_ref_and_lineage_changelog(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        t = cat.create_table("otel", "cl", _df(spark).schema,
                             partition_source="ts")
        base = ["--warehouse", wh, "--table", "cl"]
        assert main(["upgrade", *base, "--format-version", "3"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["format_version"] == 3
        assert t.metadata()["format-version"] == 3
        t.append_dataframe(_df(spark, 10))

        assert main([
            "ref", *base, "--name", "audit", "--type", "branch",
            "--min-snapshots-to-keep", "3", "--max-ref-age-ms", "86400000",
        ]) == 0
        ref = t.metadata()["refs"]["audit"]
        assert ref["min-snapshots-to-keep"] == 3
        assert ref["max-ref-age-ms"] == 86400000
        capsys.readouterr()

        t.append_dataframe(_df(spark, 5, base=100))
        outdir = str(tmp_path / "cdc")
        assert main([
            "changes", *base, "--output", outdir, "--changelog",
            "--with-lineage",
        ]) == 0
        got = spark.read.parquet(outdir)
        assert "_row_id" in got.columns
        assert got.count() == 15
        assert got.select("_row_id").distinct().count() == 15

        assert main(["ref", *base, "--name", "audit", "--drop"]) == 0
        assert "audit" not in t.metadata()["refs"]


class TestPreUpgradeFiles:
    def test_pre_upgrade_files_read_null_row_ids(self, spark, tmp_path):
        """Files committed BEFORE the v3 upgrade have no id space
        (manifest first_row_id absent): their rows read NULL _row_id
        until a rewrite assigns them — the spec's lazy-upgrade rule.
        Post-upgrade appends get real ids; a compaction then assigns
        ids to everything (fresh file, fresh first_row_id)."""
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "pre", _df(spark).schema,
                             partition_source="ts")
        t.append_dataframe(_df(spark, 10))          # v2-era file
        t.upgrade_format_version(3)
        t.append_dataframe(_df(spark, 5, base=100))  # v3 file: ids 0..4
        rows = t.read(spark, with_lineage=True).collect()
        old = [r for r in rows if r["id"] < 100]
        new = [r for r in rows if r["id"] >= 100]
        assert all(r["_row_id"] is None for r in old)
        assert sorted(r["_row_id"] for r in new) == list(range(5))
        # compaction assigns ids to the formerly-null rows
        t.rewrite_data_files(spark, target_bytes=1 << 30, min_files=1)
        rows = t.read(spark, with_lineage=True).collect()
        assert all(r["_row_id"] is not None for r in rows)
        assert len({r["_row_id"] for r in rows}) == 15
        # the post-upgrade rows KEPT their ids through the rewrite
        kept = {r["id"]: r["_row_id"] for r in rows if r["id"] >= 100}
        assert sorted(kept.values()) == list(range(5))

    def test_upgrade_compact_cow_changelog_chain(self, spark, tmp_path):
        """The full lazy-upgrade story: CoW changelog recovery RAISES
        while touched files predate lineage, compaction assigns real
        ids (fresh first_row_id; nulls inherit from it), and from then
        on the ids are STABLE and the changelog recovers CoW rewrites."""
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "chain", _df(spark).schema,
                             partition_source="ts")
        t.append_dataframe(_df(spark, 12))           # v2-era file
        t.upgrade_format_version(3)
        pre_cow = t.current_snapshot()["snapshot-id"]
        t.delete_where(spark, "id = 2", mode="copy-on-write")
        # the rewrite touched a pre-lineage file: recovery must refuse
        # loudly (ids cannot be derived), naming the remedy
        with pytest.raises(ValueError, match="compaction"):
            t.changelog_scan(
                spark, from_snapshot_id=pre_cow, with_lineage=True
            ).collect()
        # compaction assigns ids...
        t.rewrite_data_files(spark, target_bytes=1 << 30, min_files=1)
        assigned = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        assert all(v is not None for v in assigned.values())
        # ...that are STABLE across a subsequent CoW rewrite, and the
        # changelog now recovers it
        head = t.current_snapshot()["snapshot-id"]
        t.update_where(spark, "id = 5", {"v": "'u'"}, mode="copy-on-write")
        log = t.changelog_scan(
            spark, from_snapshot_id=head, with_lineage=True
        ).collect()
        assert {(r["_change_type"], r["id"], r["_row_id"]) for r in log} == {
            ("delete", 5, assigned[5]),
            ("insert", 5, assigned[5]),
        }
        after = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        assert after == assigned

    def test_upgrade_compact_assigns_over_rest(self, spark, tmp_path):
        """Same chain over the REST transport: upgrade -> compact ->
        formerly-null ids become real, post-upgrade ids preserved."""
        import os as _os

        from rest_stub import make_server

        warehouse = str(tmp_path / "rwh")
        _os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "pre", _df(spark).schema,
                                    partition_source="ts")
            t.append_dataframe(_df(spark, 10))
            t.upgrade_format_version(3)
            t.append_dataframe(_df(spark, 5, base=100))
            rows = t.read(spark, with_lineage=True).collect()
            assert all(r["_row_id"] is None for r in rows if r["id"] < 100)
            new_ids = {r["id"]: r["_row_id"] for r in rows if r["id"] >= 100}
            t.rewrite_data_files(spark, target_bytes=1 << 30, min_files=1)
            rows = t.read(spark, with_lineage=True).collect()
            assert all(r["_row_id"] is not None for r in rows)
            assert len({r["_row_id"] for r in rows}) == 15
            assert {
                r["id"]: r["_row_id"] for r in rows if r["id"] >= 100
            } == new_ids
        finally:
            server.shutdown()


class TestManifestListInheritance:
    """Iceberg v3 manifest-list field 520: external engines may leave
    per-entry first_row_id (field 142) NULL and rely on the list-level
    base — a reader assigns base + accumulated record counts of the
    preceding inheriting ADDED entries. The engine writes explicit
    per-entry values, so these tests SURGICALLY null them out to
    emulate a lazy external writer against the engine's own list."""

    @staticmethod
    def _null_entry_ids(t) -> list[dict]:
        from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import (
            read_ocf,
            write_ocf,
        )

        snap = t.current_snapshot()
        _, _, manifests = read_ocf(snap["manifest-list"])
        for m in manifests:
            if m.get("content", 0) != 0:
                continue
            schema_, meta_, rows = read_ocf(m["manifest_path"])
            for e in rows:
                e["data_file"]["first_row_id"] = None
            extra = {
                k: v for k, v in meta_.items()
                if k not in ("avro.schema", "avro.codec")
            }
            write_ocf(m["manifest_path"], schema_, rows, extra_metadata=extra)
        return manifests

    def test_null_entries_inherit_from_list_level_base(self, spark, v3_table):
        t = v3_table
        t.append_dataframe(_df(spark, 20))
        t.append_dataframe(_df(spark, 7, base=100))
        before = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        manifests = self._null_entry_ids(t)
        # the engine stamped each data manifest's id-space base
        bases = sorted(
            m["first_row_id"] for m in manifests if m.get("content", 0) == 0
        )
        assert bases[0] == 0 and bases[-1] > 0
        after = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        assert after == before  # lazy inheritance reproduces explicit ids

    def test_changelog_reads_inherited_ids(self, spark, v3_table):
        t = v3_table
        s1 = t.append_dataframe(_df(spark, 10))
        expected = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        self._null_entry_ids(t)
        log = t.changelog_scan(spark, with_lineage=True).collect()
        assert {
            r["id"]: r["_row_id"] for r in log if r["_change_type"] == "insert"
        } == expected

    def test_manifest_merge_materializes_inherited_ids(self, spark, v3_table):
        """A manifest rewrite (merge) flips entries to EXISTING, which
        must carry EXPLICIT ids — inherited values materialize during
        the rewrite, so the merged manifest (no list-level base of its
        own) still reads right."""
        from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import read_ocf

        t = v3_table
        t.append_dataframe(_df(spark, 20))
        t.append_dataframe(_df(spark, 7, base=100))
        before = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        self._null_entry_ids(t)
        assert t.rewrite_manifests(min_count=2) is not None
        after = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        assert after == before
        # ...and the merged manifest's entries are now EXPLICIT
        _, _, manifests = read_ocf(t.current_snapshot()["manifest-list"])
        merged = [
            m for m in manifests
            if m.get("content", 0) == 0 and m["existing_files_count"] > 0
        ]
        assert merged
        for m in merged:
            _, _, rows = read_ocf(m["manifest_path"])
            assert all(
                e["data_file"]["first_row_id"] is not None for e in rows
            )


class TestCowChangelogViaLineage:
    def test_cow_delete_recovered(self, spark, v3_table):
        t = v3_table
        t.append_dataframe(_df(spark, 30))
        head = t.current_snapshot()["snapshot-id"]
        t.delete_where(spark, "id IN (3, 17)", mode="copy-on-write")
        # without lineage the CoW overwrite still raises (v2 contract)
        with pytest.raises(ValueError, match="with_lineage"):
            t.changelog_scan(spark, from_snapshot_id=head).collect()
        out = t.changelog_scan(
            spark, from_snapshot_id=head, with_lineage=True
        ).collect()
        assert {(r["_change_type"], r["id"]) for r in out} == {
            ("delete", 3),
            ("delete", 17),
        }

    def test_cow_update_emits_delete_insert_pairs(self, spark, v3_table):
        t = v3_table
        t.append_dataframe(_df(spark, 30))
        id_map = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        head = t.current_snapshot()["snapshot-id"]
        t.update_where(spark, "id < 3", {"v": "'upd'"}, mode="copy-on-write")
        out = t.changelog_scan(
            spark, from_snapshot_id=head, with_lineage=True
        ).collect()
        dels = {(r["id"], r["_row_id"], r["v"]) for r in out
                if r["_change_type"] == "delete"}
        ins = {(r["id"], r["_row_id"], r["v"]) for r in out
               if r["_change_type"] == "insert"}
        # pre-images deleted, post-images inserted, SAME _row_id
        assert dels == {(i, id_map[i], "a") for i in range(3)}
        assert ins == {(i, id_map[i], "upd") for i in range(3)}

    def test_cow_merge_recovered(self, spark, v3_table):
        t = v3_table
        t.append_dataframe(_df(spark, 30))
        head = t.current_snapshot()["snapshot-id"]
        t.merge_rows(spark, _df(spark, 4, base=28, tag="m"), ["id"],
                     mode="copy-on-write")
        out = t.changelog_scan(
            spark, from_snapshot_id=head, with_lineage=True
        ).collect()
        by_type = {}
        for r in out:
            by_type.setdefault(r["_change_type"], set()).add(r["id"])
        # matched keys 28,29 replaced (delete+insert); 30,31 inserted
        assert by_type["delete"] == {28, 29}
        assert by_type["insert"] == {28, 29, 30, 31}

    def test_untouched_files_never_scanned(self, spark, v3_table, monkeypatch):
        """Cost tracks the rewrite: survivor files are not read."""
        t = v3_table
        # two separate files (two appends)
        t.append_dataframe(_df(spark, 30))
        t.append_dataframe(_df(spark, 30, base=1000))
        head = t.current_snapshot()["snapshot-id"]
        t.delete_where(spark, "id = 1005", mode="copy-on-write")
        touched: list[str] = []
        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs as fsmod

        real = fsmod.table_file_scan

        def spy(spark_, md_, schema_, paths, *a, **k):
            touched.extend(paths)
            return real(spark_, md_, schema_, paths, *a, **k)

        monkeypatch.setattr(fsmod, "table_file_scan", spy)
        out = t.changelog_scan(
            spark, from_snapshot_id=head, with_lineage=True
        ).collect()
        assert {r["id"] for r in out} == {1005}
        # only the rewritten file pair (removed parent file + its
        # replacement) was scanned — the untouched survivor never was
        assert len(touched) <= 2


class TestNetChanges:
    def test_window_collapses_to_net_effect(self, spark, v3_table):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            net_changes,
        )

        t = v3_table
        t.append_dataframe(_df(spark, 10))           # ids 0..9 pre-window
        start = t.current_snapshot()["snapshot-id"]
        id_map = {
            r["id"]: r["_row_id"]
            for r in t.read(spark, with_lineage=True).collect()
        }
        # window: insert 100..104; update id 1 twice; delete id 2;
        # insert-then-delete id 103
        t.append_dataframe(_df(spark, 5, base=100, tag="w"))
        t.update_where(spark, "id = 1", {"v": "'u1'"}, mode="deletion-vectors")
        t.update_where(spark, "id = 1", {"v": "'u2'"}, mode="deletion-vectors")
        t.delete_where(spark, "id = 2", mode="deletion-vectors")
        t.delete_where(spark, "id = 103", mode="deletion-vectors")
        log = t.changelog_scan(
            spark, from_snapshot_id=start, with_lineage=True
        )
        net = net_changes(log).collect()
        dels = {(r["id"], r["v"]) for r in net if r["_change_type"] == "delete"}
        ins = {(r["id"], r["v"]) for r in net if r["_change_type"] == "insert"}
        # id 1: one delete (original pre-image) + one insert (FINAL u2);
        # id 2: one delete; 103 vanished; 100-102,104 net inserts
        assert dels == {(1, "a"), (2, "a")}
        assert ins == {(1, "u2"), (100, "w"), (101, "w"), (102, "w"), (104, "w")}
        # row identity is stable through the collapse
        net_ids = {r["id"]: r["_row_id"] for r in net if r["id"] in (1, 2)}
        assert net_ids[1] == id_map[1] and net_ids[2] == id_map[2]

    def test_refusals(self, spark, v3_table):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            net_changes,
        )

        t = v3_table
        t.append_dataframe(_df(spark, 5))
        plain = t.changelog_scan(spark)  # no lineage columns
        with pytest.raises(ValueError, match="with_lineage"):
            net_changes(plain)
        # equality deletes produce key-only rows — but a LINEAGE
        # changelog auto-resolves their full pre-images
        # (full_pre_images defaults to with_lineage), so net_changes
        # composes with no extra flags; the eq-deleted row was ALSO
        # inserted inside this window, so it nets to NOTHING
        t.delete_where_equality(spark, _df(spark, 1, base=2).select("id"), ["id"])
        log = t.changelog_scan(spark, with_lineage=True)
        net = net_changes(log).collect()
        got = {(r["_change_type"], r["id"]) for r in net}
        assert got == {("insert", 0), ("insert", 1), ("insert", 3), ("insert", 4)}
        # an EXPLICIT full_pre_images=False keeps the metadata-only
        # delete_key form; the identity guard then refuses — lazily,
        # inside the plan (no extra pre-flight job)
        log = t.changelog_scan(spark, with_lineage=True, full_pre_images=False)
        with pytest.raises(Exception, match="full_pre_images"):
            net_changes(log).collect()
