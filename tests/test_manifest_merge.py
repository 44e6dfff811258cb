"""Manifest merging: commit-time merge + the rewrite_manifests action.

A streaming exporter commits one snapshot per micro-batch (the
reference's cadence: 512-record batches, example/otel-config.yaml:26-29;
writer.go:161-297 commits per batch), and every append carries all prior
manifests forward — without merging, scan planning walks O(commits)
manifests. These tests pin the two countermeasures:

* commit-time merging (commit.manifest* table properties): when the
  carried group exceeds min-count-to-merge, small manifests are
  rewritten into ~target-size bins of EXISTING entries;
* the rewrite_manifests maintenance action: an explicit metadata-only
  `replace` commit that collapses the current snapshot's small
  manifests, on BOTH transports.

Both must be invisible to scans, incremental reads, changelogs, time
travel, and equality-delete sequencing.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import read_ocf
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    STATUS_ADDED,
    STATUS_EXISTING,
    DataFile,
    FsCatalog,
)


def _write_pq(path: str, ids: list[int]) -> DataFile:
    """A real (tiny) data file so scan-correctness can be asserted
    without paying a Spark write job per micro-batch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "value": pa.array([i * 2 for i in ids], pa.int64()),
            }
        ),
        path,
    )
    return DataFile(path, os.path.getsize(path), len(ids), {})


def _mk_table(spark, tmp_path, props: dict[str, str] | None):
    cat = FsCatalog(str(tmp_path / "wh"))
    schema = spark.createDataFrame([], "event_id bigint, value bigint").schema
    return cat.create_table("ns", "ev", schema, None, properties=props or {})


def _stream_appends(
    t, n_batches: int, rows_per_batch: int = 2, start: int = 0
) -> list[int]:
    """n micro-batch appends of one real file each; returns snapshot ids."""
    sids = []
    for b in range(start, start + n_batches):
        ids = list(range(b * rows_per_batch, (b + 1) * rows_per_batch))
        f = _write_pq(os.path.join(t.location, "data", f"b{b}.parquet"), ids)
        sids.append(t.append_files([f]))
    return sids


def _manifests(t, snapshot_id: int | None = None) -> list[dict]:
    md = t.metadata()
    sid = snapshot_id if snapshot_id is not None else md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == sid)
    _, _, ms = read_ocf(snap["manifest-list"])
    return ms


MERGE_PROPS = {
    "commit.manifest.min-count-to-merge": "8",
}


class TestCommitTimeMerge:
    def test_manifest_count_bounded_over_many_commits(self, spark, tmp_path):
        """~100 micro-batch commits keep a bounded manifest count (the
        VERDICT r3 'done' bar) and lose no file or row."""
        t = _mk_table(spark, tmp_path, MERGE_PROPS)
        n = 100
        peak = 0
        for b in range(n):
            f = _write_pq(
                os.path.join(t.location, "data", f"b{b}.parquet"), [2 * b, 2 * b + 1]
            )
            t.append_files([f])
            peak = max(peak, len(_manifests(t)))
        # carried smalls merge whenever they reach min-count: the list
        # never exceeds min-count + the fresh manifest
        assert peak <= 9
        assert len(_manifests(t)) <= 9
        got = t.read(spark)
        assert got.count() == 2 * n
        assert got.agg(F.sum("event_id")).first()[0] == sum(range(2 * n))

    def test_merged_manifest_preserves_provenance(self, spark, tmp_path):
        """Merged entries: status EXISTING, ORIGINAL adding snapshot id,
        explicit (non-null) data/file sequence numbers."""
        t = _mk_table(spark, tmp_path, MERGE_PROPS)
        sids = _stream_appends(t, 12)
        merged = [m for m in _manifests(t) if m["existing_files_count"] > 0]
        assert merged, "12 commits at min-count 8 must have merged"
        for m in merged:
            assert m["added_files_count"] == 0
            _, _, entries = read_ocf(m["manifest_path"])
            assert len(entries) == m["existing_files_count"]
            for e in entries:
                assert e["status"] == STATUS_EXISTING
                assert e["snapshot_id"] in sids  # original committer, not the merger
                assert e["sequence_number"] is not None
                assert e["file_sequence_number"] is not None
                assert e["sequence_number"] <= m["sequence_number"]

    def test_incremental_and_changelog_cross_merge(self, spark, tmp_path):
        """A consumer checkpointed BEFORE a merge still sees exactly the
        later appends — merged EXISTING entries never re-surface."""
        t = _mk_table(spark, tmp_path, MERGE_PROPS)
        sids = _stream_appends(t, 6)
        checkpoint = sids[-1]
        more = _stream_appends(t, 6, start=6)  # crosses the merge at commit 8
        files, end = t.incremental_scan(from_snapshot_id=checkpoint)
        assert end == more[-1]
        assert sorted(os.path.basename(f.file_path) for f in files) == sorted(
            f"b{b}.parquet" for b in range(6, 12)
        )
        chg = t.changelog_scan(spark, from_snapshot_id=checkpoint)
        assert chg.count() == 12  # 6 commits x 2 rows, all inserts
        assert chg.select("_change_type").distinct().collect()[0][0] == "insert"

    def test_merge_disabled_by_property(self, spark, tmp_path):
        t = _mk_table(
            spark,
            tmp_path,
            {**MERGE_PROPS, "commit.manifest-merge.enabled": "false"},
        )
        _stream_appends(t, 12)
        assert len(_manifests(t)) == 12

    def test_default_min_count_keeps_small_tables_untouched(self, spark, tmp_path):
        """Default threshold (100) leaves ordinary commit trees —
        including the golden fixtures — byte-identical."""
        t = _mk_table(spark, tmp_path, None)
        _stream_appends(t, 10)
        ms = _manifests(t)
        assert len(ms) == 10
        assert all(m["existing_files_count"] == 0 for m in ms)

    def test_upsert_changelog_after_full_merge(self, spark, tmp_path):
        """An upsert whose carried manifests ALL merged away must still
        changelog as delete_key + insert (the merged EXISTING manifest
        counts as carried ancestor data, not a replace-style live set)."""
        cat = FsCatalog(str(tmp_path / "wh"))
        df = spark.range(8).select(
            F.col("id"),
            F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("ts"),
            F.lit("a").alias("tag"),
        )
        t = cat.create_table(
            "ns",
            "up",
            df.schema,
            partition_source="ts",
            properties={"commit.manifest.min-count-to-merge": "2"},
        )
        first = t.append_dataframe(df.filter("id < 4"))
        t.append_dataframe(df.filter("id >= 4"))
        batch = df.filter("id = 2").withColumn("tag", F.lit("new"))
        t.upsert_equality(spark, batch, ["id"])
        # the upsert's carried manifests merged into one EXISTING manifest
        assert any(m["existing_files_count"] > 0 for m in _manifests(t))
        chg = t.changelog_scan(spark, from_snapshot_id=first)
        by_type = {r["_change_type"]: r["n"] for r in chg.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
        assert by_type == {"insert": 5, "delete_key": 1}
        got = t.read(spark)
        assert got.count() == 8
        assert got.filter("id = 2").first()["tag"] == "new"


class TestRewriteManifests:
    def _tbl(self, spark, tmp_path, n=12):
        t = _mk_table(
            spark, tmp_path, {"commit.manifest-merge.enabled": "false"}
        )
        sids = _stream_appends(t, n)
        return t, sids

    def test_collapses_and_preserves_reads(self, spark, tmp_path):
        t, sids = self._tbl(spark, tmp_path)
        assert len(_manifests(t)) == 12
        rid = t.rewrite_manifests()
        assert rid is not None
        assert len(_manifests(t)) == 1
        snap = t.current_snapshot()
        assert snap["snapshot-id"] == rid
        assert snap["summary"]["operation"] == "replace"
        assert snap["summary"]["operation-detail"] == "rewrite_manifests"
        got = t.read(spark)
        assert got.count() == 24
        assert got.agg(F.sum("value")).first()[0] == sum(2 * i for i in range(24))
        # second run: nothing left to merge
        assert t.rewrite_manifests() is None

    def test_min_count_honored(self, spark, tmp_path):
        """rewrite_manifests(min_count=N) is a real threshold: fewer
        than N small manifests -> no-op."""
        t, _ = self._tbl(spark, tmp_path, n=5)
        assert t.rewrite_manifests(min_count=10) is None
        assert len(_manifests(t)) == 5
        assert t.rewrite_manifests(min_count=5) is not None
        assert len(_manifests(t)) == 1

    def test_invisible_to_incremental_and_changelog(self, spark, tmp_path):
        t, sids = self._tbl(spark, tmp_path, n=4)
        checkpoint = sids[1]
        t.rewrite_manifests()
        later = _stream_appends(t, 1, start=4)  # b4
        files, end = t.incremental_scan(from_snapshot_id=checkpoint)
        assert end == later[0]
        assert sorted(os.path.basename(f.file_path) for f in files) == [
            "b2.parquet",
            "b3.parquet",
            "b4.parquet",
        ]
        chg = t.changelog_scan(spark, from_snapshot_id=checkpoint)
        assert chg.count() == 6
        assert {r[0] for r in chg.select("_change_type").distinct().collect()} == {
            "insert"
        }

    def test_time_travel_pre_rewrite(self, spark, tmp_path):
        t, sids = self._tbl(spark, tmp_path, n=4)
        t.rewrite_manifests()
        assert t.read(spark, snapshot_id=sids[1]).count() == 4
        assert t.read(spark).count() == 8

    def test_equality_delete_sequencing_survives_rewrite(self, spark, tmp_path):
        """Explicit per-entry sequence numbers keep `applies to seq <
        delete seq` exact after the rewrite: old row versions stay
        hidden, rows committed after the delete stay visible."""
        cat = FsCatalog(str(tmp_path / "wh"))
        df = spark.range(4).select(
            F.col("id"),
            F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("ts"),
            F.lit("old").alias("tag"),
        )
        t = cat.create_table("ns", "seq", df.schema, partition_source="ts")
        t.append_dataframe(df)
        t.upsert_equality(
            spark, df.filter("id = 1").withColumn("tag", F.lit("new")), ["id"]
        )
        rid = t.rewrite_manifests(min_count=2)
        assert rid is not None
        got = t.read(spark)
        assert got.count() == 4
        assert got.filter("id = 1").first()["tag"] == "new"
        assert got.filter("tag = 'old'").count() == 3

    def test_concurrent_append_not_dropped(self, spark, tmp_path):
        """A commit landing between plan and CAS re-plans instead of
        losing the append (the mutate loop rebuilds on fresh metadata).
        Simulated by appending after the handle loaded its state —
        rewrite_manifests loads fresh state inside the retry loop, so
        this pins the single-attempt happy path plus file survival."""
        t, _ = self._tbl(spark, tmp_path, n=6)
        extra = _write_pq(os.path.join(t.location, "data", "late.parquet"), [100])
        t.append_files([extra])
        t.rewrite_manifests()
        got = t.read(spark)
        assert got.count() == 13
        assert got.filter("event_id = 100").count() == 1


class TestConcurrentMerge:
    def test_two_writer_race_with_aggressive_merging(self, spark, tmp_path):
        """Two threads commit concurrently to a table whose commit-time
        merge threshold is minimal: the CAS loser rebuilds (re-running
        the merge against the winner's manifests) and no file or row is
        lost across any interleaving."""
        import threading

        t = _mk_table(
            spark,
            tmp_path,
            {
                "commit.manifest.min-count-to-merge": "2",
                # aggressive merging makes CAS losers slower (they redo
                # merge work per retry); on a loaded machine the default
                # budget can exhaust — raise it like a contended
                # production table would (Iceberg's retry knob)
                "commit.retry.num-retries": "12",
            },
        )
        _stream_appends(t, 4)  # seed carried manifests so merges fire

        results, errors = [], []
        barrier = threading.Barrier(2)

        def commit(tag, start):
            try:
                files = [
                    _write_pq(
                        os.path.join(t.location, "data", f"{tag}{i}.parquet"),
                        [start + 2 * i, start + 2 * i + 1],
                    )
                    for i in range(3)
                ]
                barrier.wait()
                for f in files:
                    results.append(t.append_files([f]))
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [
            threading.Thread(target=commit, args=("x", 1000)),
            threading.Thread(target=commit, args=("y", 2000)),
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors
        assert len(results) == 6
        got = t.read(spark)
        assert got.count() == 8 + 12  # 4 seeds x2 rows + 6 commits x2
        names = {
            os.path.basename(f.file_path) for f in t.plan_scan()[0]
        }
        assert names == {f"b{i}.parquet" for i in range(4)} | {
            f"{tag}{i}.parquet" for tag in ("x", "y") for i in range(3)
        }
        assert len(_manifests(t)) <= 6  # merging kept the count bounded


class TestAgeBasedExpiry:
    def test_older_than_ms_limits_expiry(self, spark, tmp_path):
        """expire_snapshots(keep_last, older_than_ms): the age cutoff is
        a retention GUARANTEE on top of keep_last — snapshots at/after
        the cutoff survive even outside the keep-last window."""
        import time as time_mod

        t = _mk_table(spark, tmp_path, None)
        sids = []
        for i in range(3):
            sids += _stream_appends(t, 1, start=i)
            time_mod.sleep(0.01)  # distinct commit timestamps
        snaps = {s["snapshot-id"]: s for s in t.snapshots()}
        mid_ts = snaps[sids[1]]["timestamp-ms"]
        # keep_last=1 alone would expire sids[0] and sids[1]; the age
        # guarantee retains everything committed at/after mid_ts
        t.expire_snapshots(keep_last=1, older_than_ms=mid_ts)
        remaining = [s["snapshot-id"] for s in t.snapshots()]
        assert remaining == [sids[1], sids[2]]
        # no data file deleted: retained descendants still reference
        # the expired append's file (append-chain sharing)
        assert t.read(spark).count() == 6  # current set unaffected
        assert t.read(spark, snapshot_id=sids[1]).count() == 4
        # far-future cutoff: plain keep_last behavior
        t2 = _mk_table(spark, tmp_path / "t2", None)
        s2 = _stream_appends(t2, 3)
        t2.expire_snapshots(keep_last=1, older_than_ms=1 << 60)
        assert [s["snapshot-id"] for s in t2.snapshots()] == [s2[2]]


class TestRandomizedModel:
    def test_random_commit_sequences_match_model(self, spark, tmp_path):
        """Model-based randomized check: arbitrary interleavings of
        micro-batch appends (aggressive commit-time merging ON) and
        rewrite_manifests actions must always plan exactly the model's
        live file set, keep every snapshot's own ADDED files retrievable
        for incremental consumers, and keep the manifest count bounded."""
        import random

        rng = random.Random(42)
        t = _mk_table(
            spark,
            tmp_path,
            {"commit.manifest.min-count-to-merge": "3"},
        )
        live_model: list[str] = []  # file basenames in commit order
        added_by_sid: dict[int, list[str]] = {}
        sids: list[int] = []
        b = 0
        for step in range(40):
            action = rng.random()
            if action < 0.75 or not sids:
                n_files = rng.randint(1, 3)
                files = []
                names = []
                for _ in range(n_files):
                    name = f"b{b}.parquet"
                    files.append(
                        _write_pq(
                            os.path.join(t.location, "data", name), [2 * b, 2 * b + 1]
                        )
                    )
                    names.append(name)
                    b += 1
                sid = t.append_files(files)
                sids.append(sid)
                added_by_sid[sid] = names
                live_model += names
            else:
                t.rewrite_manifests()  # metadata-only no-op on the live set

            data, deletes, _ = t.plan_scan()
            assert deletes == []
            got = sorted(os.path.basename(f.file_path) for f in data)
            assert got == sorted(live_model), f"step {step}"
            ms = _manifests(t)
            assert len(ms) <= 6, f"step {step}: {len(ms)} manifests"

        # every incremental window reproduces exactly the model's adds
        for i in range(0, len(sids), 5):
            files, end = t.incremental_scan(from_snapshot_id=sids[i])
            expect = sorted(
                n for s in sids[i + 1 :] for n in added_by_sid[s]
            )
            assert sorted(os.path.basename(f.file_path) for f in files) == expect
        # full read agrees with the model's row count
        assert t.read(spark).count() == 2 * b
        assert t.count_rows() == 2 * b


class TestMaintainCli:
    def test_maintain_rewrite_manifests_flag(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        schema = spark.createDataFrame([], "event_id bigint, value bigint").schema
        t = cat.create_table(
            "ns", "ev", schema, None, properties={"commit.manifest-merge.enabled": "false"}
        )
        _stream_appends(t, 6)
        assert len(_manifests(t)) == 6
        rc = main(
            [
                "maintain",
                "--warehouse", wh,
                "--namespace", "ns",
                "--table", "ev",
                "--rewrite-manifests",
                "--min-files", "99",  # leave data compaction out
            ]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert out["rewrite_manifests_snapshot"] is not None
        assert len(_manifests(t)) == 1
        assert t.count_rows() == 12


class TestSummaryTotals:
    """The spec's running SnapshotSummary totals (total-records,
    total-files-size, total-data-files, total-delete-files,
    total-position/equality-deletes) and the metadata-only count_rows
    fast path they enable."""

    def test_totals_accumulate_and_count_rows_is_metadata_only(
        self, spark, tmp_path
    ):
        t = _mk_table(spark, tmp_path, None)
        _stream_appends(t, 5)
        s = t.current_snapshot()["summary"]
        assert s["total-records"] == "10"
        assert s["total-data-files"] == "5"
        assert s["total-delete-files"] == "0"
        assert t.count_rows() == 10  # no spark arg: pure metadata
        assert t.count_rows() == t.read(spark).count()
        # time travel counts from that snapshot's own totals
        first = t.snapshots()[0]["snapshot-id"]
        assert t.count_rows(snapshot_id=first) == 2

    def test_empty_table_counts_zero(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path, None)
        assert t.count_rows() == 0

    def test_deletes_tracked_and_fallback_scan(self, spark, tmp_path):
        import pytest as _pytest

        cat = FsCatalog(str(tmp_path / "wh"))
        df = spark.range(8).select(
            F.col("id"),
            F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("ts"),
        )
        t = cat.create_table("ns", "cr", df.schema, partition_source="ts")
        t.append_dataframe(df)
        t.delete_where_equality(spark, df.filter("id < 2").select("id"), ["id"])
        s = t.current_snapshot()["summary"]
        assert s["total-records"] == "8"  # data-file records, not net rows
        assert s["total-delete-files"] == "1"
        assert s["total-equality-deletes"] == "2"
        with _pytest.raises(ValueError, match="pending delete files"):
            t.count_rows()  # exact count needs the read-side subtraction
        assert t.count_rows(spark) == 6

    def test_replace_recomputes_and_rewrite_manifests_carries(
        self, spark, tmp_path
    ):
        t = _mk_table(
            spark, tmp_path, {"commit.manifest-merge.enabled": "false"}
        )
        _stream_appends(t, 4)
        before = {
            k: v
            for k, v in t.current_snapshot()["summary"].items()
            if k.startswith("total-")
        }
        t.rewrite_manifests()
        after = {
            k: v
            for k, v in t.current_snapshot()["summary"].items()
            if k.startswith("total-")
        }
        assert after == before  # metadata-only: totals carried verbatim
        assert t.count_rows() == 8

    def test_legacy_summary_fallback_walks_metadata(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            parent_summary_totals,
        )

        t = _mk_table(spark, tmp_path, None)
        _stream_appends(t, 3)
        md = t.metadata()
        sid = md["current-snapshot-id"]
        # simulate a table written before totals existed / by another engine
        for s in md["snapshots"]:
            for k in list(s["summary"]):
                if k.startswith("total-"):
                    del s["summary"][k]
        totals = parent_summary_totals(md, sid)
        assert totals["total-records"] == 6
        assert totals["total-data-files"] == 3


class TestOrphanMetadataSweep:
    """Every CAS-losing commit attempt abandons a manifest + manifest
    list under metadata/ (both transports write the tree BEFORE the
    commit arbitration). At per-micro-batch cadence with contending
    writers that litter grows without bound — remove_orphan_files now
    sweeps it alongside the data-file orphans."""

    def test_fs_sweeps_abandoned_trees_keeps_referenced(self, spark, tmp_path):
        import glob as glob_mod
        import time as time_mod

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            write_snapshot_tree,
        )

        t = _mk_table(spark, tmp_path, None)
        _stream_appends(t, 3)
        # a CAS-loser: tree written against current md, never committed
        md = t.metadata()
        write_snapshot_tree(
            t.location,
            md,
            [_write_pq(os.path.join(t.location, "data", "loser.parquet"), [99])],
            operation="append",
            carry_forward=True,
            extra_summary={},
        )
        # a deregistered stats file
        stray_puffin = os.path.join(t.location, "metadata", "stats-1-dead.puffin")
        with open(stray_puffin, "wb") as f:
            f.write(b"PFA1deadPFA1")
        meta_dir = os.path.join(t.location, "metadata")
        referenced = {
            os.path.abspath(p)
            for s in t.metadata()["snapshots"]
            for p in [s["manifest-list"]]
        }
        # fresh litter is protected (in-flight-commit window)
        assert t.remove_orphan_files(older_than_seconds=3600) == []
        old = time_mod.time() - 10
        for p in glob_mod.glob(os.path.join(meta_dir, "*.avro")) + [stray_puffin]:
            os.utime(p, (old, old))
        # the loser data file ages too (swept by the data-side pass)
        os.utime(os.path.join(t.location, "data", "loser.parquet"), (old, old))
        deleted = t.remove_orphan_files(older_than_seconds=5)
        # exactly: loser manifest + loser list + stray puffin + loser data file
        assert len(deleted) == 4
        assert stray_puffin in deleted
        for p in referenced:
            assert os.path.exists(p)
        got = t.read(spark)
        assert got.count() == 6  # table untouched
        # metadata-only sweep can be disabled
        assert t.remove_orphan_files(5, include_metadata=False) == []

    def test_rest_409_loser_tree_swept(self, spark, tmp_path):
        """A genuinely raced REST commit: the first attempt's tree is
        abandoned when the server 409s, the retry commits a fresh one —
        the sweep reclaims exactly the abandoned pair."""
        import glob as glob_mod
        import time as time_mod

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )
        from rest_stub import make_server

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            schema = spark.createDataFrame([], "event_id bigint, value bigint").schema
            client.ensure_namespace("ns")
            t = client.ensure_table("ns", "ev", schema, None)
            f = _write_pq(os.path.join(t.location(), "data", "b0.parquet"), [0, 1])
            state.inject(
                409,
                "CommitFailedException",
                "Requirement failed: branch main has changed",
                times=1,
                method="POST",
                path_re=r"/tables/ev$",
            )
            sid = t.append_files([f])
            meta_dir = os.path.join(t.location(), "metadata")
            avros = glob_mod.glob(os.path.join(meta_dir, "*.avro"))
            assert len(avros) == 4  # two trees: loser + winner
            old = time_mod.time() - 10
            for p in avros:
                os.utime(p, (old, old))
            deleted = t.remove_orphan_files(older_than_seconds=5)
            assert len(deleted) == 2  # exactly the abandoned pair
            assert t.metadata()["current-snapshot-id"] == sid
            assert t.read(spark).count() == 2
        finally:
            server.shutdown()


class TestRestRewriteManifests:
    @pytest.fixture()
    def catalog(self, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )
        from rest_stub import make_server

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        client = RestCatalogClient(uri, warehouse=warehouse)
        yield client
        server.shutdown()

    def test_commit_time_merge_and_rewrite_parity(self, spark, tmp_path, catalog):
        schema = spark.createDataFrame([], "event_id bigint, value bigint").schema
        catalog.ensure_namespace("ns")
        t = catalog.ensure_table(
            "ns", "ev", schema, None, properties=MERGE_PROPS
        )
        sids = []
        for b in range(12):
            f = _write_pq(
                os.path.join(t.location(), "data", f"b{b}.parquet"),
                [2 * b, 2 * b + 1],
            )
            sids.append(t.append_files([f]))
        md = t.metadata()
        snap = next(
            s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
        )
        _, _, ms = read_ocf(snap["manifest-list"])
        assert len(ms) <= 9  # commit-time merge ran through the REST transport
        assert any(m["existing_files_count"] > 0 for m in ms)

        rid = t.rewrite_manifests()
        assert rid is not None
        md = t.metadata()
        snap = next(s for s in md["snapshots"] if s["snapshot-id"] == rid)
        assert snap["summary"]["operation"] == "replace"
        _, _, ms = read_ocf(snap["manifest-list"])
        assert len(ms) == 1
        got = t.read(spark)
        assert got.count() == 24
        assert t.count_rows() == 24  # REST metadata-only count parity
        # incremental checkpointed before the rewrite sees only real appends
        files, end = t.incremental_scan(from_snapshot_id=sids[5])
        assert sorted(os.path.basename(f.file_path) for f in files) == sorted(
            f"b{b}.parquet" for b in range(6, 12)
        )


class TestMergeBinningFuzz:
    """Randomized merge_small_manifests parameters over a manifest
    population mixing data manifests, parquet position deletes, a
    deletion vector, and an equality delete: EVERY live entry must
    appear exactly once in the output, with its resolved (inherited)
    sequence number byte-preserved — under any (min_count, target_size,
    force) permutation, including re-merging already-merged output."""

    def test_every_entry_exactly_once_under_random_parameters(
        self, spark, tmp_path
    ):
        import random

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            STATUS_DELETED,
            merge_small_manifests,
        )

        rng = random.Random(23)
        t = _mk_table(
            spark, tmp_path, {"commit.manifest-merge.enabled": "false"}
        )
        _stream_appends(t, 10)
        t.delete_where(spark, "event_id = 1", mode="merge-on-read")
        t.delete_where(spark, "event_id = 3", mode="deletion-vectors")
        keys = spark.createDataFrame([(5,)], "event_id bigint")
        t.delete_where_equality(spark, keys, ["event_id"])
        md = t.metadata()
        manifests = _manifests(t)
        assert len(manifests) >= 13  # merging was off: population intact
        assert {m["content"] for m in manifests} == {0, 1}  # data + deletes
        meta_dir = os.path.join(t.location, "metadata")

        def snapshot_entries(ms):
            out = []
            for m in ms:
                for e in read_ocf(m["manifest_path"])[2]:
                    if e["status"] == STATUS_DELETED:
                        continue
                    d = e["data_file"]
                    seq = (
                        e["sequence_number"]
                        if e.get("sequence_number") is not None
                        else m["sequence_number"]
                    )
                    out.append(
                        ((d["file_path"], d.get("content_offset")), seq)
                    )
            return sorted(out)

        baseline = snapshot_entries(manifests)
        keys_only = [k for k, _ in baseline]
        assert len(keys_only) == len(set(keys_only))  # unique inputs

        for trial in range(14):
            min_count = rng.choice([2, 3, 5, 8])
            target = rng.choice([150, 400, 1200, 6000, 8 * 1024 * 1024])
            force = rng.random() < 0.5
            merged = merge_small_manifests(
                meta_dir,
                manifests,
                md,
                snapshot_id=10_000 + trial,
                commit_seq=md["last-sequence-number"] + 1,
                min_count=min_count,
                target_size=target,
                force=force,
            )
            out = manifests if merged is None else merged
            assert snapshot_entries(out) == baseline, (
                min_count,
                target,
                force,
            )
            if merged is not None and rng.random() < 0.5:
                # idempotence chain: re-merging merged output with a
                # DIFFERENT parameter set still preserves the multiset
                again = merge_small_manifests(
                    meta_dir,
                    merged,
                    md,
                    snapshot_id=20_000 + trial,
                    commit_seq=md["last-sequence-number"] + 2,
                    min_count=rng.choice([2, 4]),
                    target_size=rng.choice([200, 3000]),
                    force=True,
                )
                if again is not None:
                    assert snapshot_entries(again) == baseline


class TestCommitRetryBudget:
    def test_num_retries_property_bounds_attempts(self, spark, tmp_path):
        """commit.retry.num-retries (Iceberg's knob) controls the
        optimistic-commit attempt budget: with 0 retries a single CAS
        loss surfaces immediately; the default absorbs it."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            CommitConflictError,
            commit_attempts_for,
        )

        assert commit_attempts_for({"properties": {}}) == 5  # 1 + 4 default
        assert (
            commit_attempts_for(
                {"properties": {"commit.retry.num-retries": "0"}}
            )
            == 1
        )
        assert (
            commit_attempts_for({"properties": {"commit.retry.num-retries": "bogus"}})
            == 5
        )  # unparseable falls back to the default

        t = _mk_table(
            spark, tmp_path, {"commit.retry.num-retries": "0"}
        )
        _stream_appends(t, 1)
        t2 = _mk_table(spark, tmp_path, None)  # same location handle
        f1 = _write_pq(os.path.join(t.location, "data", "r1.parquet"), [100])
        f2 = _write_pq(os.path.join(t.location, "data", "r2.parquet"), [200])
        f3 = _write_pq(os.path.join(t.location, "data", "r3.parquet"), [300])
        # force a CAS loss: t plans against a base t2 then advances
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        real = mod.write_snapshot_tree
        fired = {"done": False}

        racer = {"file": f2, "done": False}

        def racing(*args, **kwargs):
            out = real(*args, **kwargs)
            if not racer["done"]:
                racer["done"] = True
                t2.append_files([racer["file"]])
            return out

        mod.write_snapshot_tree = racing
        try:
            with pytest.raises(CommitConflictError):
                t.append_files([f1])
        finally:
            mod.write_snapshot_tree = real
        # same race with the default budget: the retry wins
        t.set_properties({"commit.retry.num-retries": "4"})
        racer.update(file=f3, done=False)
        mod.write_snapshot_tree = racing
        try:
            sid = t.append_files([f1])
        finally:
            mod.write_snapshot_tree = real
        assert sid is not None
        assert t.read(spark).count() == 5  # 2 seed + f2 + f3 + f1
