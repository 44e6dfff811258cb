"""Manifest-LEVEL pruning via manifest-list partition summaries
(Iceberg spec field 507, `partitions`: one field_summary per spec
field).

Without summaries, scan planning opens EVERY manifest file of the
snapshot — O(total manifests) even for a one-partition read. With
them, a manifest whose summary proves no entry can match is skipped
UNOPENED, so planning cost tracks the MATCHING partitions: the
difference between bounded and unbounded planning time on a 100 TB
table with years of commit history.

Guarantees pinned here: summaries are written for every new manifest
(appends, merges, fold rewrites), pruning is exact against the
per-entry walk, null-containing summaries and summary-less manifests
(older writers) are never skipped, and copy-on-write DML — which must
get every excluded FILE back for re-commit — keeps the full walk."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import read_ocf
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    decode_bound,
    plan_dml_files,
    plan_scan_metadata,
)


def _df(spark, ids, tag="a"):
    return spark.createDataFrame(
        [(i, tag) for i in ids], "id long, tag string"
    ).select(
        "id",
        F.to_timestamp(
            F.lit("2024-03-01 00:00:00").cast("timestamp")
            + F.make_interval(days=(F.col("id") / 100).cast("int"))
        ).alias("ts"),
        "tag",
    )


@pytest.fixture()
def table(spark, tmp_path):
    """Four daily partitions committed as four separate micro-batch
    appends — four data manifests, one per day."""
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "otel", "ev", _df(spark, [0]).schema, partition_source="ts",
        granularity="daily",
    )
    for day in range(4):
        t.append_dataframe(_df(spark, range(day * 100, day * 100 + 100)))
    return t


def _manifest_reads(monkeypatch, module):
    """Count manifest-FILE read_ocf calls (not the manifest list)."""
    reads: list[str] = []
    real = module.read_ocf

    def counting(path, *a, **k):
        if path.endswith(".avro") and not os.path.basename(path).startswith(
            "snap-"
        ):
            reads.append(path)
        return real(path, *a, **k)

    monkeypatch.setattr(module, "read_ocf", counting)
    return reads


class TestSummariesWritten:
    def test_append_manifests_carry_summaries(self, table):
        snap = table.current_snapshot()
        manifests = read_ocf(snap["manifest-list"])[2]
        data = [m for m in manifests if m["content"] == 0]
        assert len(data) == 4
        for i, m in enumerate(sorted(data, key=lambda m: m["sequence_number"])):
            s = m["partitions"]
            assert s is not None and len(s) == 1
            assert s[0]["contains_null"] is False
            lo = decode_bound(s[0]["lower_bound"], "int")
            hi = decode_bound(s[0]["upper_bound"], "int")
            assert lo == hi  # one day per manifest

    def test_null_partition_sets_contains_null(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "ev", _df(spark, [0]).schema, partition_source="ts",
            granularity="daily",
        )
        df = _df(spark, range(10)).unionByName(
            spark.createDataFrame([(999, None, "n")], "id long, ts timestamp, tag string")
        )
        t.append_dataframe(df)
        m = next(
            m
            for m in read_ocf(t.current_snapshot()["manifest-list"])[2]
            if m["content"] == 0
        )
        assert m["partitions"][0]["contains_null"] is True

    def test_delete_manifests_carry_null_summaries(self, spark, table):
        table.delete_where(spark, "id = 5", mode="merge-on-read")
        m = next(
            m
            for m in read_ocf(table.current_snapshot()["manifest-list"])[2]
            if m["content"] == 1
        )
        s = m["partitions"]
        assert s is not None and s[0]["contains_null"] is True
        assert s[0]["lower_bound"] is None


class TestManifestSkip:
    def test_range_read_opens_only_matching_manifests(
        self, table, monkeypatch
    ):
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        from datetime import datetime, timezone

        reads = _manifest_reads(monkeypatch, mod)
        md = table.metadata()
        files, deletes, pruned = plan_scan_metadata(
            md,
            source_range=(
                "ts",
                datetime(2024, 3, 2, tzinfo=timezone.utc),
                datetime(2024, 3, 2, 23, 59, tzinfo=timezone.utc),
            ),
        )
        assert len(files) == 1  # day-2's single file
        assert pruned == 3  # three whole manifests skipped, 1 file each
        assert len(reads) == 1  # three manifest FILES never opened

    def test_equality_read_opens_one_manifest(self, table, monkeypatch):
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        from datetime import datetime, timezone

        reads = _manifest_reads(monkeypatch, mod)
        md = table.metadata()
        files, _, pruned = plan_scan_metadata(
            md,
            source_predicate=("ts", datetime(2024, 3, 4, tzinfo=timezone.utc)),
        )
        assert len(files) == 1 and pruned == 3
        assert len(reads) == 1

    def test_pruned_count_matches_per_entry_walk(self, table):
        """Manifest-level skip must be EXACT: same files, same pruned
        count as the per-entry walk (forced via pruned_out)."""
        from datetime import datetime, timezone

        md = table.metadata()
        rng = (
            "ts",
            datetime(2024, 3, 2, tzinfo=timezone.utc),
            datetime(2024, 3, 3, 12, tzinfo=timezone.utc),
        )
        fast, _, fast_pruned = plan_scan_metadata(md, source_range=rng)
        excluded: list = []
        slow, _, slow_pruned = plan_scan_metadata(
            md, source_range=rng, pruned_out=excluded
        )
        assert {f.file_path for f in fast} == {f.file_path for f in slow}
        assert fast_pruned == slow_pruned == len(excluded)

    def test_dml_planning_keeps_full_walk(self, table, monkeypatch):
        """CoW DML needs the excluded FILE entries back (survivors
        re-commit by reference): pruned_out forces the per-entry walk —
        every manifest opened, every excluded file materialized."""
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        reads = _manifest_reads(monkeypatch, mod)
        md = table.metadata()
        scan, excluded, _ = plan_dml_files(
            md,
            md["current-snapshot-id"],
            "ts >= TIMESTAMP '2024-03-02 00:00:00' AND ts < TIMESTAMP "
            "'2024-03-03 00:00:00'",
        )
        assert len(scan) == 1 and len(excluded) == 3
        assert len(reads) == 4  # no manifest skipped when files are owed

    def test_summaryless_manifest_never_skipped(self, table):
        """Manifests from writers without field 507 (absent key or null)
        fall back to the per-entry walk — never mis-pruned."""
        from datetime import datetime, timezone

        md = table.metadata()
        snap = table.current_snapshot()
        _, _, manifests = read_ocf(snap["manifest-list"])
        for m in manifests:
            m.pop("partitions", None)  # simulate an older writer's list

        real = read_ocf

        def stripped(path, *a, **k):
            out = real(path, *a, **k)
            if path == snap["manifest-list"]:
                return out[0], out[1], manifests
            return out

        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        orig = mod.read_ocf
        mod.read_ocf = stripped
        try:
            files, _, pruned = plan_scan_metadata(
                md,
                source_range=(
                    "ts",
                    datetime(2024, 3, 2, tzinfo=timezone.utc),
                    datetime(2024, 3, 2, 23, tzinfo=timezone.utc),
                ),
            )
        finally:
            mod.read_ocf = orig
        # same result, via the per-entry walk
        assert len(files) == 1 and pruned == 3

    def test_read_results_unchanged_end_to_end(self, spark, table):
        from datetime import datetime, timezone

        assert table.read(spark).count() == 400
        day2 = table.plan_files(
            source_predicate=("ts", datetime(2024, 3, 2, tzinfo=timezone.utc))
        )[0]
        assert len(day2) == 1


class TestMergedAndFoldedManifests:
    def test_commit_time_merged_manifest_recomputes_summaries(
        self, spark, tmp_path, monkeypatch
    ):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "ev", _df(spark, [0]).schema, partition_source="ts",
            granularity="daily",
            properties={"commit.manifest.min-count-to-merge": "2"},
        )
        for day in range(4):
            t.append_dataframe(_df(spark, range(day * 100, day * 100 + 100)))
        manifests = read_ocf(t.current_snapshot()["manifest-list"])[2]
        merged = [m for m in manifests if m["existing_files_count"] > 0]
        assert merged  # aggressive merging fired
        for m in merged:
            s = m["partitions"]
            assert s is not None
            lo = decode_bound(s[0]["lower_bound"], "int")
            hi = decode_bound(s[0]["upper_bound"], "int")
            assert lo < hi  # spans several merged days
        # and the merged summary still prunes exactly
        from datetime import datetime, timezone

        files, _, _ = plan_scan_metadata(
            t.metadata(),
            source_predicate=("ts", datetime(2024, 3, 4, tzinfo=timezone.utc)),
        )
        assert len(files) == 1

    def test_rest_parity(self, spark, tmp_path):
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from rest_stub import make_server

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table(
                "otel", "ev", _df(spark, [0]).schema, partition_source="ts",
                granularity="daily",
            )
            for day in range(3):
                t.append_dataframe(_df(spark, range(day * 100, day * 100 + 100)))
            manifests = read_ocf(t.current_snapshot()["manifest-list"])[2]
            assert all(
                m["partitions"] is not None for m in manifests if m["content"] == 0
            )
            from datetime import datetime, timezone

            files, _, pruned = plan_scan_metadata(
                t.metadata(),
                source_predicate=(
                    "ts", datetime(2024, 3, 2, tzinfo=timezone.utc)
                ),
            )
            assert len(files) == 1 and pruned == 2
        finally:
            server.shutdown()
