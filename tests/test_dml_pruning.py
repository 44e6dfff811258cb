"""Predicate-derived file pruning in row-level DML planning: a
ts-bounded DELETE/UPDATE on a partitioned table must open only the
files whose partition values / manifest column bounds can contain
matches — the DML analog of the read side's plan_scan pruning, and the
engine-side mirror of the reference's time-pruned recovery scan
(internal/recovery/scanner.go:197-226: prune by time BEFORE touching
storage). At 100 TB, this is the difference between a targeted GDPR
purge and a full-table scan.

Covers: the conservative conjunct extractor (strict grammar, top-level
OR disables, BETWEEN's AND not a split point), the plan_dml_files
scan/excluded split, end-to-end correctness of pruned copy-on-write /
merge-on-read / deletion-vector deletes and updates (pruned files
survive BY REFERENCE — byte-identical paths), and REST parity."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    extract_prune_ranges,
    plan_dml_files,
    _split_conjuncts,
)


def _events_df(spark, n=400, days=4):
    """`days` daily partitions, 100 rows each; id ranges are aligned
    with days (day d holds ids [100d, 100d+100)) so both partition
    pruning (ts) and column-bounds pruning (id) are observable."""
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(days=(F.col("id") / 100).cast("int"))
            ),
        )
        .withColumn("name", F.concat(F.lit("n"), F.col("id")))
        .select("id", "ts", "name")
    )


@pytest.fixture()
def table(spark, tmp_path):
    df = _events_df(spark)
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "otel", "ev", df.schema, partition_source="ts", granularity="daily"
    )
    t.append_dataframe(df)
    return t


class TestConjunctSplitter:
    def test_top_level_or_disables(self):
        assert _split_conjuncts("a = 1 OR b = 2") is None
        # AND binds tighter than OR: `a AND b OR c` is disjunctive too
        assert _split_conjuncts("a = 1 AND b = 2 OR c = 3") is None

    def test_scoped_or_is_one_conjunct(self):
        parts = _split_conjuncts("a = 1 AND (b = 2 OR c = 3)")
        assert parts == ["a = 1", "(b = 2 OR c = 3)"]

    def test_between_and_not_a_split(self):
        parts = _split_conjuncts("a BETWEEN 2 AND 3 AND b = 1")
        assert parts == ["a BETWEEN 2 AND 3", "b = 1"]

    def test_quoted_and_not_a_split(self):
        parts = _split_conjuncts("name = 'x AND y' AND id = 1")
        assert parts == ["name = 'x AND y'", "id = 1"]


class TestExtraction:
    def test_ts_range_and_id_bound(self, table):
        md = table.metadata()
        ranges = extract_prune_ranges(
            "ts >= TIMESTAMP '2024-03-02 00:00:00' AND ts < TIMESTAMP "
            "'2024-03-03 00:00:00' AND pmod(id, 10) = 3",
            md,
        )
        # ts is the partition source: both a column_range and a
        # monotone source_range; the pmod conjunct contributes nothing
        assert ("ts" in {c for c, _, _ in ranges["column_range"]})
        assert ("ts" in {c for c, _, _ in ranges["source_range"]})
        from datetime import timedelta

        lo = datetime(2024, 3, 2, tzinfo=timezone.utc)
        # strict `<` converts exactly: hi = 03-03 midnight minus 1µs
        hi = datetime(2024, 3, 3, tzinfo=timezone.utc) - timedelta(microseconds=1)
        assert ranges["column_range"] == [("ts", lo, hi)]

    def test_flipped_and_between(self, table):
        md = table.metadata()
        r1 = extract_prune_ranges("100 <= id AND id < 200", md)
        r2 = extract_prune_ranges("id BETWEEN 100 AND 200", md)
        assert ("id", 100, 199) in r1["column_range"]  # id < 200 ≡ id <= 199
        assert ("id", 100, 200) in r2["column_range"]

    def test_or_yields_nothing(self, table):
        assert extract_prune_ranges("id < 5 OR id > 300", table.metadata()) == {}

    def test_unparseable_conjunct_ignored(self, table):
        r = extract_prune_ranges("pmod(id, 100) = 7 AND id >= 300", table.metadata())
        assert r["column_range"] == [("id", 300, None)]

    def test_equality_emits_source_predicate(self, table):
        r = extract_prune_ranges(
            "ts = TIMESTAMP '2024-03-02 00:00:00'", table.metadata()
        )
        assert r["source_predicate"] == [
            ("ts", datetime(2024, 3, 2, tzinfo=timezone.utc))
        ]

    def test_inexact_int_literal_skipped(self, table):
        # 4.5 is not representable as a long: no (wrong) pruning
        assert extract_prune_ranges("id > 4.5", table.metadata()) == {}


class TestPlanSplit:
    def test_ts_bound_scans_one_day(self, table):
        md = table.metadata()
        scan, excluded, _ = plan_dml_files(
            md,
            md["current-snapshot-id"],
            "ts >= TIMESTAMP '2024-03-02 00:00:00' AND ts < TIMESTAMP "
            "'2024-03-03 00:00:00'",
        )
        assert len(scan) + len(excluded) == 4
        assert len(scan) == 1  # one daily partition file group
        assert len(excluded) == 3

    def test_id_bounds_prune_without_partition(self, table):
        md = table.metadata()
        scan, excluded, _ = plan_dml_files(
            md, md["current-snapshot-id"], "id >= 350"
        )
        assert len(scan) == 1 and len(excluded) == 3

    def test_unprunable_predicate_scans_all(self, table):
        md = table.metadata()
        scan, excluded, _ = plan_dml_files(
            md, md["current-snapshot-id"], "pmod(id, 100) = 7"
        )
        assert len(scan) == 4 and excluded == []


class TestEndToEnd:
    PRED = (
        "ts >= TIMESTAMP '2024-03-02 00:00:00' AND ts < TIMESTAMP "
        "'2024-03-03 00:00:00' AND pmod(id, 2) = 0"
    )

    def _paths(self, t):
        files, _ = t.plan_files()
        return {f.file_path for f in files}

    def test_cow_delete_pruned_files_survive_by_reference(self, spark, table):
        before = self._paths(table)
        md = table.metadata()
        _, excluded, _ = plan_dml_files(md, md["current-snapshot-id"], self.PRED)
        excluded_paths = {f.file_path for f in excluded}
        sid, n = table.delete_where(spark, self.PRED)  # copy-on-write
        assert sid is not None and n == 50
        after = self._paths(table)
        # every pruned file is still live AND byte-identical (same path)
        assert excluded_paths <= after and excluded_paths <= before
        assert table.read(spark).count() == 350
        # the deleted day keeps only odd ids
        day2 = table.read(spark).filter("id >= 100 and id < 200")
        assert day2.count() == 50
        assert day2.filter("pmod(id, 2) = 0").count() == 0

    def test_dv_delete_only_references_scanned_day(self, spark, table):
        sid, n = table.delete_where(spark, self.PRED, mode="deletion-vectors")
        assert sid is not None and n == 50
        _, deletes, _ = table.plan_scan()
        referenced = {f.referenced_data_file for f in deletes if f.content == 1}
        # the DV puffin only carries vectors for day-2 files
        day_files, _ = table.plan_files(
            source_range=(
                "ts",
                datetime(2024, 3, 2, tzinfo=timezone.utc),
                datetime(2024, 3, 2, 23, 59, tzinfo=timezone.utc),
            )
        )
        assert referenced <= {f.file_path for f in day_files}
        assert table.read(spark).count() == 350

    def test_mor_delete_correct(self, spark, table):
        sid, n = table.delete_where(spark, self.PRED, mode="merge-on-read")
        assert n == 50 and table.read(spark).count() == 350

    def test_or_predicate_still_correct(self, spark, table):
        sid, n = table.delete_where(spark, "id < 50 OR id >= 350")
        assert n == 100 and table.read(spark).count() == 300

    def test_cow_update_pruned_files_survive_by_reference(self, spark, table):
        md = table.metadata()
        _, excluded, _ = plan_dml_files(md, md["current-snapshot-id"], self.PRED)
        excluded_paths = {f.file_path for f in excluded}
        sid, n = table.update_where(spark, self.PRED, {"name": "'updated'"})
        assert sid is not None and n == 50
        assert excluded_paths <= self._paths(table)
        got = table.read(spark)
        assert got.filter("name = 'updated'").count() == 50
        assert got.count() == 400

    def test_dv_update_correct(self, spark, table):
        sid, n = table.update_where(
            spark, self.PRED, {"name": "'u'"}, mode="deletion-vectors"
        )
        assert n == 50
        got = table.read(spark)
        assert got.count() == 400 and got.filter("name = 'u'").count() == 50

    def test_bounds_survive_cow_recommit_without_footer_reads(
        self, spark, table, monkeypatch
    ):
        """A CoW overwrite re-commits survivors into a NEW manifest;
        their column bounds must come from the PRIOR manifest
        (DataFile.raw_bounds) — not from re-reading every surviving
        footer (O(all live files) storage round-trips on a huge purge) —
        and must still drive pruning afterwards."""
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        real = mod.file_column_bounds
        reads: list[str] = []

        def counting(path, md):
            reads.append(path)
            return real(path, md)

        monkeypatch.setattr(mod, "file_column_bounds", counting)
        before = {f.file_path for f in table.plan_files()[0]}
        sid, n = table.delete_where(spark, "id >= 350")  # CoW, day 4 only
        assert n == 50
        # footer reads only for the freshly REWRITTEN file(s): no
        # pre-existing file's footer is touched at commit time
        assert reads and not (set(reads) & before)
        md = table.metadata()
        # bounds reused from the prior manifests still prune exactly
        scan, excluded, _ = plan_dml_files(
            md, md["current-snapshot-id"], "id < 150"
        )
        assert len(scan) == 2 and len(excluded) == 2  # days 1-2 scan only

    def test_empty_range_matches_nothing(self, spark, table):
        # bounds exclude every file: no scan, no commit
        sid, n = table.delete_where(spark, "id > 1000")
        assert sid is None and n == 0
        assert table.read(spark).count() == 400


class TestSessionTimezone:
    """Naive TIMESTAMP literals are evaluated by Spark in
    spark.sql.session.timeZone; the pruning bounds must bind in the
    SAME zone or a non-UTC session could prune files whose rows DO
    match — deletes silently skipped (retention/GDPR hazard)."""

    def test_helper_resolves_zone_ids(self, spark):
        from datetime import timedelta

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            spark_session_timezone,
        )

        orig = spark.conf.get("spark.sql.session.timeZone")
        try:
            for name, expect_off in [
                ("UTC", timedelta(0)),
                ("GMT+05:30", timedelta(hours=5, minutes=30)),
                ("+08:00", timedelta(hours=8)),
                ("-03:30", timedelta(hours=-3, minutes=-30)),
            ]:
                spark.conf.set("spark.sql.session.timeZone", name)
                tz = spark_session_timezone(spark)
                assert tz is not None
                assert tz.utcoffset(datetime(2024, 3, 1)) == expect_off
            spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
            tz = spark_session_timezone(spark)
            assert tz is not None
            assert tz.utcoffset(datetime(2024, 3, 1)) == timedelta(
                hours=5, minutes=30
            )
        finally:
            spark.conf.set("spark.sql.session.timeZone", orig)

    def test_unresolvable_zone_drops_ts_pruning(self, table):
        # session_tz=None (zone could not be resolved): the timestamp
        # conjunct must contribute NO pruning — never wrong pruning
        r = extract_prune_ranges(
            "ts >= TIMESTAMP '2024-03-02 00:00:00' AND id >= 350",
            table.metadata(),
            session_tz=None,
        )
        assert r["column_range"] == [("id", 350, None)]

    def test_non_utc_session_deletes_are_not_pruned_away(self, spark, table):
        """2024-03-04 05:00 in Asia/Kolkata is 2024-03-03 23:30 UTC —
        it MATCHES the whole UTC day-4 partition. Binding the literal
        as UTC would set the lower bound ABOVE the file's max ts and
        prune the file: 0 rows deleted instead of 100."""
        orig = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        try:
            sid, n = table.delete_where(
                spark, "ts >= TIMESTAMP '2024-03-04 05:00:00'"
            )
            assert n == 100 and sid is not None
            assert table.read(spark).count() == 300
        finally:
            spark.conf.set("spark.sql.session.timeZone", orig)

    def test_non_utc_session_still_prunes_correctly(self, spark, table):
        """Session-zone binding keeps pruning EFFECTIVE, not just safe:
        the shifted instant still excludes provably match-free days."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            spark_session_timezone,
        )

        orig = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        try:
            md = table.metadata()
            pred = (
                "ts >= TIMESTAMP '2024-03-02 05:30:00' AND ts < TIMESTAMP "
                "'2024-03-03 05:30:00'"
            )  # exactly UTC day 2
            scan, excluded, _ = plan_dml_files(
                md, md["current-snapshot-id"], pred, spark_session_timezone(spark)
            )
            assert len(scan) == 1 and len(excluded) == 3
            sid, n = table.delete_where(spark, pred)
            assert n == 100
            assert table.read(spark).count() == 300
        finally:
            spark.conf.set("spark.sql.session.timeZone", orig)


class TestCaseInsensitiveColumns:
    def test_upper_case_identifiers_prune(self, table):
        """Spark SQL resolves identifiers case-insensitively by
        default; the extractor must too, or `WHERE TS >= ...` silently
        loses all pruning."""
        md = table.metadata()
        r = extract_prune_ranges(
            "TS >= TIMESTAMP '2024-03-02 00:00:00' AND Id >= 350", md
        )
        assert {c for c, _, _ in r["column_range"]} == {"ts", "id"}
        scan, excluded, _ = plan_dml_files(
            md, md["current-snapshot-id"], "ID >= 350"
        )
        assert len(scan) == 1 and len(excluded) == 3


class TestRestParity:
    @pytest.fixture()
    def rest_table(self, spark, tmp_path):
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from rest_stub import make_server

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        client = RestCatalogClient(uri, warehouse=warehouse)
        df = _events_df(spark)
        client.ensure_namespace("otel")
        t = client.ensure_table(
            "otel", "ev", df.schema, partition_source="ts", granularity="daily"
        )
        t.append_dataframe(df)
        yield t
        server.shutdown()

    def test_rest_cow_delete_prunes_and_survives(self, spark, rest_table):
        t = rest_table
        md = t.metadata()
        scan, excluded, _ = plan_dml_files(
            md, md["current-snapshot-id"], TestEndToEnd.PRED
        )
        assert len(scan) == 1 and len(excluded) == 3
        excluded_paths = {f.file_path for f in excluded}
        sid, n = t.delete_where(spark, TestEndToEnd.PRED)
        assert n == 50
        files, _ = t.plan_files()
        assert excluded_paths <= {f.file_path for f in files}
        assert t.read(spark).count() == 350

    def test_rest_dv_delete_pruned(self, spark, rest_table):
        sid, n = rest_table.delete_where(
            spark, TestEndToEnd.PRED, mode="deletion-vectors"
        )
        assert n == 50 and rest_table.read(spark).count() == 350
