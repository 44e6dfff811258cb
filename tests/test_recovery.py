"""Recovery tests: scanner parsing, time filters, anti-join
reconciliation, adaptive batching, dry-run, cross-partition fallback.

Mirrors the reference's mock-FileIO/mock-Catalog strategy
(internal/recovery/scanner_test.go:19-424, reconciler_test.go:19-935):
files are synthesized on local disk; the catalog is an injected
register_fn.
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from opentelemetry_iceberg_exporter_spark.recovery import (
    MAX_BATCH_SIZE,
    apply_time_filter,
    catalog_only_count,
    distinct_tables,
    find_orphans,
    recover,
    registered_files,
    scan_files,
)
from opentelemetry_iceberg_exporter_spark.recovery.cli import parse_time_flag


def _touch(root, rel):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(b"x")
    return p


@pytest.fixture()
def warehouse(tmp_path):
    root = str(tmp_path / "wh")
    paths = {
        "t1_h10": _touch(
            root, "otel_traces/data/year=2024/month=01/day=15/hour=10/a.parquet"
        ),
        "t1_h11": _touch(
            root, "otel_traces/data/year=2024/month=01/day=15/hour=11/b.parquet"
        ),
        "logs_d": _touch(root, "otel_logs/data/year=2024/month=02/c.parquet"),
        "nopart": _touch(root, "otel_logs/data/d.parquet"),  # unparseable
        "junk": _touch(root, "otel_traces/data/year=2024/month=01/_SUCCESS"),
    }
    return root, paths


class TestScanner:
    def test_scan_and_parse(self, spark, warehouse):
        root, paths = warehouse
        df = scan_files(spark, root)
        rows = {r["uri"]: r for r in df.collect()}
        # suffix filter (F2): _SUCCESS excluded
        assert paths["junk"] not in rows
        assert len(rows) == 4

        r = rows[paths["t1_h10"]]
        assert r["table"] == "otel_traces"
        assert (r["year"], r["month"], r["day"], r["hour"]) == (2024, 1, 15, 10)
        assert r["partition_time"] == datetime(2024, 1, 15, 10, 0, 0)

        # month granularity: missing day/hour default to period start
        r2 = rows[paths["logs_d"]]
        assert r2["partition_time"] == datetime(2024, 2, 1, 0, 0, 0)

        # unparseable -> NULL partition_time (conservative include later)
        assert rows[paths["nopart"]]["partition_time"] is None

    def test_time_filter_conservative_include(self, spark, warehouse):
        """F3 (scanner.go:197-226): after <= t < before; NULL keeps."""
        root, paths = warehouse
        df = scan_files(spark, root)
        kept = apply_time_filter(
            df,
            after=datetime(2024, 1, 15, 11, 0, 0),
            before=datetime(2024, 2, 1, 0, 0, 0),
        )
        uris = {r["uri"] for r in kept.collect()}
        assert paths["t1_h11"] in uris  # boundary: after is inclusive
        assert paths["t1_h10"] not in uris
        assert paths["logs_d"] not in uris  # boundary: before is exclusive
        assert paths["nopart"] in uris  # unparseable conservatively included

    def test_distinct_tables(self, spark, warehouse):
        root, _ = warehouse
        assert sorted(distinct_tables(scan_files(spark, root))) == [
            "otel_logs",
            "otel_traces",
        ]

    def test_root_with_regex_metachars_and_partition_like_segments(self, spark):
        """The root must be stripped as a PLAIN prefix and key=value
        extraction must run on the root-RELATIVE path: a root containing
        regex metacharacters or its own 'year=...' segment must not
        break table extraction or leak into partition values."""
        from opentelemetry_iceberg_exporter_spark.recovery.scanner import (
            parse_partitions,
        )

        root = "/wh (v2)+/year=1999/backup"
        uri = root + "/otel_traces/data/year=2024/month=03/f.parquet"
        df = spark.createDataFrame([(uri, 1)], "uri string, size long")
        r = parse_partitions(df, root).collect()[0]
        assert r["table"] == "otel_traces"
        assert (r["year"], r["month"]) == (2024, 3)
        assert r["partition_time"] == datetime(2024, 3, 1, 0, 0, 0)


class TestReconciler:
    def test_orphans_and_catalog_only(self, spark, warehouse):
        root, paths = warehouse
        scanned = scan_files(spark, root)
        registered = registered_files(
            spark,
            {
                "otel_traces": [paths["t1_h10"], "/gone/from/storage.parquet"],
            },
        )
        orphans = {r["uri"] for r in find_orphans(scanned, registered).collect()}
        assert orphans == {paths["t1_h11"], paths["logs_d"], paths["nopart"]}
        assert catalog_only_count(scanned, registered) == 1  # T6

    def test_registered_dedup_across_tables(self, spark):
        """T3: same path in two snapshots/tables counted once."""
        reg = registered_files(
            spark, {"t1": ["/a.parquet", "/b.parquet"], "t1b": ["/a.parquet"]}
        )
        assert reg.select("uri").distinct().count() == 2

    def test_recover_registers_per_table(self, spark, warehouse):
        root, paths = warehouse
        scanned = scan_files(spark, root)
        registered = registered_files(spark, {"otel_traces": [paths["t1_h10"]]})
        calls: list[tuple[str, tuple[str, ...]]] = []

        def register_fn(table, uris):
            calls.append((table, tuple(sorted(uris))))

        res = recover(scanned, registered, register_fn)
        assert res.orphaned == 3
        assert res.recovered == 3
        assert res.failed == 0
        tables = sorted(c[0] for c in calls)
        assert tables == ["otel_logs", "otel_traces"]

    def test_recover_streams_orphans_without_collect(self, spark, warehouse, monkeypatch):
        """Driver-memory bound: the registration loop consumes orphan
        paths through toLocalIterator in max_batch_size chunks and never
        materializes the full orphan set with collect() (mass-outage
        recovery at scale must not OOM the driver)."""
        from pyspark.sql import DataFrame

        root, paths = warehouse
        scanned = scan_files(spark, root)
        registered = registered_files(spark, {"otel_traces": [paths["t1_h10"]]})
        batches: list[tuple[str, int]] = []

        def register_fn(table, uris):
            batches.append((table, len(uris)))

        monkeypatch.setattr(
            DataFrame,
            "collect",
            lambda self: (_ for _ in ()).throw(AssertionError("collect() in recover")),
        )
        res = recover(scanned, registered, register_fn, max_batch_size=2)
        assert res.orphaned == 3 and res.recovered == 3
        # chunked at max_batch_size, grouped per table
        assert all(n <= 2 for _, n in batches)
        assert sorted({t for t, _ in batches}) == ["otel_logs", "otel_traces"]

    def test_dry_run_touches_nothing(self, spark, warehouse):
        root, _ = warehouse
        scanned = scan_files(spark, root)
        registered = registered_files(spark, {})

        def register_fn(table, uris):
            raise AssertionError("must not register in dry-run")

        res = recover(scanned, registered, register_fn, dry_run=True)
        assert res.dry_run and res.orphaned == 4 and res.recovered == 0

    def test_adaptive_batch_divide_by_10(self, spark):
        """X1 (reconciler_test.go:367): poison file fails the big batch;
        division isolates it; everything else registers."""
        uris = [f"/wh/t/data/year=2024/f{i:04d}.parquet" for i in range(250)]
        poison = uris[137]
        scanned = registered_files(spark, {"t": uris}).select("uri", "table")
        registered = registered_files(spark, {})
        attempts: list[int] = []

        def register_fn(table, batch):
            attempts.append(len(batch))
            if poison in batch:
                raise RuntimeError("validation failed: bad metadata")

        res = recover(scanned, registered, register_fn, max_batch_size=100)
        assert res.recovered == 249
        assert res.failed == 1
        assert res.failures[0][0] == poison
        # division happened: a 100-batch failed, then 10s, then 1s
        assert 100 in attempts and 10 in attempts and 1 in attempts

    def test_cross_partition_triggers_repartition(self, spark):
        """X4 -> R6 (reconciler.go:367-449)."""
        scanned = registered_files(spark, {"t": ["/wh/t/x.parquet"]}).select(
            "uri", "table"
        )
        registered = registered_files(spark, {})
        repartitioned: list[str] = []

        def register_fn(table, batch):
            raise RuntimeError(
                "cannot register: more than one value for partition field hour"
            )

        def repartition_fn(table, uri):
            repartitioned.append(uri)

        res = recover(
            scanned, registered, register_fn, repartition_fn=repartition_fn
        )
        assert repartitioned == ["/wh/t/x.parquet"]
        assert res.repartitioned == 1 and res.failed == 0

    def test_default_batch_size_constant(self):
        assert MAX_BATCH_SIZE == 1000  # reconciler.go:14-21


class TestCli:
    def test_parse_time_flag(self):
        assert parse_time_flag("2024-01-15") == datetime(2024, 1, 15)
        assert parse_time_flag("2024-01-15T10:30:00Z") == datetime(2024, 1, 15, 10, 30)
        with pytest.raises(ValueError):
            parse_time_flag("not-a-time")

    def test_no_catalog_registration_points_at_executable_modes(
        self, spark, warehouse, tmp_path, capsys
    ):
        """A manifest-only run with orphans must not silently report a
        bare NotImplementedError — the failure text names the two
        catalog modes that DO register (--warehouse / --rest-uri)."""
        import json

        from opentelemetry_iceberg_exporter_spark.recovery.cli import main

        root, paths = warehouse
        manifest = tmp_path / "registered.txt"
        manifest.write_text(paths["t1_h10"] + "\n")
        rc = main(["--root", root, "--registered-manifest", str(manifest)])
        assert rc == 1  # orphans exist, registration not possible
        out = json.loads(capsys.readouterr().out)
        assert out["failed"] > 0
        assert any("--warehouse" in err and "--rest-uri" in err for _, err in out["failures"])


class TestRepartitioner:
    def test_repartition_misplaced_file(self, spark, tmp_path):
        """R6 (repartitioner.go:77-196): a file spanning two hours is
        re-read and re-appended through the partitioned sink, then the
        original is deleted."""
        import json

        from opentelemetry_iceberg_exporter_spark import schemas as S
        from opentelemetry_iceberg_exporter_spark.recovery import repartition_file
        from opentelemetry_iceberg_exporter_spark.sinks import read_raw_table
        from opentelemetry_iceberg_exporter_spark.streaming import flatten_signal
        from test_otlp_flatten import T0_NS, _span, _traces_payload
        from test_sinks_pipeline import _config

        cfg = _config(tmp_path)
        late = _span(
            spanId="dddd030405060708",
            startTimeUnixNano=str(T0_NS + 3_600_000_000_000),
            endTimeUnixNano=str(T0_NS + 3_601_000_000_000),
        )
        raw = spark.createDataFrame(
            [(json.dumps(_traces_payload([_span(), late])),)], "value string"
        )
        flat = flatten_signal(raw, "traces")[S.SIGNAL_TRACES]
        # simulate a misplaced single file (no partitioning)
        misplaced_dir = str(tmp_path / "misplaced")
        flat.coalesce(1).write.parquet(misplaced_dir)
        part_file = next(
            os.path.join(misplaced_dir, f)
            for f in os.listdir(misplaced_dir)
            if f.endswith(".parquet")
        )

        res = repartition_file(spark, part_file, "otel_traces", cfg)
        assert res.rows == 2 and res.deleted
        assert not os.path.exists(part_file)

        back = read_raw_table(spark, cfg, S.SIGNAL_TRACES)
        assert back.count() == 2
        # partition values type-infer to ints on read (Hive path strings)
        hours = sorted(r["hour"] for r in back.select("hour").distinct().collect())
        assert hours == [10, 11]


class TestCorruptFiles:
    def test_corrupt_parquet_skipped(self, spark, tmp_path):
        """S4 (internal/arrow/parquet.go:61-109): corrupt objects are
        skipped, good ones read."""
        from opentelemetry_iceberg_exporter_spark.sources.tables import (
            read_parquet_robust,
        )

        d = str(tmp_path / "mix")
        spark.range(10).write.parquet(d)
        with open(os.path.join(d, "part-corrupt.parquet"), "wb") as f:
            f.write(b"PAR1 this is not a real parquet file")

        assert read_parquet_robust(spark, d).count() == 10

        import pytest as _pytest

        with _pytest.raises(Exception):
            read_parquet_robust(spark, d, ignore_corrupt=False).count()
