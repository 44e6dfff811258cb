"""Manifest column bounds + stats-based file skipping: commits record
per-file min/max for top-level primitive columns (single-value binary
serialization per the Iceberg spec), and plan_files prunes files whose
bounds exclude a column range WITHOUT opening them — Iceberg's
file-skipping layer beyond hidden-partition pruning."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    decode_bound,
    encode_bound,
)


class TestBoundCodec:
    @pytest.mark.parametrize(
        "value,itype",
        [
            (0, "long"),
            (-(2**62), "long"),
            (2**31 - 1, "int"),
            (-1, "int"),
            (3.5, "double"),
            (-0.25, "float"),
            (True, "boolean"),
            (False, "boolean"),
            ("héllo wörld", "string"),
            ("", "string"),
        ],
    )
    def test_roundtrip(self, value, itype):
        assert decode_bound(encode_bound(value, itype), itype) == value

    def test_timestamp_micros(self):
        ts = datetime(2024, 3, 1, 12, 30, 45, 123456, tzinfo=timezone.utc)
        assert decode_bound(encode_bound(ts, "timestamptz"), "timestamptz") == ts
        # raw micros accepted too
        micros = 1_700_000_000_123_456
        out = decode_bound(encode_bound(micros, "timestamptz"), "timestamptz")
        assert int(out.timestamp() * 1_000_000) == micros

    def test_little_endian_layout(self):
        # spec: fixed-width numerics are little-endian
        assert encode_bound(1, "long") == b"\x01" + b"\x00" * 7
        assert encode_bound(1, "int") == b"\x01\x00\x00\x00"


class TestFileSkipping:
    @pytest.fixture()
    def table(self, spark, tmp_path):
        """4 hourly partitions; `id` ranges disjoint per hour, so id
        predicates can skip files via bounds even though the partition
        spec knows nothing about id."""
        df = (
            spark.range(400)
            .withColumn(
                "ts",
                F.to_timestamp(
                    F.lit("2024-03-01 00:00:00").cast("timestamp")
                    + F.make_interval(hours=(F.col("id") / 100).cast("int"))
                ),
            )
            .withColumn("name", F.concat(F.lit("n"), F.col("id")))
        )
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "b", df.schema, partition_source="ts")
        t.append_dataframe(df)
        return t

    def test_bounds_prune_files_without_opening(self, spark, table):
        t = table
        all_files, _ = t.plan_files()
        assert len(all_files) == 4
        # id in [150, 160] lives in exactly one file (hour 1: ids 100-199)
        files, pruned = t.plan_files(column_range=("id", 150, 160))
        assert len(files) == 1 and pruned == 3
        out = t.read(spark, column_range=("id", 150, 160)).filter(
            "id BETWEEN 150 AND 160"
        )
        assert out.count() == 11

    def test_open_ranges(self, spark, table):
        t = table
        files, pruned = t.plan_files(column_range=("id", 350, None))
        assert len(files) == 1 and pruned == 3
        files, pruned = t.plan_files(column_range=("id", None, 50))
        assert len(files) == 1 and pruned == 3

    def test_string_and_timestamp_bounds(self, spark, table):
        t = table
        # timestamptz bounds: only hour-2 file overlaps this instant range
        lo = datetime(2024, 3, 1, 2, 0, tzinfo=timezone.utc)
        hi = datetime(2024, 3, 1, 2, 59, tzinfo=timezone.utc)
        files, pruned = t.plan_files(column_range=("ts", lo, hi))
        assert len(files) == 1 and pruned == 3
        # string bounds exist and are usable (lexicographic, conservative)
        files, _ = t.plan_files(column_range=("name", "n", "nzzz"))
        assert len(files) == 4  # every file overlaps — none wrongly pruned

    def test_unknown_column_raises(self, table):
        with pytest.raises(ValueError, match="no boundable column"):
            table.plan_files(column_range=("nope", 1, 2))

    def test_legacy_manifests_without_bounds_are_kept(self, spark, tmp_path):
        """Files registered without readable footers (or written by the
        pre-bounds format) carry no bounds — pruning must keep them."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import DataFile

        df = spark.range(4).withColumn(
            "ts", F.to_timestamp(F.lit("2024-03-01 00:00:00"))
        )
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "legacy", df.schema, partition_source="ts")
        t.append_files([DataFile("/nonexistent/f.parquet", 10, 1, {"ts_hour": 1})])
        files, pruned = t.plan_files(column_range=("id", 100, 200))
        assert len(files) == 1 and pruned == 0  # conservatively kept
