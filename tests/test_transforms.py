"""bucket[N] / truncate[W] partition transforms.

Three layers of checks:

1. SPEC conformance — the Iceberg table spec (Appendix B) publishes the
   exact 32-bit hash values a compliant implementation must produce
   (``hash(34) == 2017239379``, ``hash("iceberg") == 1210000089``, ...).
   Those constants come from the PUBLISHED spec, not from this repo, so
   they pin compatibility with every other Iceberg writer/reader.
2. Kernel parity — the vectorized numpy batch kernels must agree with
   the scalar reference implementation on randomized data (all lengths,
   negative longs, unicode, nulls).
3. End-to-end — a bucket[4]-partitioned fs table writes at most 4
   partitions, a point lookup prunes to ~1/4 of the files, and a
   truncate[string] table round-trips string partition values through
   Hive paths, Avro manifests, and scan pruning.
"""

from __future__ import annotations

import random
import uuid as uuidlib
from datetime import date, datetime, timezone
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    apply_transform_value,
    manifest_avro_schema,
    spec_fields_from_partition_by,
)
from opentelemetry_iceberg_exporter_spark.sinks.transforms import (
    bucket_value,
    hash_value,
    murmur3_bytes_batch,
    murmur3_longs,
    murmur3_x86_32,
    parse_transform,
    transform_result_type,
    truncate_value,
)


class TestSpecConformanceVectors:
    """Iceberg table spec, Appendix B 'Bucket transform requirements' —
    published input/output pairs for the mandated Murmur3 x86 32-bit
    hash with seed 0."""

    def test_int_and_long_widen_to_same_hash(self):
        assert hash_value(34, "int") == 2017239379
        assert hash_value(34, "long") == 2017239379

    def test_date(self):
        assert hash_value(date(2017, 11, 16), "date") == -653330422
        # raw day ordinal accepted too (driver-side pruning path)
        assert hash_value(17486, "date") == -653330422

    def test_time(self):
        import datetime as dt

        assert hash_value(dt.time(22, 31, 8), "time") == -662762989
        assert hash_value(81068000000, "time") == -662762989

    def test_timestamp_micros(self):
        from datetime import timedelta

        ts = datetime(2017, 11, 16, 22, 31, 8)
        assert hash_value(ts, "timestamp") == -2047944441
        tz = datetime(2017, 11, 16, 14, 31, 8, tzinfo=timezone(timedelta(hours=-8)))
        assert hash_value(tz, "timestamptz") == -2047944441

    def test_string(self):
        assert hash_value("iceberg", "string") == 1210000089

    def test_uuid(self):
        u = uuidlib.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
        assert hash_value(u, "uuid") == 1488055340

    def test_fixed_binary(self):
        assert hash_value(b"\x00\x01\x02\x03", "binary") == -188683207
        assert hash_value(b"\x00\x01\x02\x03", "fixed[4]") == -188683207

    def test_decimal(self):
        assert hash_value(Decimal("14.20"), "decimal(9,2)") == -500754589

    def test_empty_input(self):
        # murmur3(b"") with seed 0 is 0 per the reference algorithm
        assert murmur3_x86_32(b"") == 0


class TestBucketTruncateSemantics:
    def test_bucket_range_and_null(self):
        for v in (0, 1, -1, 34, 2**62, -(2**62)):
            b = bucket_value(v, 16, "long")
            assert 0 <= b < 16
        assert bucket_value(None, 16, "long") is None

    def test_bucket_spec_example(self):
        # spec worked example: bucket[...] of 34 uses hash 2017239379
        assert bucket_value(34, 16, "int") == 2017239379 % 16

    def test_truncate_integers_floor(self):
        assert truncate_value(1, 10, "long") == 0
        assert truncate_value(-1, 10, "long") == -10  # floor, NOT toward zero
        assert truncate_value(10, 10, "int") == 10
        assert truncate_value(-10, 10, "int") == -10

    def test_truncate_string_code_points(self):
        assert truncate_value("iceberg", 3, "string") == "ice"
        assert truncate_value("日本語テスト", 2, "string") == "日本"  # chars, not bytes
        assert truncate_value("ab", 5, "string") == "ab"

    def test_truncate_binary_and_decimal(self):
        assert truncate_value(b"\x01\x02\x03", 2, "binary") == b"\x01\x02"
        assert truncate_value(Decimal("12.34"), 50, "decimal(9,2)") == Decimal("12.00")

    def test_parse_and_result_types(self):
        assert parse_transform("bucket[16]") == ("bucket", 16)
        assert parse_transform("truncate[4]") == ("truncate", 4)
        assert parse_transform("hours") == ("hours", None)
        assert transform_result_type("bucket[8]", "string") == "int"
        assert transform_result_type("truncate[4]", "string") == "string"
        assert transform_result_type("truncate[10]", "long") == "long"
        assert transform_result_type("hours", "timestamptz") == "int"


class TestVectorizedKernelParity:
    """The numpy batch kernels vs the scalar spec implementation."""

    def test_longs(self):
        rng = random.Random(7)
        vals = [0, 1, -1, 34, 2**63 - 1, -(2**63)] + [
            rng.randint(-(2**63), 2**63 - 1) for _ in range(500)
        ]
        got = murmur3_longs(np.array(vals, dtype=np.int64))
        expected = [murmur3_x86_32(v.to_bytes(8, "little", signed=True)) for v in map(int, vals)]
        assert got.tolist() == expected

    def test_bucket_column_exact_beyond_2_53_with_nulls(self, spark):
        """Nullable int64 crosses Arrow as float64; the 32-bit split
        must keep values above 2**53 bit-exact anyway."""
        from opentelemetry_iceberg_exporter_spark.sinks.transforms import (
            bucket_column,
        )

        vals = [
            (1 << 62) + 1,
            (1 << 62) + 2,  # collapse to the same float64, differ as longs
            -(1 << 62) - 7,
            9007199254740993,  # 2**53 + 1, first float-unrepresentable int
            None,
            34,
        ]
        df = spark.createDataFrame([Row(id=v) for v in vals], "id long")
        got = [r.b for r in df.select(bucket_column("id", 1024, "long").alias("b")).collect()]
        want = [bucket_value(v, 1024, "long") for v in vals]
        assert got == want
        # and the two float-identical longs land per their TRUE values
        assert got[0] == bucket_value((1 << 62) + 1, 1024, "long")
        assert got[1] == bucket_value((1 << 62) + 2, 1024, "long")

    def test_bytes_all_lengths(self):
        rng = random.Random(11)
        blobs = [bytes(rng.randrange(256) for _ in range(n)) for n in range(0, 40)]
        blobs += [None, b"", "iceberg".encode(), "日本語".encode()]
        got = murmur3_bytes_batch(pd.Series(blobs, dtype="object"))
        for i, b in enumerate(blobs):
            if b is not None:
                assert got[i] == murmur3_x86_32(b), f"len={len(b)}"


class TestKernelProperties:
    """Hypothesis: the batch kernels agree with the scalar spec hash on
    ARBITRARY inputs (not just the seeded samples above)."""

    def test_bytes_batch_matches_scalar_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.one_of(st.none(), st.binary(max_size=64)), max_size=40))
        def check(blobs):
            got = murmur3_bytes_batch(pd.Series(blobs, dtype="object"))
            for i, b in enumerate(blobs):
                if b is not None:
                    assert got[i] == murmur3_x86_32(b)

        check()

    def test_longs_match_scalar_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=40))
        def check(vals):
            got = murmur3_longs(np.array(vals, dtype=np.int64))
            for i, v in enumerate(vals):
                assert got[i] == murmur3_x86_32(v.to_bytes(8, "little", signed=True))

        check()


class TestEndToEndBucketTable(object):
    def _make_table(self, spark, tmp_path, partition_by, schema=None):
        cat = FsCatalog(str(tmp_path / "wh"))
        schema = schema or StructType(
            [
                StructField("id", LongType(), False),
                StructField("payload", StringType(), True),
            ]
        )
        return cat.create_table("ns", "t", schema, partition_by=partition_by)

    def test_bucket_long_write_prune_read(self, spark, tmp_path):
        table = self._make_table(spark, tmp_path, [("id", "bucket[4]")])
        spec = table.partition_spec()
        assert spec == [
            {"name": "id_bucket", "transform": "bucket[4]", "source-id": 1, "field-id": 1000}
        ]
        rows = [Row(id=i, payload=f"p{i}") for i in range(200)]
        df = spark.createDataFrame(rows)
        table.append_dataframe(df)

        files, _ = table.plan_files()
        buckets = {f.partition["id_bucket"] for f in files}
        assert buckets <= {0, 1, 2, 3} and len(buckets) > 1
        # every file's recorded bucket matches the spec transform of its rows
        for f in files:
            got = spark.read.parquet(f.file_path).select("id").collect()
            for r in got:
                assert bucket_value(r.id, 4, "long") == f.partition["id_bucket"]

        # point lookup prunes to exactly the matching bucket's files
        target = 123
        expect_bucket = bucket_value(target, 4, "long")
        pruned_files, n_pruned = table.plan_files(source_predicate=("id", target))
        assert n_pruned > 0
        assert {f.partition["id_bucket"] for f in pruned_files} == {expect_bucket}

        got = (
            table.read(spark, source_predicate=("id", target))
            .filter(F.col("id") == target)
            .collect()
        )
        assert [r.payload for r in got] == [f"p{target}"]

    def test_bucket_string_source(self, spark, tmp_path):
        schema = StructType(
            [
                StructField("doc_id", StringType(), False),
                StructField("n", LongType(), True),
            ]
        )
        table = self._make_table(spark, tmp_path, [("doc_id", "bucket[8]")], schema)
        df = spark.createDataFrame(
            [Row(doc_id=f"doc-{i:04d}", n=i) for i in range(100)]
        )
        table.append_dataframe(df)
        files, _ = table.plan_files()
        for f in files:
            for r in spark.read.parquet(f.file_path).select("doc_id").collect():
                assert bucket_value(r.doc_id, 8, "string") == f.partition["doc_id_bucket"]

        keep, _ = table.plan_files(source_predicate=("doc_id", "doc-0042"))
        assert {f.partition["doc_id_bucket"] for f in keep} == {
            bucket_value("doc-0042", 8, "string")
        }

    def test_truncate_string_partition_roundtrip(self, spark, tmp_path):
        schema = StructType(
            [
                StructField("url", StringType(), False),
                StructField("n", LongType(), True),
            ]
        )
        table = self._make_table(spark, tmp_path, [("url", "truncate[4]")], schema)
        df = spark.createDataFrame(
            [
                Row(url="http://a.example/x", n=1),
                Row(url="http://b.example/y", n=2),
                Row(url="ftp://c.example/z", n=3),
            ]
        )
        table.append_dataframe(df)
        files, _ = table.plan_files()
        parts = {f.partition["url_trunc"] for f in files}
        # ':' is path-hostile — Spark %-escapes it; the scan must unescape
        assert parts == {"http", "ftp:"}

        keep, n_pruned = table.plan_files(source_predicate=("url", "ftp://c.example/z"))
        assert n_pruned >= 1
        assert {f.partition["url_trunc"] for f in keep} == {"ftp:"}
        got = table.read(spark, source_predicate=("url", "ftp://c.example/z")).collect()
        assert [r.n for r in got] == [3]

    def test_truncate_long_partition(self, spark, tmp_path):
        table = self._make_table(spark, tmp_path, [("id", "truncate[100]")])
        df = spark.createDataFrame(
            [Row(id=i, payload=str(i)) for i in (-150, -1, 0, 99, 100, 250)]
        )
        table.append_dataframe(df)
        files, _ = table.plan_files()
        parts = {f.partition["id_trunc"] for f in files}
        assert parts == {-200, -100, 0, 100, 200}  # floor semantics for negatives
        keep, _ = table.plan_files(source_predicate=("id", -1))
        assert {f.partition["id_trunc"] for f in keep} == {-100}

    def test_truncate_range_pruning_monotone(self, spark, tmp_path):
        table = self._make_table(spark, tmp_path, [("id", "truncate[100]")])
        df = spark.createDataFrame(
            [Row(id=i, payload=str(i)) for i in (-150, -1, 0, 99, 100, 250, 555)]
        )
        table.append_dataframe(df)
        # col BETWEEN 50 AND 120 -> partitions {0, 100} only
        keep, n_pruned = table.plan_files(source_range=("id", 50, 120))
        assert {f.partition["id_trunc"] for f in keep} == {0, 100}
        assert n_pruned >= 3
        # one-sided: id >= 200 -> partitions {200, 500}
        keep, _ = table.plan_files(source_range=("id", 200, None))
        assert {f.partition["id_trunc"] for f in keep} == {200, 500}
        rows = table.read(spark, source_range=("id", 50, 120)).filter(
            "id BETWEEN 50 AND 120"
        )
        assert sorted(r.id for r in rows.collect()) == [99, 100]

    def test_bucket_never_range_prunes(self, spark, tmp_path):
        # bucket is NOT monotone: a range predicate must keep every file
        table = self._make_table(spark, tmp_path, [("id", "bucket[4]")])
        table.append_dataframe(
            spark.createDataFrame([Row(id=i, payload=str(i)) for i in range(50)])
        )
        all_files, _ = table.plan_files()
        keep, n_pruned = table.plan_files(source_range=("id", 10, 12))
        assert len(keep) == len(all_files) and n_pruned == 0

    def test_time_transform_range_pruning(self, spark, tmp_path):
        from pyspark.sql import functions as SF

        cat = FsCatalog(str(tmp_path / "wh"))
        schema = StructType(
            [
                StructField("ts", TimestampType(), True),
                StructField("n", LongType(), True),
            ]
        )
        table = cat.create_table(
            "ns", "t_time", schema, partition_source="ts", granularity="hourly"
        )
        df = spark.range(48).select(
            SF.to_timestamp(
                SF.lit("2024-03-01 00:00:00").cast("timestamp")
                + SF.make_interval(hours=SF.col("id").cast("int"))
            ).alias("ts"),
            SF.col("id").alias("n"),
        )
        table.append_dataframe(df)
        lo = datetime(2024, 3, 1, 5, tzinfo=timezone.utc)
        hi = datetime(2024, 3, 1, 7, tzinfo=timezone.utc)
        keep, n_pruned = table.plan_files(source_range=("ts", lo, hi))
        hours = {f.partition["ts_hour"] for f in keep}
        lo_h = int(lo.timestamp()) // 3600
        assert hours == {lo_h, lo_h + 1, lo_h + 2}
        assert n_pruned == 45

    def test_manifest_avro_types_follow_result_type(self):
        schema = {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": True, "type": "long"},
                {"id": 2, "name": "url", "required": True, "type": "string"},
            ],
        }
        spec = spec_fields_from_partition_by(
            schema, [("id", "bucket[4]"), ("url", "truncate[4]"), ("id", "truncate[10]")]
        )
        avro = manifest_avro_schema(spec, schema)
        part_fields = next(
            f for f in _walk_datafile_fields(avro) if f["name"] == "partition"
        )
        types = {f["name"]: f["type"][1] for f in part_fields["type"]["fields"]}
        assert types == {"id_bucket": "int", "url_trunc": "string", "id_trunc": "long"}

    def test_apply_transform_value_dispatch(self):
        assert apply_transform_value(34, "bucket[16]", "long") == 2017239379 % 16
        assert apply_transform_value("iceberg", "truncate[3]", "string") == "ice"
        ts = datetime(2024, 1, 1, 5, tzinfo=timezone.utc)
        assert apply_transform_value(ts, "hours", "timestamptz") == int(ts.timestamp()) // 3600
        assert apply_transform_value(None, "bucket[4]", "long") is None


class TestYearsTransformAndTemporalBuckets:
    def test_years_spec_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as SF

        cat = FsCatalog(str(tmp_path / "wh"))
        schema = StructType(
            [
                StructField("ts", TimestampType(), True),
                StructField("n", LongType(), True),
            ]
        )
        table = cat.create_table("ns", "ty", schema, partition_by=[("ts", "years")])
        df = spark.createDataFrame(
            [
                Row(ts=datetime(1969, 6, 1, 12), n=1),
                Row(ts=datetime(2024, 3, 1, 5), n=2),
                Row(ts=datetime(2025, 12, 31, 23), n=3),
            ]
        )
        table.append_dataframe(df)
        files, _ = table.plan_files()
        assert {f.partition["ts_year"] for f in files} == {-1, 54, 55}
        lo = datetime(2024, 1, 1, tzinfo=timezone.utc)
        keep, n_pruned = table.plan_files(source_range=("ts", lo, None))
        assert {f.partition["ts_year"] for f in keep} == {54, 55}
        assert n_pruned == 1

    def test_bucket_column_parity_timestamp_and_date(self, spark):
        """The Spark bucket column must agree with the scalar spec
        transform on temporal sources (micros / day ordinals)."""
        from datetime import date as ddate

        from pyspark.sql.types import DateType

        from opentelemetry_iceberg_exporter_spark.sinks.transforms import (
            bucket_column,
        )

        rows = [
            Row(ts=datetime(2017, 11, 16, 22, 31, 8), d=ddate(2017, 11, 16)),
            Row(ts=datetime(1969, 12, 31, 23, 59, 59, 999999), d=ddate(1969, 6, 1)),
            Row(ts=datetime(2024, 2, 29, 0, 0, 0, 123456), d=ddate(2024, 2, 29)),
            Row(ts=None, d=None),
        ]
        schema = StructType(
            [StructField("ts", TimestampType(), True), StructField("d", DateType(), True)]
        )
        df = spark.createDataFrame(rows, schema)
        got = df.select(
            bucket_column("ts", 16, "timestamptz").alias("bt"),
            bucket_column("d", 16, "date").alias("bd"),
        ).collect()
        for r, src in zip(got, rows):
            ts_utc = (
                src.ts.replace(tzinfo=timezone.utc) if src.ts is not None else None
            )
            assert r.bt == bucket_value(ts_utc, 16, "timestamptz")
            assert r.bd == bucket_value(src.d, 16, "date")


class TestRestTransportBucketTable:
    """The REST catalog shares the metadata core — a bucket spec must
    survive the CreateTable/CommitTable protocol and the write path."""

    def test_bucket_table_over_rest(self, spark, tmp_path):
        import os as _os
        import sys as _sys

        _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__)))
        from rest_stub import make_server

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "warehouse")
        _os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("ns")
            schema = StructType(
                [
                    StructField("id", LongType(), False),
                    StructField("v", StringType(), True),
                ]
            )
            client.create_table("ns", "bt", schema, partition_by=[("id", "bucket[4]")])
            table = client.ensure_table("ns", "bt", schema)
            assert table.partition_spec()[0]["transform"] == "bucket[4]"
            df = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(100)])
            table.append_dataframe(df)
            got = table.read(spark)
            assert got.count() == 100
            # the hidden partition landed in the data layout
            import glob as _glob

            dirs = _glob.glob(
                _os.path.join(table.location(), "data", "*", "id_bucket=*")
            )
            buckets = {int(d.rsplit("=", 1)[1]) for d in dirs}
            assert buckets <= {0, 1, 2, 3} and len(buckets) > 1
            for b in buckets:
                sub = _glob.glob(_os.path.join(table.location(), "data", "*", f"id_bucket={b}", "*.parquet"))
                for r in spark.read.parquet(*sub).select("id").collect():
                    assert bucket_value(r.id, 4, "long") == b
            # the REST table shares the pruning planner: a point lookup
            # opens only the matching bucket's files
            keep, n_pruned = table.plan_files(source_predicate=("id", 42))
            assert n_pruned > 0
            assert {f.partition["id_bucket"] for f in keep} == {bucket_value(42, 4, "long")}
            got42 = table.read(spark, source_predicate=("id", 42)).filter("id = 42")
            assert [r.v for r in got42.collect()] == ["v42"]
        finally:
            server.shutdown()


class TestScanCli:
    def test_scan_equals_prunes_buckets(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        cat = FsCatalog(str(tmp_path / "wh"))
        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("payload", StringType(), True),
            ]
        )
        t = cat.create_table("ns", "bt", schema, partition_by=[("id", "bucket[4]")])
        t.append_dataframe(
            spark.createDataFrame([Row(id=i, payload=f"p{i}") for i in range(200)])
        )
        out = str(tmp_path / "out")
        rc = main(
            [
                "scan",
                "--warehouse", str(tmp_path / "wh"),
                "--namespace", "ns",
                "--table", "bt",
                "--output", out,
                "--equals", "id=123",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["rows"] == 1 and stats["files_pruned"] > 0
        got = spark.read.parquet(out).collect()
        assert [r.payload for r in got] == ["p123"]

    def test_scan_range_on_truncate(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        cat = FsCatalog(str(tmp_path / "wh2"))
        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("payload", StringType(), True),
            ]
        )
        t = cat.create_table("ns", "tt", schema, partition_by=[("id", "truncate[100]")])
        t.append_dataframe(
            spark.createDataFrame([Row(id=i, payload=f"p{i}") for i in range(0, 400, 10)])
        )
        out = str(tmp_path / "out2")
        rc = main(
            [
                "scan",
                "--warehouse", str(tmp_path / "wh2"),
                "--namespace", "ns",
                "--table", "tt",
                "--output", out,
                "--range", "id", "150", "-",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["files_pruned"] > 0
        got = sorted(r.id for r in spark.read.parquet(out).collect())
        assert got == list(range(150, 400, 10))


def _walk_datafile_fields(manifest_schema: dict):
    data_file = next(
        f for f in manifest_schema["fields"] if f["name"] == "data_file"
    )
    return data_file["type"]["fields"]
