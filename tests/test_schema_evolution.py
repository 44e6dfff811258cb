"""Iceberg add-column schema evolution on both catalog transports:
existing field ids untouched (old files readable forever), new columns
surface as NULL for pre-evolution files, metadata-only commit (no data
rewrite), and the same behavior over REST via add-schema /
set-current-schema CommitTable updates."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    current_schema,
    spark_read_schema,
)

from rest_stub import make_server


def _df_v1(spark, n=20):
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % 2).cast("int"))
            ),
        )
        .withColumn("name", F.concat(F.lit("n"), F.col("id")))
    )


NEW_COLS = [
    StructField("lang", StringType(), True),
    StructField("score", DoubleType(), True),
]


class TestFsSchemaEvolution:
    def test_add_columns_reads_old_files_as_null(self, spark, tmp_path):
        df1 = _df_v1(spark)
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "docs", df1.schema, partition_source="ts")
        t.append_dataframe(df1)

        sid = t.add_columns(NEW_COLS)
        assert sid == 1

        df2 = (
            _df_v1(spark)
            .withColumn("id", F.col("id") + 100)
            .withColumn("lang", F.lit("en"))
            .withColumn("score", F.col("id").cast("double"))
        )
        t.append_dataframe(df2)

        out = t.read(spark)
        assert set(out.columns) == {"id", "ts", "name", "lang", "score"}
        old = out.filter("id < 100")
        new = out.filter("id >= 100")
        assert old.count() == 20 and new.count() == 20
        assert old.filter("lang IS NOT NULL OR score IS NOT NULL").count() == 0
        assert new.filter("lang = 'en'").count() == 20

    def test_field_ids_stable_and_fresh(self, spark, tmp_path):
        df1 = _df_v1(spark)
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "ids", df1.schema, partition_source="ts")
        before = current_schema(t.metadata())
        t.add_columns(NEW_COLS)
        after = current_schema(t.metadata())
        # untouched prefix: identical ids and types
        assert after["fields"][: len(before["fields"])] == before["fields"]
        new_ids = [f["id"] for f in after["fields"][len(before["fields"]) :]]
        old_max = max(f["id"] for f in before["fields"])
        assert new_ids == [old_max + 1, old_max + 2]
        md = t.metadata()
        assert md["last-column-id"] == old_max + 2
        assert len(md["schemas"]) == 2  # history preserved

    def test_duplicate_column_rejected(self, spark, tmp_path):
        df1 = _df_v1(spark)
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "dup", df1.schema, partition_source="ts")
        with pytest.raises(ValueError, match="already exist"):
            t.add_columns([StructField("name", StringType(), True)])

    def test_evolution_is_metadata_only(self, spark, tmp_path):
        df1 = _df_v1(spark)
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "meta", df1.schema, partition_source="ts")
        t.append_dataframe(df1)
        files_before = set(t.all_files())
        sizes_before = {p: os.path.getsize(p) for p in files_before}
        t.add_columns(NEW_COLS)
        assert set(t.all_files()) == files_before
        assert {p: os.path.getsize(p) for p in files_before} == sizes_before
        # no new snapshot either — pure metadata version bump
        assert len(t.snapshots()) == 1

    def test_incremental_read_uses_current_schema(self, spark, tmp_path):
        df1 = _df_v1(spark)
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "incr", df1.schema, partition_source="ts")
        s1 = t.append_dataframe(df1)
        t.add_columns(NEW_COLS)
        out = t.read_changes(spark)  # full history, evolved schema
        assert "lang" in out.columns
        assert out.filter("lang IS NOT NULL").count() == 0
        assert t.read_changes(spark, from_snapshot_id=s1).columns == out.columns

    def test_spark_read_schema_roundtrips_types(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark import schemas as S

        cat = FsCatalog(str(tmp_path / "wh"))
        # the widest real schema: metrics summary (arrays, dotted names)
        t = cat.create_table(
            "otel", "sum", S.SCHEMAS[S.SIGNAL_METRICS_SUMMARY], partition_source=None
        )
        got = spark_read_schema(t.metadata())
        want = S.SCHEMAS[S.SIGNAL_METRICS_SUMMARY]
        assert [f.name for f in got.fields] == [f.name for f in want.fields]
        assert [f.dataType for f in got.fields] == [f.dataType for f in want.fields]


class TestRestSchemaEvolution:
    def test_add_columns_over_rest(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            df1 = _df_v1(spark)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "docs", df1.schema, partition_source="ts")
            t.append_dataframe(df1)
            sid = t.add_columns(NEW_COLS)
            assert sid == 1
            md = t.metadata()
            assert md["current-schema-id"] == 1 and len(md["schemas"]) == 2

            df2 = (
                _df_v1(spark)
                .withColumn("id", F.col("id") + 100)
                .withColumn("lang", F.lit("fr"))
                .withColumn("score", F.lit(0.5))
            )
            t.append_dataframe(df2)
            out = t.read(spark)
            assert out.filter("lang = 'fr'").count() == 20
            assert out.filter("id < 100 AND lang IS NULL").count() == 20
        finally:
            server.shutdown()
