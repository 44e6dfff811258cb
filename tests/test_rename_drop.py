"""Column rename + drop schema evolution, resolved by parquet field id.

Iceberg renames keep the field ID and change only the name; old data
files (written under the old name) must still produce the column. This
engine writes every data file with `parquet.field.id` metadata
(write_partitioned_batch → with_field_ids), and once the schema history
contains a rename (or a drop-and-readd), reads flip to Spark's
field-id-based column resolution (spark.sql.parquet.fieldId.read) —
the same mechanism jar-backed Iceberg uses. Renames are guarded: every
live file must carry ids (add_files-registered raw parquet may not),
otherwise id-resolution would silently null the file out.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    schema_requires_id_read,
)

from rest_stub import make_server


def _df(spark, n=100):
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % 4).cast("int"))
            ),
        )
        .withColumn("v", F.col("id") * 10)
    )


@pytest.fixture()
def fs_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
    t.append_dataframe(_df(spark))
    return t


class TestRename:
    def test_old_files_resolve_by_field_id(self, spark, fs_table):
        t = fs_table
        sid = t.rename_column("v", "value")
        assert sid == 1
        out = t.read(spark)
        assert out.columns == ["id", "ts", "value"]
        # values come from PRE-rename files — not nulls
        assert out.filter("value = 990").count() == 1
        assert out.select(F.sum("value")).collect()[0][0] == sum(
            i * 10 for i in range(100)
        )

    def test_mixed_old_and_new_files(self, spark, fs_table):
        t = fs_table
        t.rename_column("v", "value")
        t.append_dataframe(
            _df(spark).withColumnRenamed("v", "value").withColumn(
                "id", F.col("id") + 1000
            )
        )
        out = t.read(spark)
        assert out.count() == 200
        assert out.filter("value is null").count() == 0

    def test_guard_rejects_clashes_and_unknowns(self, spark, fs_table):
        with pytest.raises(ValueError, match="already exists"):
            fs_table.rename_column("v", "id")
        with pytest.raises(ValueError, match="no column"):
            fs_table.rename_column("nope", "x")

    def test_rename_refused_when_idless_files_lack_mapping_coverage(
        self, spark, fs_table, tmp_path
    ):
        # add_files now maintains schema.name-mapping.default, so plain
        # id-less registrations no longer block renames (covered in
        # test_name_mapping.py). The refusal survives only for id-less
        # files the mapping cannot cover — e.g. carrying an extra
        # column the table schema never had.
        raw = str(tmp_path / "raw")
        _df(spark, 10).selectExpr("id", "ts", "v").withColumn(
            "mystery", F.lit(1)
        ).write.parquet(raw + "/year=2024/month=3/day=1/hour=0")
        fs_table.add_files_hive(raw)
        with pytest.raises(ValueError, match="unmapped"):
            fs_table.rename_column("v", "value")

    def test_dml_works_on_renamed_table(self, spark, fs_table):
        t = fs_table
        t.rename_column("v", "value")
        _, n = t.delete_where(spark, "value = 50", mode="merge-on-read")
        assert n == 1
        assert t.read(spark).filter("value = 50").count() == 0
        # copy-on-write over id-resolved files keeps the column populated
        _, n2 = t.delete_where(spark, "value < 100")
        assert n2 == 9
        out = t.read(spark)
        assert out.count() == 90
        assert out.filter("value is null").count() == 0

    def test_column_bounds_pruning_survives_rename(self, spark, fs_table):
        # bounds are keyed by field ID in manifests, so a rename keeps
        # value-range file skipping working — including over files whose
        # footers carry the OLD name
        t = fs_table
        t.rename_column("v", "value")
        files, pruned = t.plan_files(column_range=("value", 0, 10))
        assert pruned == 0 or len(files) >= 1  # conservative at minimum
        # a range beyond the data prunes everything boundable
        files_hi, pruned_hi = t.plan_files(column_range=("value", 10_000, None))
        assert pruned_hi >= 1


class TestDrop:
    def test_drop_removes_column_from_reads(self, spark, fs_table):
        t = fs_table
        t.drop_column("v")
        assert t.read(spark).columns == ["id", "ts"]
        # files untouched (metadata-only)
        assert t.read(spark).count() == 100

    def test_partition_source_protected(self, spark, fs_table):
        with pytest.raises(ValueError, match="partition source"):
            fs_table.drop_column("ts")

    def test_readd_does_not_resurrect_old_bytes(self, spark, fs_table):
        t = fs_table
        t.drop_column("v")
        t.add_columns([StructField("v", LongType(), True)])
        assert schema_requires_id_read(t.metadata())
        out = t.read(spark)
        assert out.columns == ["id", "ts", "v"]
        assert out.filter("v is not null").count() == 0
        # new writes fill the re-added column
        t.append_dataframe(_df(spark).withColumn("id", F.col("id") + 1000))
        assert t.read(spark).filter("v is not null").count() == 100

    def test_plain_tables_stay_on_name_resolution(self, spark, fs_table):
        # add-only evolution keeps name-based reads (add_files-friendly)
        fs_table.add_columns([StructField("note", StringType(), True)])
        assert not schema_requires_id_read(fs_table.metadata())


class TestRestParity:
    @pytest.fixture()
    def rest_table(self, spark, tmp_path):
        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        client = RestCatalogClient(uri, warehouse=warehouse)
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        yield t
        server.shutdown()

    def test_rename_and_drop_over_rest(self, spark, rest_table):
        t = rest_table
        sid = t.rename_column("v", "value")
        assert sid == 1
        out = t.read(spark)
        assert out.columns == ["id", "ts", "value"]
        assert out.filter("value is null").count() == 0
        t.drop_column("value")
        assert t.read(spark).columns == ["id", "ts"]
