"""Iceberg v3 DEFAULT VALUES: `add_columns(..., defaults={...})` sets a
column's initial-default (what rows in PRE-evolution files read — the
column is physically absent from their Parquet) and write-default (what
writers store when omitting the column).

The spec's file-PRESENCE rule is the point: a post-evolution file that
stores a genuine NULL must keep reading NULL — a blanket coalesce over
the whole scan would repaint stored nulls with the default. Reads split
files by footer presence of the defaulted columns (one footer-metadata
read per file, paid only on tables whose schema declares defaults).
Both transports; v2 tables refuse."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

from rest_stub import make_server


def _df(spark, n=20, base=0):
    return (
        spark.range(base, base + n)
        .withColumn("ts", F.to_timestamp(F.lit("2024-03-01 00:00:00")))
        .withColumn("v", F.lit("a"))
    )


@pytest.fixture()
def v3_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "dflt", _df(spark).schema, partition_source="ts")
    t.upgrade_format_version(3)
    t.append_dataframe(_df(spark, 10))  # pre-evolution file
    return t


class TestDefaults:
    def test_initial_default_applies_to_pre_evolution_files_only(
        self, spark, v3_table
    ):
        t = v3_table
        t.add_columns(
            [StructField("quality", LongType(), True)], defaults={"quality": 7}
        )
        # pre-evolution rows read the default
        rows = t.read(spark).collect()
        assert all(r["quality"] == 7 for r in rows)
        # a post-evolution file storing a GENUINE NULL keeps its null
        t.append_dataframe(
            _df(spark, 5, base=100).withColumn(
                "quality", F.lit(None).cast("long")
            )
        )
        got = {r["id"]: r["quality"] for r in t.read(spark).collect()}
        assert all(got[i] == 7 for i in range(10))
        assert all(got[i] is None for i in range(100, 105))

    def test_write_default_fills_omitted_columns(self, spark, v3_table):
        t = v3_table
        t.add_columns(
            [StructField("source", StringType(), True)],
            defaults={"source": "otlp"},
        )
        # writer omits the column entirely -> write-default stored
        t.append_dataframe(_df(spark, 5, base=200))
        got = {r["id"]: r["source"] for r in t.read(spark).collect()}
        assert all(got[i] == "otlp" for i in range(10))  # initial-default
        assert all(got[i] == "otlp" for i in range(200, 205))  # write-default

    def test_defaults_survive_cow_rewrite_and_changelog(self, spark, v3_table):
        t = v3_table
        t.add_columns(
            [StructField("quality", LongType(), True)], defaults={"quality": 7}
        )
        # a CoW rewrite MATERIALIZES the default into the new file
        t.delete_where(spark, "id = 3", mode="copy-on-write")
        rows = t.read(spark).collect()
        assert len(rows) == 9 and all(r["quality"] == 7 for r in rows)
        # metadata-level sanity: the rewritten file physically HAS the col
        import pyarrow.parquet as pq

        data, _, _ = t.plan_scan()
        assert all("quality" in pq.read_schema(f.file_path).names for f in data)

    def test_v2_refuses_defaults(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh2"))
        t = cat.create_table("otel", "v2d", _df(spark).schema)
        t.append_dataframe(_df(spark, 5))
        with pytest.raises(ValueError, match="v3"):
            t.add_columns(
                [StructField("q", LongType(), True)], defaults={"q": 1}
            )

    def test_default_validation(self, spark, v3_table):
        t = v3_table
        with pytest.raises(ValueError, match="does not fit"):
            t.add_columns(
                [StructField("q", LongType(), True)], defaults={"q": "nope"}
            )
        with pytest.raises(ValueError, match="not being added"):
            t.add_columns(
                [StructField("q", LongType(), True)], defaults={"ghost": 1}
            )

    def test_defaults_compose_with_lineage(self, spark, v3_table):
        t = v3_table
        t.add_columns(
            [StructField("quality", LongType(), True)], defaults={"quality": 7}
        )
        rows = t.read(spark, with_lineage=True).collect()
        assert all(r["quality"] == 7 for r in rows)
        assert sorted(r["_row_id"] for r in rows) == list(range(10))


class TestRestDefaults:
    def test_rest_roundtrip(self, spark, tmp_path):
        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "dflt", _df(spark).schema,
                                    partition_source="ts")
            t.append_dataframe(_df(spark, 10))
            with pytest.raises(ValueError, match="v3"):
                t.add_columns(
                    [StructField("q", LongType(), True)], defaults={"q": 1}
                )
            t.upgrade_format_version(3)
            t.add_columns(
                [StructField("q", LongType(), True)], defaults={"q": 1}
            )
            t.append_dataframe(_df(spark, 5, base=100))  # omits q
            got = {r["id"]: r["q"] for r in t.read(spark).collect()}
            assert all(v == 1 for v in got.values())
            assert len(got) == 15
        finally:
            server.shutdown()
