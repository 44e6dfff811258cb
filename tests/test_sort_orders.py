"""Declared write sort orders (Iceberg `sort-orders` metadata):
`sort_by` at create records the order (identity asc, nulls-first,
order-id 1) and every append physically sorts rows inside each data
file — which is what makes manifest min/max bounds on the sort columns
sharp for file skipping. Pinned on: metadata shape, per-file
monotonicity of written Parquet, bounds-pruning improvement vs an
unsorted table, and REST parity (CreateTableRequest.write-order)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    default_sort_fields,
)

from rest_stub import make_server


def _df(spark, n=200, hours=2):
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % hours).cast("int"))
            ),
        )
        .withColumn("v", (F.col("id") * 7919) % 1000)  # scrambled values
        .select("id", "ts", "v")
    )


def _file_is_sorted(path: str, col: str) -> bool:
    import pyarrow.parquet as pq

    vals = pq.read_table(path, columns=[col])[col].to_pylist()
    return vals == sorted(vals)


class TestFsSortOrder:
    def test_metadata_shape_and_sorted_files(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "sorted", _df(spark).schema, partition_source="ts", sort_by=["v"]
        )
        md = t.metadata()
        assert md["default-sort-order-id"] == 1
        fields = default_sort_fields(md)
        assert fields[0]["transform"] == "identity"
        assert fields[0]["direction"] == "asc"
        vid = next(
            f["id"] for f in md["schemas"][0]["fields"] if f["name"] == "v"
        )
        assert fields[0]["source-id"] == vid
        t.append_dataframe(_df(spark))
        data, _, _ = t.plan_scan()
        assert data
        for f in data:
            assert _file_is_sorted(f.file_path, "v")

    def test_unsorted_default_unchanged(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh2"))
        t = cat.create_table("otel", "plain", _df(spark).schema, partition_source="ts")
        md = t.metadata()
        assert md["default-sort-order-id"] == 0
        assert default_sort_fields(md) == []

    def test_unknown_sort_column_refused(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh3"))
        with pytest.raises(ValueError, match="no column"):
            cat.create_table(
                "otel", "bad", _df(spark).schema, partition_source="ts",
                sort_by=["nope"],
            )

    def test_sorted_table_prunes_harder_on_sort_column(self, spark, tmp_path):
        """With fanout splitting each partition into several files, a
        sorted write gives disjoint per-file v-ranges — a narrow
        column_range then skips files the unsorted layout cannot."""
        cat = FsCatalog(str(tmp_path / "wh4"))
        kw = dict(partition_source="ts")
        ts_ = cat.create_table("otel", "s", _df(spark).schema, sort_by=["v"], **kw)
        tu = cat.create_table("otel", "u", _df(spark).schema, **kw)
        ts_.append_dataframe(_df(spark), fanout=4)
        tu.append_dataframe(_df(spark), fanout=4)
        rng = ("v", 0, 99)
        _, pruned_sorted = ts_.plan_files(column_range=rng)
        _, pruned_unsorted = tu.plan_files(column_range=rng)
        assert pruned_sorted > pruned_unsorted
        # correctness identical either way
        a = ts_.read(spark, column_range=rng).filter("v <= 99").count()
        b = tu.read(spark, column_range=rng).filter("v <= 99").count()
        assert a == b > 0


class TestRestSortOrder:
    def test_write_order_over_rest(self, spark, tmp_path):
        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri)
            client.ensure_namespace("otel")
            t = client.ensure_table(
                "otel", "sorted", _df(spark).schema,
                partition_source="ts", sort_by=["v"],
            )
            md = t.metadata()
            assert md["default-sort-order-id"] == 1
            t.append_dataframe(_df(spark))
            data, _ = t.plan_files()
            assert data
            for f in data:
                assert _file_is_sorted(f.file_path, "v")
        finally:
            server.shutdown()


class TestWriteCodecProperty:
    def test_table_compression_property_honored(self, spark, tmp_path):
        import glob as glob_mod

        cat = FsCatalog(str(tmp_path / "whz"))
        t = cat.create_table(
            "otel", "z", _df(spark).schema, partition_source="ts",
            properties={"write.parquet.compression-codec": "zstd"},
        )
        t.append_dataframe(_df(spark))
        files = glob_mod.glob(os.path.join(t.location, "data", "**", "*.parquet"),
                              recursive=True)
        assert files and all(".zstd." in os.path.basename(f) for f in files)
        assert t.read(spark).count() == 200

    def test_bloom_filter_property_honored(self, spark, tmp_path):
        """write.parquet.bloom-filter-enabled.column.<col> (Iceberg write
        property) puts a parquet bloom filter on that column — verified
        by the filter bytes the enabled file carries beyond the plain
        twin (pyarrow's metadata API doesn't surface bloom offsets)."""
        import glob as glob_mod

        cat = FsCatalog(str(tmp_path / "whb"))
        df = spark.range(50000).selectExpr(
            "cast(id as string) as doc_id", "id as v"
        ).coalesce(1)
        plain = cat.create_table("otel", "plain", df.schema)
        bloom = cat.create_table(
            "otel",
            "bloom",
            df.schema,
            properties={"write.parquet.bloom-filter-enabled.column.doc_id": "true"},
        )
        plain.append_dataframe(df)
        bloom.append_dataframe(df)

        def total(t):
            return sum(
                os.path.getsize(p)
                for p in glob_mod.glob(
                    os.path.join(t.location, "data", "**", "*.parquet"),
                    recursive=True,
                )
            )

        assert total(bloom) > total(plain) + 50_000  # the filter bytes
        assert bloom.read(spark).count() == 50000
        got = bloom.read(spark).filter("doc_id = '123'")
        assert got.count() == 1  # scans with the filter present stay exact


class TestCompactionKeepsWriteProperties:
    def test_rewrite_data_files_keeps_codec_and_blooms(self, spark, tmp_path):
        """Compaction must write under the table's parquet properties
        like any append: before this pin the first rewrite_data_files
        silently dropped declared bloom filters (killing point-lookup
        pruning on consolidated files) and reverted the codec."""
        import glob as glob_mod

        from opentelemetry_iceberg_exporter_spark.sinks.parquet_footer import (
            footer_row_group_stats,
        )

        cat = FsCatalog(str(tmp_path / "whc"))

        # high-cardinality ids: a fully dictionary-encoded chunk makes
        # the writer legitimately skip the bloom (the dictionary is an
        # exact filter), so the pin needs values that overflow the dict
        def _df_at(offset: int):
            return spark.range(50000).selectExpr(
                f"md5(cast(id + {offset} as string)) as doc_id", "id as v"
            ).coalesce(1)

        t = cat.create_table(
            "otel",
            "cmp",
            _df_at(0).schema,
            properties={
                "write.parquet.compression-codec": "zstd",
                "write.parquet.bloom-filter-enabled.column.doc_id": "true",
            },
        )
        for i in range(3):  # three small files -> compactable
            t.append_dataframe(_df_at(i * 50000))
        assert t.rewrite_data_files(spark, min_files=2) is not None
        live, _ = t.plan_files()
        assert len(live) == 1  # consolidated
        f = live[0].file_path
        assert ".zstd." in os.path.basename(f)
        groups = footer_row_group_stats(f)
        assert groups and all(
            g["columns"]["doc_id"].get("bloom_offset") is not None
            for g in groups
        )
        assert t.read(spark).count() == 150000
