"""Puffin column-NDV statistics (sinks/puffin.py): container byte
format, KMV sketch math, catalog integration on both transports,
expiry cleanup, CLI."""

from __future__ import annotations

import json
import os
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog
from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
    KMV_BLOB_TYPE,
    KMV_K,
    decode_kmv,
    encode_kmv,
    kmv_estimate,
    read_puffin,
    write_puffin,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("category", StringType(), True),
        StructField("score", IntegerType(), True),
    ]
)


def _table(tmp_path, name="events"):
    return FsCatalog(str(tmp_path / "wh")).create_table("stats", name, SCHEMA)


def _df(spark, n=200, cats=7):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("cat-"), (F.col("id") % cats).cast("string")).alias(
            "category"
        ),
        (F.col("id") % 50).cast("int").alias("score"),
    )


class TestContainer:
    def test_roundtrip_two_blobs(self, tmp_path):
        path = str(tmp_path / "f.puffin")
        frag = write_puffin(
            path,
            [
                {
                    "type": KMV_BLOB_TYPE,
                    "fields": [1],
                    "snapshot-id": 10,
                    "sequence-number": 1,
                    "payload": b"abc",
                    "properties": {"ndv": "3"},
                },
                {
                    "type": "other-blob",
                    "fields": [2, 3],
                    "snapshot-id": 10,
                    "sequence-number": 1,
                    "payload": b"xyzw",
                },
            ],
            {"created-by": "t"},
        )
        meta, payloads = read_puffin(path)
        assert payloads == [b"abc", b"xyzw"]
        assert meta["properties"] == {"created-by": "t"}
        b0, b1 = meta["blobs"]
        assert b0["offset"] == 4 and b0["length"] == 3
        assert b1["offset"] == 7 and b1["length"] == 4
        assert b1["fields"] == [2, 3]
        assert frag["file-size-in-bytes"] == os.path.getsize(path)
        # footer size covers Magic..Magic exactly
        with open(path, "rb") as f:
            data = f.read()
        footer = data[-frag["file-footer-size-in-bytes"] :]
        assert footer[:4] == b"PFA1" and footer[-4:] == b"PFA1"

    def test_bad_magic_rejected(self, tmp_path):
        p = str(tmp_path / "bad")
        with open(p, "wb") as f:
            f.write(b"nope" * 10)
        with pytest.raises(ValueError, match="bad magic"):
            read_puffin(p)

    def test_compressed_footer_flag_rejected(self, tmp_path):
        path = str(tmp_path / "f.puffin")
        write_puffin(path, [], {})
        with open(path, "r+b") as f:
            f.seek(-8, os.SEEK_END)
            f.write(b"\x01")  # set the footer-compressed bit
        with pytest.raises(ValueError, match="compressed footer"):
            read_puffin(path)

    def test_empty_blob_list(self, tmp_path):
        path = str(tmp_path / "f.puffin")
        write_puffin(path, [])
        meta, payloads = read_puffin(path)
        assert meta["blobs"] == [] and payloads == []


class TestKmv:
    def test_codec_roundtrip(self):
        hs = [5, 1, 9, 3]
        k, out = decode_kmv(encode_kmv(hs, k=8))
        assert k == 8 and out == [1, 3, 5, 9]

    def test_truncates_to_k(self):
        hs = list(range(100, 0, -1))
        k, out = decode_kmv(encode_kmv(hs, k=10))
        assert out == list(range(1, 11))

    def test_estimate_exact_below_k(self):
        assert kmv_estimate(64, [1, 2, 3]) == 3.0

    def test_estimate_accuracy_uniform(self):
        # 10_000 evenly spread hashes over the 60-bit space, k=64
        space = 1 << 60
        n = 10_000
        hashes = sorted((i * space) // n for i in range(1, n + 1))
        est = kmv_estimate(KMV_K, hashes[:KMV_K])
        assert abs(est - n) / n < 0.02  # deterministic grid -> tight


class TestCatalogIntegration:
    def test_compute_and_read(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark))
        entry = t.compute_column_stats(spark)
        assert entry["snapshot-id"] == t.metadata()["current-snapshot-id"]
        assert os.path.exists(entry["statistics-path"])
        assert entry["statistics-path"].endswith(".puffin")
        stats = t.column_stats()
        assert stats["id"]["ndv"] == 200
        assert stats["category"]["ndv"] == 7
        assert stats["score"]["ndv"] == 50
        # below-k columns: sketch IS the distinct hash set, estimate exact
        assert stats["category"]["estimate"] == 7.0
        assert stats["score"]["estimate"] == 50.0
        # 200 > k=64: sketch capped, estimate within KMV error
        assert len(stats["id"]["sketch"]) == KMV_K
        assert abs(stats["id"]["estimate"] - 200) / 200 < 0.5
        assert stats["id"]["sketch"] == sorted(stats["id"]["sketch"])

    def test_recompute_replaces_entry(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=50))
        t.compute_column_stats(spark)
        t.compute_column_stats(spark)
        assert len(t.metadata()["statistics"]) == 1

    def test_stats_after_delete_reflect_deletes(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=100, cats=10))
        t.delete_where(spark, "category = 'cat-3'")
        t.compute_column_stats(spark)
        stats = t.column_stats()
        assert stats["category"]["ndv"] == 9
        assert stats["id"]["ndv"] == 90

    def test_column_subset_and_unknown(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=30))
        entry = t.compute_column_stats(spark, columns=["category"])
        assert len(entry["blob-metadata"]) == 1
        assert t.column_stats() == {
            "category": t.column_stats()["category"]
        }
        with pytest.raises(ValueError, match="no such primitive"):
            t.compute_column_stats(spark, columns=["nope"])

    def test_per_snapshot_entries_and_time_travel(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=40, cats=4))
        s1 = t.metadata()["current-snapshot-id"]
        t.compute_column_stats(spark)
        t.append_dataframe(_df(spark, n=40, cats=4).withColumn(
            "id", F.col("id") + 1000
        ))
        t.compute_column_stats(spark)
        assert len(t.metadata()["statistics"]) == 2
        assert t.column_stats(snapshot_id=s1)["id"]["ndv"] == 40
        assert t.column_stats()["id"]["ndv"] == 80

    def test_expiry_drops_entry_and_file(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=20))
        s1 = t.metadata()["current-snapshot-id"]
        e1 = t.compute_column_stats(spark)
        t.append_dataframe(_df(spark, n=20))
        t.compute_column_stats(spark)
        t.expire_snapshots(keep_last=1)
        md = t.metadata()
        assert [e["snapshot-id"] for e in md["statistics"]] != [s1]
        assert len(md["statistics"]) == 1
        assert not os.path.exists(e1["statistics-path"])
        with pytest.raises(FileNotFoundError):
            t.column_stats(snapshot_id=s1)

    def test_empty_table_returns_none(self, spark, tmp_path):
        t = _table(tmp_path)
        assert t.compute_column_stats(spark) is None

    def test_missing_stats_raises(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=5))
        with pytest.raises(FileNotFoundError, match="no statistics file"):
            t.column_stats()


class TestMergeKmv:
    def test_complete_union_is_exact(self):
        from opentelemetry_iceberg_exporter_spark.sinks.puffin import merge_kmv

        k, merged, exact = merge_kmv([(8, [1, 5]), (8, [5, 9, 12])])
        assert (k, merged, exact) == (8, [1, 5, 9, 12], 4)

    def test_saturated_part_loses_exactness(self):
        from opentelemetry_iceberg_exporter_spark.sinks.puffin import merge_kmv

        k, merged, exact = merge_kmv([(3, [1, 5, 9]), (8, [2])])  # first is full
        assert exact is None
        assert k == 3 and merged == [1, 2, 5]


class TestIncrementalStats:
    def test_append_only_refresh_is_exact_below_k(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=20, cats=4))
        t.compute_column_stats(spark)
        # new batch: 10 overlapping + 10 new ids, two new categories
        t.append_dataframe(
            spark.range(10, 30).select(
                F.col("id"),
                F.concat(F.lit("cat-"), (F.col("id") % 6).cast("string")).alias(
                    "category"
                ),
                (F.col("id") % 50).cast("int").alias("score"),
            )
        )
        entry = t.update_column_stats_incremental(spark)
        assert entry["snapshot-id"] == t.metadata()["current-snapshot-id"]
        stats = t.column_stats()
        assert stats["category"]["ndv"] == 6 and stats["category"]["exact"]
        assert stats["id"]["ndv"] == 30 and stats["id"]["exact"]
        assert stats["score"]["ndv"] == 30 and stats["score"]["exact"]

    def test_saturation_degrades_to_estimate(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=100))  # id ndv 100 > k=64
        t.compute_column_stats(spark)
        t.append_dataframe(
            _df(spark, n=100).withColumn("id", F.col("id") + 100)
        )
        t.update_column_stats_incremental(spark)
        stats = t.column_stats()
        assert not stats["id"]["exact"]
        assert abs(stats["id"]["ndv"] - 200) / 200 < 0.5
        # category stayed complete -> still exact
        assert stats["category"]["ndv"] == 7 and stats["category"]["exact"]

    def test_requires_seed(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=10))
        with pytest.raises(FileNotFoundError, match="seed"):
            t.update_column_stats_incremental(spark)

    def test_noop_when_current_has_stats(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=10))
        seeded = t.compute_column_stats(spark)
        again = t.update_column_stats_incremental(spark)
        assert again["statistics-path"] == seeded["statistics-path"]
        assert len(t.metadata()["statistics"]) == 1

    def test_delete_in_window_raises(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=20))
        t.compute_column_stats(spark)
        t.delete_where(spark, "id < 5")
        with pytest.raises(ValueError, match="incremental"):
            t.update_column_stats_incremental(spark)

    def test_incremental_over_rest(self, spark, tmp_path):
        from rest_stub import make_server
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            cat = RestCatalogClient(uri, warehouse=warehouse)
            cat.ensure_namespace("stats")
            t = cat.ensure_table("stats", "events", SCHEMA)
            t.append_dataframe(_df(spark, n=20, cats=4))
            t.compute_column_stats(spark)
            t.append_dataframe(
                _df(spark, n=20, cats=4).withColumn("id", F.col("id") + 20)
            )
            entry = t.update_column_stats_incremental(spark)
            assert entry["snapshot-id"] == t.metadata()["current-snapshot-id"]
            stats = t.column_stats()
            assert stats["id"]["ndv"] == 40 and stats["id"]["exact"]
        finally:
            server.shutdown()


class TestRestParity:
    def test_compute_read_expire_over_rest(self, spark, tmp_path):
        from rest_stub import make_server
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            cat = RestCatalogClient(uri, warehouse=warehouse)
            cat.ensure_namespace("stats")
            t = cat.ensure_table("stats", "events", SCHEMA)
            t.append_dataframe(_df(spark, n=60, cats=6))
            entry = t.compute_column_stats(spark)
            assert entry is not None
            stats = t.column_stats()
            assert stats["category"]["ndv"] == 6
            assert stats["id"]["ndv"] == 60
            # second snapshot + expiry cleans server-side entry + file
            t.append_dataframe(_df(spark, n=10))
            t.compute_column_stats(spark)
            t.expire_snapshots(keep_last=1)
            assert len(t.metadata()["statistics"]) == 1
            assert not os.path.exists(entry["statistics-path"])
        finally:
            server.shutdown()


class TestInspection:
    def test_statistics_metadata_table(self, spark, tmp_path):
        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=30, cats=3))
        entry = t.compute_column_stats(spark)
        rows = t.metadata_table(spark, "statistics").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["snapshot_id"] == entry["snapshot-id"]
        assert r["statistics_path"] == entry["statistics-path"]
        assert r["blob_types"] == [KMV_BLOB_TYPE] * 3
        # field id 2 = category
        assert r["ndv_by_field_id"]["2"] == "3"

    def test_statistics_table_empty(self, spark, tmp_path):
        t = _table(tmp_path)
        assert t.metadata_table(spark, "statistics").count() == 0


class TestCli:
    def test_maintain_incremental_column_stats(self, spark, tmp_path, capsys):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=10, cats=2))
        t.compute_column_stats(spark)
        t.append_dataframe(
            _df(spark, n=10, cats=2).withColumn("id", F.col("id") + 10)
        )
        rc = main(
            [
                "maintain", "--warehouse", str(tmp_path / "wh"),
                "--namespace", "stats", "--table", "events",
                "--incremental-column-stats",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["column_stats"].endswith(".puffin")
        assert t.column_stats()["id"]["ndv"] == 20

    def test_column_stats_reader_cli(self, spark, tmp_path, capsys):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=12, cats=3))
        t.compute_column_stats(spark)
        rc = main(
            [
                "column-stats", "--warehouse", str(tmp_path / "wh"),
                "--namespace", "stats", "--table", "events",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["category"]["ndv"] == 3 and out["category"]["exact"]
        assert out["id"]["sketch_size"] == 12

    def test_maintain_column_stats(self, spark, tmp_path, capsys):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        t = _table(tmp_path)
        t.append_dataframe(_df(spark, n=25, cats=5))
        rc = main(
            [
                "maintain",
                "--warehouse", str(tmp_path / "wh"),
                "--namespace", "stats",
                "--table", "events",
                "--column-stats",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["column_stats"] and out["column_stats"].endswith(".puffin")
        assert t.column_stats()["category"]["ndv"] == 5
