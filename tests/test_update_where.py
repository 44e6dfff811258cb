"""Row-level copy-on-write UPDATE (`UPDATE SET ... WHERE ...`) on both
catalog transports — completes the DML triad (DELETE / MERGE / UPDATE).

Same 100 TB shape as delete: one tagged scan finds the files containing
matches (paths/counts only to the driver), exactly those files rewrite
with the SET expressions applied via CASE WHEN, untouched files survive
by reference, and the overwrite commit is pinned to the planning base.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

from rest_stub import make_server


def _df(spark, n=200):
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


class TestUpdateWhere:
    def test_matching_rows_updated_others_untouched(self, spark, fs_table):
        t = fs_table
        sid, n = t.update_where(spark, "id < 10", {"v": "v + 1"})
        assert n == 10
        assert t.current_snapshot()["summary"]["operation"] == "overwrite"
        assert t.current_snapshot()["summary"]["updated-records"] == "10"
        out = t.read(spark)
        assert out.count() == 200  # no rows appear or disappear
        assert out.filter("id < 10").select(F.sum("v")).collect()[0][0] == sum(
            i * 10 + 1 for i in range(10)
        )
        assert out.filter("id >= 10").select(F.sum("v")).collect()[0][0] == sum(
            i * 10 for i in range(10, 200)
        )

    def test_untouched_files_survive_by_reference(self, spark, fs_table):
        t = fs_table
        before = {f.file_path for f in t.plan_files()[0]}
        # ids 0..199 over 4 hourly partitions: id%4==0 hits only hour 0
        t.update_where(spark, "id = 0", {"v": "-1"})
        after = {f.file_path for f in t.plan_files()[0]}
        assert len(before & after) == len(before) - 1  # 1 file rewritten

    def test_null_predicate_rows_not_updated(self, spark, tmp_path):
        df = (
            _df(spark, 10)
            .withColumn("flag", F.when(F.col("id") < 5, F.col("id") > 2))
        )  # flag NULL for id>=5
        cat = FsCatalog(str(tmp_path / "wh2"))
        t = cat.create_table("otel", "nulls", df.schema, partition_source="ts")
        t.append_dataframe(df)
        sid, n = t.update_where(spark, "flag", {"v": "-99"})
        assert n == 2  # ids 3,4 — NULL evaluations excluded
        assert t.read(spark).filter("v = -99").count() == 2

    def test_set_partition_source_moves_rows(self, spark, fs_table):
        t = fs_table
        sid, n = t.update_where(
            spark, "id = 7", {"ts": "timestamp'2024-06-01 00:00:00'"}
        )
        assert n == 1
        moved = t.read(spark).filter("id = 7").collect()[0]
        assert str(moved["ts"]).startswith("2024-06-01")
        # the rewritten row landed in a new hidden partition
        data, _, _ = t.plan_scan()
        hours = {f.partition.get("ts_hour") for f in data}
        june_hour = next(
            f.partition["ts_hour"]
            for f in data
            if f.partition.get("ts_hour") and f.partition["ts_hour"] > 475_000
        )
        assert june_hour in hours

    def test_unknown_set_column_rejected(self, spark, fs_table):
        with pytest.raises(ValueError, match="unknown column"):
            fs_table.update_where(spark, "id = 1", {"nope": "1"})

    def test_no_match_is_noop(self, spark, fs_table):
        pre = fs_table.current_snapshot()["snapshot-id"]
        sid, n = fs_table.update_where(spark, "id = -5", {"v": "0"})
        assert sid is None and n == 0
        assert fs_table.current_snapshot()["snapshot-id"] == pre

    def test_update_skips_mor_deleted_rows(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id = 3", mode="merge-on-read")
        sid, n = t.update_where(spark, "id < 10", {"v": "v + 1"})
        assert n == 9  # deleted row not counted
        out = t.read(spark)
        assert out.count() == 199
        assert out.filter("id = 3").count() == 0  # still deleted post-rewrite

    def test_time_travel_sees_pre_update_values(self, spark, fs_table):
        t = fs_table
        pre = t.current_snapshot()["snapshot-id"]
        t.update_where(spark, "id = 0", {"v": "-1"})
        assert t.read(spark, snapshot_id=pre).filter("id = 0").collect()[0]["v"] == 0
        assert t.read(spark).filter("id = 0").collect()[0]["v"] == -1


class TestUpdateMergeOnRead:
    def test_row_delta_no_file_rewritten(self, spark, fs_table):
        t = fs_table
        before = {f.file_path for f in t.plan_files()[0]}
        sid, n = t.update_where(spark, "id < 10", {"v": "v + 1"}, mode="merge-on-read")
        assert n == 10
        after = {f.file_path for f in t.plan_files()[0]}
        assert before <= after  # old files all still live, new ones appended
        _, dels, _ = t.plan_scan()
        assert sum(f.record_count for f in dels) == 10
        out = t.read(spark)
        assert out.count() == 200
        assert out.filter("id < 10").select(F.sum("v")).collect()[0][0] == sum(
            i * 10 + 1 for i in range(10)
        )
        assert t.current_snapshot()["summary"]["operation"] == "overwrite"

    def test_second_mor_update_shadows_first(self, spark, fs_table):
        t = fs_table
        t.update_where(spark, "id = 5", {"v": "100"}, mode="merge-on-read")
        t.update_where(spark, "id = 5", {"v": "200"}, mode="merge-on-read")
        rows = t.read(spark).filter("id = 5").collect()
        assert len(rows) == 1 and rows[0]["v"] == 200

    def test_fold_after_mor_update(self, spark, fs_table):
        t = fs_table
        t.update_where(spark, "id < 10", {"v": "-1"}, mode="merge-on-read")
        t.rewrite_position_deletes(spark)
        _, dels, _ = t.plan_scan()
        assert dels == []
        out = t.read(spark)
        assert out.count() == 200
        assert out.filter("v = -1").count() == 10

    def test_mor_merge_row_delta(self, spark, fs_table):
        t = fs_table
        src = (
            _df(spark)
            .filter("id >= 195 or id < 3")
            .withColumn("v", F.lit(-7).cast("long"))
        )
        extra = _df(spark, 5).withColumn("id", F.col("id") + 1000).withColumn(
            "v", F.lit(-7).cast("long")
        )
        before = {f.file_path for f in t.plan_files()[0]}
        sid, upd, ins = t.merge_rows(spark, src.union(extra), ["id"], mode="merge-on-read")
        assert (upd, ins) == (8, 5)
        assert before <= {f.file_path for f in t.plan_files()[0]}
        out = t.read(spark)
        assert out.count() == 205
        assert out.filter("v = -7").count() == 13
        # old versions shadowed, not duplicated
        assert out.groupBy("id").count().filter("count > 1").count() == 0


class TestUpdateCli:
    def test_update_cli(self, spark, fs_table, capsys):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        wh = os.path.dirname(os.path.dirname(fs_table.location))
        rc = main(
            [
                "update",
                "--warehouse", wh,
                "--table", "ev",
                "--where", "id < 5",
                "--set", "v = v * 100",
            ]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["updated_rows"] == 5
        assert fs_table.read(spark).filter("v = 400").count() == 1


class TestRestUpdate:
    def test_update_over_rest(self, spark, tmp_path):
        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "ev", _df(spark).schema, partition_source="ts")
            t.append_dataframe(_df(spark))
            sid, n = t.update_where(spark, "id < 10", {"v": "v + 1"})
            assert n == 10
            out = t.read(spark)
            assert out.count() == 200
            assert out.filter("id < 10").select(F.sum("v")).collect()[0][0] == sum(
                i * 10 + 1 for i in range(10)
            )
            # merge-on-read row-delta over REST
            sid2, n2 = t.update_where(
                spark, "id >= 190", {"v": "-1"}, mode="merge-on-read"
            )
            assert n2 == 10
            out = t.read(spark)
            assert out.count() == 200
            assert out.filter("v = -1").count() == 10
            # MoR merge over REST
            src = _df(spark, 5).withColumn("id", F.col("id") + 5000)
            sid3, upd, ins = t.merge_rows(spark, src, ["id"], mode="merge-on-read")
            assert (upd, ins) == (0, 5)
            assert t.read(spark).count() == 205
        finally:
            server.shutdown()
