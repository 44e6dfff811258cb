"""Iceberg v2 merge-on-read EQUALITY deletes, on both catalog
transports.

Position deletes need a predicate SCAN to locate (file_path, pos)
tuples; equality deletes (spec: "Equality Delete Files") need NOTHING
from the table — the delete commit writes only the key VALUES plus
`equality_ids`, so deleting a key set from a 100 TB corpus costs
O(keys). The strict sequence-number rule (a delete applies only to data
files with seq STRICTLY below the delete's) is what makes single-commit
CDC upserts possible: new data + an equality delete on its keys share
one sequence number, so old versions vanish and the new rows survive.
These tests pin the match semantics (null-safe equality, multi-column
keys, strict seq ordering), the upsert path, the interplay with
position deletes / copy-on-write DML / compaction / delete folding, and
REST parity.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import read_ocf
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
)

from rest_stub import make_server


def _df(spark, n=200, hours=4, tag="a"):
    return (
        spark.range(n)
        .withColumn(
            "ts",
            F.to_timestamp(
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(hours=(F.col("id") % hours).cast("int"))
            ),
        )
        .withColumn("v", F.col("id") * 10)
        .withColumn("tag", F.lit(tag))
    )


@pytest.fixture()
def fs_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "events", _df(spark).schema, partition_source="ts")
    t.append_dataframe(_df(spark))
    return t


class TestEqualityDelete:
    def test_no_table_read_and_rows_subtracted(self, spark, fs_table):
        t = fs_table
        pre = t.current_snapshot()["snapshot-id"]
        before = sorted(f.file_path for f in t.plan_files()[0])
        keys = spark.createDataFrame([(3,), (77,), (150,)], "id long")
        sid, n = t.delete_where_equality(spark, keys, ["id"])
        assert n == 3
        # data files untouched; one content=2 delete file committed
        assert sorted(f.file_path for f in t.plan_files()[0]) == before
        _, deletes, _ = t.plan_scan()
        assert [f.content for f in deletes] == [2]
        assert deletes[0].equality_ids is not None
        s = t.current_snapshot()["summary"]
        assert s["operation"] == "delete"
        assert s["added-delete-files"] == "1"
        assert s["added-equality-deletes"] == "3"
        assert s["deleted-key-tuples"] == "3"
        assert t.read(spark).count() == 197
        assert t.read(spark).filter("id in (3, 77, 150)").count() == 0
        # time travel still sees the rows
        assert t.read(spark, snapshot_id=pre).count() == 200

    def test_strict_sequence_reinsert_survives(self, spark, fs_table):
        t = fs_table
        keys = spark.createDataFrame([(5,)], "id long")
        t.delete_where_equality(spark, keys, ["id"])
        assert t.read(spark).filter("id = 5").count() == 0
        # re-insert AFTER the delete: higher sequence number -> survives
        t.append_dataframe(_df(spark, n=10, tag="reborn").filter("id = 5"))
        rows = t.read(spark).filter("id = 5").collect()
        assert len(rows) == 1 and rows[0]["tag"] == "reborn"
        # and rows in OLDER files stay deleted
        assert t.read(spark).count() == 200

    def test_duplicate_keys_dedup_and_empty_keys_noop(self, spark, fs_table):
        t = fs_table
        keys = spark.createDataFrame([(9,), (9,), (9,)], "id long")
        sid, n = t.delete_where_equality(spark, keys, ["id"])
        assert n == 1  # distinct key tuples
        assert t.read(spark).count() == 199
        sid2, n2 = t.delete_where_equality(
            spark, spark.createDataFrame([], "id long"), ["id"]
        )
        assert sid2 is None and n2 == 0

    def test_multi_column_keys_and_null_matching(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        df = spark.createDataFrame(
            [(1, "x", 10), (1, None, 20), (2, "x", 30), (2, "y", 40)],
            "k long, s string, v long",
        )
        t = cat.create_table("otel", "kv", df.schema)
        t.append_dataframe(df)
        # (1, NULL) must match the null row (null-safe equality), and
        # (2, 'x') only that exact pair
        keys = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
        sid, n = t.delete_where_equality(spark, keys, ["k", "s"])
        assert n == 2
        left = {(r["k"], r["s"]) for r in t.read(spark).collect()}
        assert left == {(1, "x"), (2, "y")}

    def test_rejects_float_and_unknown_columns(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        df = spark.createDataFrame([(1, 2.5)], "k long, x double")
        t = cat.create_table("otel", "f", df.schema)
        t.append_dataframe(df)
        with pytest.raises(ValueError, match="floating-point"):
            t.delete_where_equality(spark, df.select("x"), ["x"])
        with pytest.raises(ValueError, match="no column"):
            t.delete_where_equality(spark, df.select("k"), ["nope"])

    def test_equality_ids_recorded_in_manifest(self, spark, fs_table):
        t = fs_table
        t.delete_where_equality(
            spark, spark.createDataFrame([(1,)], "id long"), ["id"]
        )
        snap = t.current_snapshot()
        _, _, manifests = read_ocf(snap["manifest-list"])
        delete_manifests = [m for m in manifests if m["content"] == 1]
        assert len(delete_manifests) == 1
        _, _, entries = read_ocf(delete_manifests[0]["manifest_path"])
        d = entries[0]["data_file"]
        assert d["content"] == 2
        id_field = next(
            f_["id"]
            for f_ in t.metadata()["schemas"][0]["fields"]
            if f_["name"] == "id"
        )
        assert d["equality_ids"] == [id_field]


    def test_files_metadata_table_shows_equality_file(self, spark, fs_table):
        t = fs_table
        t.delete_where_equality(
            spark, spark.createDataFrame([(1,)], "id long"), ["id"]
        )
        rows = t.metadata_table(spark, "files").filter("content = 2").collect()
        assert len(rows) == 1
        assert list(rows[0]["equality_ids"] or []) != []
        assert rows[0]["sequence_number"] == t.current_snapshot()["sequence-number"]
        # data files keep their append-time sequence number
        data_rows = t.metadata_table(spark, "files").filter("content = 0").collect()
        assert all(r["sequence_number"] == 1 for r in data_rows)


class TestUpsert:
    def test_single_snapshot_upsert(self, spark, fs_table):
        t = fs_table
        n_snaps_before = len(t.snapshots())
        batch = _df(spark, n=20, tag="new").withColumn("v", F.col("id") * 1000)
        sid = t.upsert_equality(spark, batch, ["id"])
        # ONE snapshot: data + equality delete together
        assert len(t.snapshots()) == n_snaps_before + 1
        s = t.current_snapshot()["summary"]
        assert s["operation"] == "overwrite"
        assert s["upserted-records"] == "20"
        out = t.read(spark)
        assert out.count() == 200  # 20 replaced in place, no dupes
        assert out.filter("id < 20 and v = id * 1000").count() == 20
        assert out.filter("id >= 20 and v = id * 10").count() == 180

    def test_chained_upserts_latest_wins(self, spark, fs_table):
        t = fs_table
        for i in (1, 2, 3):
            batch = _df(spark, n=5, tag=f"u{i}").withColumn(
                "v", F.col("id") + F.lit(i * 100)
            )
            t.upsert_equality(spark, batch, ["id"])
        out = t.read(spark).filter("id < 5").collect()
        assert len(out) == 5
        assert all(r["tag"] == "u3" and r["v"] == r["id"] + 300 for r in out)
        assert t.read(spark).count() == 200

    def test_upsert_into_empty_table(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "fresh", _df(spark).schema, partition_source="ts"
        )
        t.upsert_equality(spark, _df(spark, n=10), ["id"])
        assert t.read(spark).count() == 10


class TestInterplay:
    def test_equality_over_position_deletes(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id % 10 = 3", mode="merge-on-read")  # 20 rows
        t.delete_where_equality(
            spark, spark.createDataFrame([(4,), (13,)], "id long"), ["id"]
        )
        # 13 was already position-deleted; 4 newly equality-deleted
        assert t.read(spark).count() == 179
        assert t.read(spark).filter("id in (3, 4, 13)").count() == 0

    def test_position_delete_skips_equality_deleted_rows(self, spark, fs_table):
        t = fs_table
        t.delete_where_equality(
            spark, spark.createDataFrame([(6,)], "id long"), ["id"]
        )
        # the predicate matches rows 6 and 16; 6 is already invisible —
        # only 16 should be counted and recorded
        sid, n = t.delete_where(spark, "id in (6, 16)", mode="merge-on-read")
        assert n == 1
        assert t.read(spark).count() == 198

    def test_cow_delete_preserves_pending_equality_deletes(self, spark, fs_table):
        t = fs_table
        t.delete_where_equality(
            spark, spark.createDataFrame([(8,)], "id long"), ["id"]
        )
        # copy-on-write delete rewrites files containing id=100; the
        # rewrite must (a) not resurrect id=8, (b) keep the eq delete
        # applying to surviving files via preserved sequence numbers
        sid, n = t.delete_where(spark, "id = 100", mode="copy-on-write")
        assert n == 1
        assert t.read(spark).count() == 198
        assert t.read(spark).filter("id in (8, 100)").count() == 0

    def test_compaction_materializes_equality_deletes(self, spark, fs_table):
        t = fs_table
        t.append_dataframe(_df(spark, tag="b"))  # duplicate rows, small files
        t.delete_where_equality(
            spark, spark.createDataFrame([(2,)], "id long"), ["id"]
        )
        assert t.read(spark).count() == 398
        sid = t.rewrite_data_files(spark, target_bytes=1 << 30, min_files=2)
        assert sid is not None
        # compacted files materialized the delete; correctness holds
        assert t.read(spark).count() == 398
        assert t.read(spark).filter("id = 2").count() == 0

    def test_fold_equality_deletes(self, spark, fs_table):
        """rewrite_equality_deletes materializes pending CDC deletes:
        only files containing matched rows rewrite, the equality files
        drop, reads stay correct, and the replace snapshot is invisible
        to change streams."""
        t = fs_table
        t.delete_where_equality(
            spark, spark.createDataFrame([(12,), (150,)], "id long"), ["id"]
        )
        before = {f.file_path for f in t.plan_files()[0]}
        sid = t.rewrite_equality_deletes(spark)
        assert sid is not None
        _, deletes, _ = t.plan_scan()
        assert [f for f in deletes if f.content == 2] == []
        assert t.read(spark).count() == 198
        assert t.read(spark).filter("id in (12, 150)").count() == 0
        s = t.current_snapshot()["summary"]
        assert s["operation"] == "replace"
        # untouched files survive by reference
        after = {f.file_path for f in t.plan_files()[0]}
        assert before & after
        # change streams skip the fold (logical no-op)
        assert t.changelog_scan(spark).filter(
            "_commit_snapshot_id = " + str(sid)
        ).count() == 0
        # no pending equality deletes -> fold is a no-op
        assert t.rewrite_equality_deletes(spark) is None

    def test_fold_equality_preserves_position_deletes(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id % 10 = 9", mode="merge-on-read")  # 20 rows
        t.delete_where_equality(
            spark, spark.createDataFrame([(14,)], "id long"), ["id"]
        )
        sid = t.rewrite_equality_deletes(spark)
        assert sid is not None
        _, deletes, _ = t.plan_scan()
        # equality file folded away; position deletes for untouched
        # files stay live
        assert all(f.content == 1 for f in deletes)
        assert t.read(spark).count() == 179
        assert t.read(spark).filter("id = 14 or id % 10 = 9").count() == 0

    def test_fold_position_deletes_keeps_equality_live(self, spark, fs_table):
        t = fs_table
        t.delete_where(spark, "id % 10 = 7", mode="merge-on-read")  # 20 rows
        t.delete_where_equality(
            spark, spark.createDataFrame([(11,)], "id long"), ["id"]
        )
        sid = t.rewrite_position_deletes(spark)
        assert sid is not None
        _, deletes, _ = t.plan_scan()
        # position deletes folded away; the equality file stays live
        assert [f.content for f in deletes] == [2]
        assert t.read(spark).count() == 179
        assert t.read(spark).filter("id = 11 or id % 10 = 7").count() == 0


class TestPlanShape:
    def test_small_equality_sets_broadcast(self, spark, fs_table):
        """The read-side anti-join and the seq-map join both broadcast
        when manifests say the delete set is small — a map-side scan
        with no shuffle of the table (the 100 TB shape)."""
        from opentelemetry_iceberg_exporter_spark.plans.inspect import (
            join_strategies,
            physical_plan,
        )

        t = fs_table
        t.delete_where_equality(
            spark, spark.createDataFrame([(1,), (2,)], "id long"), ["id"]
        )
        df = t.read(spark)
        js = join_strategies(df)
        assert js and all("Broadcast" in j for j in js), js
        assert "LeftAnti" in physical_plan(df)

    def test_large_equality_sets_shuffle(self, spark, fs_table, monkeypatch):
        """Above the metadata threshold the delete side gets no
        broadcast hint — the static plan shuffles (AQE may still
        down-convert at runtime; assert with AQE off)."""
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod
        from opentelemetry_iceberg_exporter_spark.plans.inspect import (
            join_strategies,
        )

        t = fs_table
        t.delete_where_equality(
            spark, spark.createDataFrame([(1,)], "id long"), ["id"]
        )
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            monkeypatch.setattr(mod, "BROADCAST_DELETE_ROWS", 0)
            js = join_strategies(t.read(spark))
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        # the seq-map join stays broadcast (explicitly hinted, metadata-
        # sized); the delete anti-join itself must shuffle
        assert any("Broadcast" not in j for j in js), js


class TestExporterUpsertConfig:
    def _sink(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark import schemas as S
        from opentelemetry_iceberg_exporter_spark.config import (
            CatalogConfig,
            ExporterConfig,
            PartitionConfig,
            StorageConfig,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
        )

        cfg = ExporterConfig(
            storage=StorageConfig(
                provider="filesystem", bucket=str(tmp_path), prefix="raw"
            ),
            catalog=CatalogConfig(
                catalog_type="fs",
                warehouse=str(tmp_path / "warehouse"),
                upsert_keys={S.SIGNAL_TRACES: ["trace_id", "span_id"]},
            ),
            partition=PartitionConfig(granularity="hourly"),
        )
        cfg.catalog.validate()
        return FsIcebergSink(spark, cfg), S

    def _span_rows(self, spark, S, spans):
        """spans: [(trace_id, span_id, span_name)] -> conforming DF."""
        from datetime import datetime, timezone

        from pyspark.sql.types import (
            ArrayType,
            BooleanType,
            IntegerType,
            LongType,
            StringType,
            TimestampType,
        )

        schema = S.SCHEMAS[S.SIGNAL_TRACES]

        def default(dt):
            if isinstance(dt, StringType):
                return ""
            if isinstance(dt, (LongType, IntegerType)):
                return 0
            if isinstance(dt, BooleanType):
                return False
            if isinstance(dt, TimestampType):
                return datetime(2024, 3, 1, tzinfo=timezone.utc)
            if isinstance(dt, ArrayType):
                return []
            return None

        rows = []
        for trace_id, span_id, name in spans:
            row = {
                f.name: (None if f.nullable else default(f.dataType))
                for f in schema.fields
            }
            row["trace_id"] = trace_id
            row["span_id"] = span_id
            row["span_name"] = name
            row[S.partition_column(S.SIGNAL_TRACES)] = datetime(
                2024, 3, 1, tzinfo=timezone.utc
            )
            rows.append(row)
        return spark.createDataFrame(rows, schema)

    def test_resent_spans_replace_not_duplicate(self, spark, tmp_path):
        """The exporter's CDC hookup: with catalog.upsert_keys set for
        traces, a re-exported span REPLACES its earlier version instead
        of duplicating — at O(batch) cost, no table read per commit."""
        sink, S = self._sink(spark, tmp_path)
        sink.append(
            self._span_rows(spark, S, [("t1", "s1", "first"), ("t1", "s2", "x")]),
            S.SIGNAL_TRACES,
        )
        # re-send s1 (corrected) plus a brand-new span in one batch
        sink.append(
            self._span_rows(spark, S, [("t1", "s1", "second"), ("t2", "s3", "y")]),
            S.SIGNAL_TRACES,
        )
        out = sink.read(S.SIGNAL_TRACES)
        assert out.count() == 3  # no duplicate for (t1, s1)
        assert (
            out.filter("trace_id = 't1' and span_id = 's1'")
            .select("span_name")
            .first()[0]
            == "second"
        )
        assert out.groupBy("trace_id", "span_id").count().filter(
            "count > 1"
        ).count() == 0

    def test_upsert_keys_validation(self):
        from opentelemetry_iceberg_exporter_spark.config import CatalogConfig

        with pytest.raises(ValueError, match="upsert_keys"):
            CatalogConfig(
                catalog_type="fs", warehouse="/tmp/x", upsert_keys={"traces": []}
            ).validate()
        with pytest.raises(ValueError, match="mutually"):
            CatalogConfig(
                catalog_type="fs",
                warehouse="/tmp/x",
                upsert_keys={"traces": ["trace_id"]},
                wap_branch="audit",
            ).validate()


class TestCli:
    def test_delete_by_keys_cli(self, spark, fs_table, tmp_path, capsys):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        keys_path = str(tmp_path / "keys.parquet")
        spark.createDataFrame([(3,), (4,)], "id long").write.parquet(keys_path)
        wh = os.path.dirname(os.path.dirname(fs_table.location))
        rc = main(
            [
                "delete",
                "--warehouse", wh,
                "--table", "events",
                "--keys", keys_path,
                "--key-cols", "id",
            ]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["deleted_key_tuples"] == 2
        assert out["mode"] == "equality"
        assert fs_table.read(spark).count() == 198

    def test_upsert_cli(self, spark, fs_table, tmp_path, capsys):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        batch_path = str(tmp_path / "batch.parquet")
        _df(spark, n=5, tag="cli").withColumn("v", F.lit(-1)).write.parquet(
            batch_path
        )
        wh = os.path.dirname(os.path.dirname(fs_table.location))
        rc = main(
            [
                "upsert",
                "--warehouse", wh,
                "--table", "events",
                "--input", batch_path,
                "--key-cols", "id",
            ]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["upserted_rows"] == 5
        assert fs_table.read(spark).count() == 200
        assert fs_table.read(spark).filter("v = -1").count() == 5

    def test_delete_requires_where_or_keys(self, fs_table):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        wh = os.path.dirname(os.path.dirname(fs_table.location))
        with pytest.raises(SystemExit, match="--where"):
            main(["delete", "--warehouse", wh, "--table", "events"])


class TestRestTransport:
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
        t = client.ensure_table(
            "otel", "events", _df(spark).schema, partition_source="ts"
        )
        t.append_dataframe(_df(spark))
        yield t
        server.shutdown()

    def test_equality_delete_over_rest(self, spark, rest_table):
        t = rest_table
        sid, n = t.delete_where_equality(
            spark, spark.createDataFrame([(3,), (77,)], "id long"), ["id"]
        )
        assert n == 2
        assert t.current_snapshot()["summary"]["deleted-key-tuples"] == "2"
        assert t.read(spark).count() == 198
        md = t.metadata()
        _, dels = t._live_files(md, md["current-snapshot-id"])
        assert [f.content for f in dels] == [2]

    def test_upsert_over_rest(self, spark, rest_table):
        t = rest_table
        batch = _df(spark, n=15, tag="new").withColumn("v", F.col("id") * 7)
        t.upsert_equality(spark, batch, ["id"])
        out = t.read(spark)
        assert out.count() == 200
        assert out.filter("id < 15 and v = id * 7").count() == 15

    def test_rest_fold_equality_deletes(self, spark, rest_table):
        t = rest_table
        t.delete_where_equality(
            spark, spark.createDataFrame([(42,)], "id long"), ["id"]
        )
        sid = t.rewrite_equality_deletes(spark)
        assert sid is not None
        md = t.metadata()
        _, dels = t._live_files(md, md["current-snapshot-id"])
        assert [f for f in dels if f.content == 2] == []
        assert t.read(spark).count() == 199
        assert t.read(spark).filter("id = 42").count() == 0

    def test_rest_fold_keeps_equality_live(self, spark, rest_table):
        t = rest_table
        t.delete_where(spark, "id = 50", mode="merge-on-read")
        t.delete_where_equality(
            spark, spark.createDataFrame([(60,)], "id long"), ["id"]
        )
        sid = t.rewrite_position_deletes(spark)
        assert sid is not None
        md = t.metadata()
        _, dels = t._live_files(md, md["current-snapshot-id"])
        assert [f.content for f in dels] == [2]
        assert t.read(spark).count() == 198
