"""Dynamic partition overwrite (Spark's INSERT OVERWRITE semantics,
Iceberg's `overwritePartitions`): atomically replace exactly the hidden
partitions a batch lands in — the standard backfill primitive. At
100 TB, recomputing one day of history must swap ONLY that day: every
other partition survives by reference (byte-identical paths, no data
read), the diff is one metadata walk (plan_partition_overwrite), and
readers flip atomically via a pinned `overwrite` snapshot.

Reference scope note: the reference exporter only creates/appends
(writer.go); this operation extends the catalog's table-management
surface the way rewrite/expire/DML already do."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    ReplaceConflictError,
)


def _df(spark, ids, tag="a"):
    return spark.createDataFrame(
        [(i, tag) for i in ids], "id long, tag string"
    ).select(
        "id",
        F.to_timestamp(
            F.lit("2024-03-01 00:00:00").cast("timestamp")
            + F.make_interval(days=(F.col("id") / 100).cast("int"))
        ).alias("ts"),
        "tag",
    )


@pytest.fixture()
def table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "otel", "ev", _df(spark, [0]).schema, partition_source="ts",
        granularity="daily",
    )
    t.append_dataframe(_df(spark, range(400)))  # 4 daily partitions
    return t


class TestOverwritePartitions:
    def test_replaces_only_touched_days(self, spark, table):
        t = table
        before = {f.file_path for f in t.plan_files()[0]}
        # backfill day 2 (ids 100-199) with recomputed content
        sid = t.overwrite_partitions(_df(spark, range(100, 180), tag="b"))
        assert sid is not None
        snap = t.current_snapshot()
        assert snap["summary"]["operation"] == "overwrite"
        assert snap["summary"]["replaced-partitions"] == "1"
        assert snap["summary"]["replaced-records"] == "100"
        got = t.read(spark)
        assert got.count() == 380  # 300 untouched + 80 new
        assert got.filter("tag = 'b'").count() == 80
        assert got.filter("id >= 100 and id < 200 and tag = 'a'").count() == 0
        # untouched days survive BY REFERENCE
        after = {f.file_path for f in t.plan_files()[0]}
        untouched = {p for p in before if "/data/" in p}
        assert len(before & after) == 3  # 3 surviving day files
        assert untouched & after  # byte-identical paths carried

    def test_new_partition_is_a_plain_insert(self, spark, table):
        t = table
        sid = t.overwrite_partitions(_df(spark, range(400, 450), tag="c"))
        assert sid is not None
        assert t.current_snapshot()["summary"]["replaced-partitions"] == "0"
        assert t.read(spark).count() == 450

    def test_multi_day_batch_replaces_each(self, spark, table):
        t = table
        t.overwrite_partitions(_df(spark, list(range(50)) + list(range(300, 310)), tag="d"))
        got = t.read(spark)
        assert got.count() == 260  # 100+100 untouched + 50 + 10
        assert got.filter("id < 100").count() == 50
        assert got.filter("id >= 300").count() == 10
        assert t.current_snapshot()["summary"]["replaced-partitions"] == "2"

    def test_empty_batch_commits_nothing(self, spark, table):
        before = len(table.snapshots())
        assert table.overwrite_partitions(_df(spark, [])) is None
        assert len(table.snapshots()) == before

    def test_time_travel_sees_pre_overwrite_data(self, spark, table):
        t = table
        pre = t.current_snapshot()["snapshot-id"]
        t.overwrite_partitions(_df(spark, range(100, 120), tag="b"))
        assert t.read(spark).count() == 320
        assert t.read(spark, snapshot_id=pre).count() == 400

    def test_surviving_partition_deletes_still_apply(self, spark, table):
        t = table
        # MoR-delete some rows of day 1, then backfill day 2 only
        t.delete_where(spark, "id < 10", mode="deletion-vectors")
        t.overwrite_partitions(_df(spark, range(100, 150), tag="b"))
        got = t.read(spark)
        # day1: 90 live (DV still applies), day2: 50 new, day3+4: 200
        assert got.count() == 340
        assert got.filter("id < 10").count() == 0

    def test_replaced_partition_vectors_are_dropped_not_carried(
        self, spark, table
    ):
        """A deletion vector references exactly one data file: replacing
        that file makes the vector moot — the overwrite must drop the
        entry instead of carrying a stale vector for a dead path."""
        t = table
        t.delete_where(spark, "id between 100 and 104", mode="deletion-vectors")
        assert any(f.is_deletion_vector for f in t.plan_scan()[1])
        t.overwrite_partitions(_df(spark, range(100, 150), tag="b"))
        # the only vectors referenced day-2 files, all replaced: none live
        assert not any(f.is_deletion_vector for f in t.plan_scan()[1])
        got = t.read(spark)
        assert got.count() == 350  # 300 untouched + 50 backfilled
        assert got.filter("id between 100 and 104").count() == 5  # fresh rows

    def test_concurrent_append_forces_replan(self, spark, tmp_path):
        import opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs as mod

        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "ev", _df(spark, [0]).schema, partition_source="ts",
            granularity="daily",
        )
        t.append_dataframe(_df(spark, range(200)))
        t2 = cat.load_table("otel", "ev")

        real = mod.plan_partition_overwrite
        fired = {"done": False}

        def racing(md, sid, files):
            out = real(md, sid, files)
            if not fired["done"]:
                fired["done"] = True
                t2.append_dataframe(_df(spark, range(200, 240)))
            return out

        mod.plan_partition_overwrite = racing
        try:
            with pytest.raises(ReplaceConflictError):
                t.overwrite_partitions(_df(spark, range(100, 150), tag="b"))
        finally:
            mod.plan_partition_overwrite = real
        # the racer's append is intact; re-running lands cleanly
        assert t.read(spark).count() == 240
        sid = t.overwrite_partitions(_df(spark, range(100, 150), tag="b"))
        assert sid is not None
        assert t.read(spark).count() == 190  # 100 + 50 new + 40 appended

    def test_unpartitioned_table_truncates_and_inserts(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        df = spark.createDataFrame([(1, "a")], "id long, tag string")
        t = cat.create_table("otel", "flat", df.schema, None)
        t.append_dataframe(df)
        t.append_dataframe(spark.createDataFrame([(2, "a")], "id long, tag string"))
        sid = t.overwrite_partitions(
            spark.createDataFrame([(9, "z")], "id long, tag string")
        )
        assert sid is not None
        got = t.read(spark).collect()
        assert [(r["id"], r["tag"]) for r in got] == [(9, "z")]


class TestOverwriteCli:
    def test_overwrite_cli(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        t = cat.create_table(
            "otel", "ev", _df(spark, [0]).schema, partition_source="ts",
            granularity="daily",
        )
        t.append_dataframe(_df(spark, range(400)))
        src = str(tmp_path / "backfill")
        _df(spark, range(100, 150), tag="b").write.parquet(src)
        rc = main(
            ["overwrite", "--warehouse", wh, "--table", "ev", "--input", src]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert out["rows"] == 50 and out["replaced_partitions"] == 1
        assert t.read(spark).count() == 350


class TestOverwritePartitionsRest:
    def test_rest_parity_and_pinned_base(self, spark, tmp_path):
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from rest_stub import make_server

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table(
                "otel", "ev", _df(spark, [0]).schema, partition_source="ts",
                granularity="daily",
            )
            t.append_dataframe(_df(spark, range(400)))
            before = {f.file_path for f in t.plan_files()[0]}
            sid = t.overwrite_partitions(_df(spark, range(100, 180), tag="b"))
            assert sid is not None
            got = t.read(spark)
            assert got.count() == 380
            assert got.filter("tag = 'b'").count() == 80
            after = {f.file_path for f in t.plan_files()[0]}
            assert len(before & after) == 3  # survivors by reference
            snap = t.current_snapshot()
            assert snap["summary"]["replaced-partitions"] == "1"
        finally:
            server.shutdown()


@pytest.mark.slow
class TestRandomizedOverwriteModel:
    def test_random_interleavings_match_model(self, spark, tmp_path):
        """Model-based randomized sequences of appends, day-backfills
        (overwrite_partitions), range deletes (random physical mode),
        and folds must always read back exactly the model's (id, tag)
        map — the overwrite op composing with every other mutation."""
        import random

        rng = random.Random(11)
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "model", _df(spark, [0]).schema, partition_source="ts",
            granularity="daily",
        )
        model: dict[int, str] = {}
        next_fresh = 0

        def day_ids(day):
            return range(day * 100, day * 100 + 100)

        for step in range(12):
            r = rng.random()
            if r < 0.35 or not model:
                n = rng.randint(5, 20)
                ids = list(range(next_fresh, next_fresh + n))
                next_fresh = ((max(ids) // 100) + 1) * 100  # next day
                tag = f"a{step}"
                t.append_dataframe(_df(spark, ids, tag=tag))
                model.update({i: tag for i in ids})
            elif r < 0.6:
                # backfill one existing day with a recomputed subset
                day = rng.choice(sorted({i // 100 for i in model}))
                keep = [i for i in day_ids(day) if rng.random() < 0.6]
                tag = f"b{step}"
                sid = t.overwrite_partitions(_df(spark, keep, tag=tag))
                replaced = {i for i in model if i // 100 == day}
                if keep:
                    assert sid is not None
                    for i in replaced:
                        del model[i]
                    model.update({i: tag for i in keep})
                else:
                    assert sid is None  # empty batch: no snapshot, no change
            elif r < 0.85:
                lo = rng.randrange(max(next_fresh, 1))
                hi = lo + rng.randint(0, 120)
                mode = rng.choice(
                    ["copy-on-write", "merge-on-read", "deletion-vectors"]
                )
                _, n = t.delete_where(
                    spark, f"id between {lo} and {hi}", mode=mode
                )
                gone = {i for i in model if lo <= i <= hi}
                assert n == len(gone), (step, mode)
                for i in gone:
                    del model[i]
            else:
                t.rewrite_position_deletes(spark)
            got = {
                (r_["id"], r_["tag"])
                for r_ in t.read(spark).select("id", "tag").collect()
            }
            assert got == set(model.items()), f"step {step}"
        assert t.read(spark).count() == len(model)


class TestSpecEvolutionGuard:
    def test_overwrite_refused_over_old_spec_files(self, spark, tmp_path):
        """Files written under an older partition spec have
        differently-shaped tuples — including SUBSET shapes (hourly vs
        daily carries a different field; unpartitioned carries none)
        that tuple equality can never replace. A backfill would keep
        them alongside the new files and double the rows: refuse."""
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "ev", _df(spark, [0]).schema, partition_source="ts",
            granularity="hourly",
        )
        t.append_dataframe(_df(spark, range(200)))
        assert t.update_partition_spec("ts", granularity="daily") is not None
        t2 = cat.load_table("otel", "ev")
        with pytest.raises(ValueError, match="partition spec"):
            t2.overwrite_partitions(_df(spark, range(100, 150), tag="b"))
        # after compacting everything onto the current spec, it works
        assert t2.rewrite_data_files(spark, min_files=1) is not None
        sid = t2.overwrite_partitions(_df(spark, range(100, 150), tag="b"))
        assert sid is not None
        got = t2.read(spark)
        assert got.count() == 150
        assert got.filter("id >= 100 and id < 200 and tag = 'a'").count() == 0
