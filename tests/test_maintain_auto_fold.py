"""`maintain --auto`: policy-driven delete folding.

Merge-on-read deletes (parquet position deletes, v3 deletion vectors,
equality deletes) keep writes O(matches) but tax every read with a
subtraction and knock count_rows off its metadata-only fast path. The
auto policy folds them back into the data files ONLY once their
accumulated ratio to live rows crosses a threshold — a metadata-only
decision from snapshot summary totals (plan_auto_fold), so the
maintenance loop itself costs nothing when there is nothing to do."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    plan_auto_fold,
)


def _df(spark, n=200):
    return spark.range(n).select(
        F.col("id"),
        F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("ts"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
    t.append_dataframe(_df(spark))
    return t


class TestPlanAutoFold:
    def test_clean_table_no_fold(self, table):
        d = plan_auto_fold(table.metadata())
        assert d == {
            "fold_position": False,
            "fold_equality": False,
            "position_delete_ratio": 0.0,
            "equality_delete_ratio": 0.0,
        }

    def test_below_threshold_holds(self, spark, table):
        table.delete_where(spark, "id < 4", mode="deletion-vectors")  # 2%
        d = plan_auto_fold(table.metadata(), threshold=0.05)
        assert d["position_delete_ratio"] == pytest.approx(4 / 200)
        assert not d["fold_position"]

    def test_above_threshold_folds(self, spark, table):
        table.delete_where(spark, "id < 20", mode="deletion-vectors")  # 10%
        d = plan_auto_fold(table.metadata(), threshold=0.05)
        assert d["fold_position"] and not d["fold_equality"]

    def test_equality_ratio_independent(self, spark, table):
        keys = _df(spark).filter("id < 20").select("id")
        table.delete_where_equality(spark, keys, ["id"])
        d = plan_auto_fold(table.metadata(), threshold=0.05)
        assert d["fold_equality"] and not d["fold_position"]

    def test_empty_table_no_fold(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh2"))
        t = cat.create_table(
            "otel", "empty", _df(spark).schema, partition_source="ts"
        )
        d = plan_auto_fold(t.metadata())
        assert not d["fold_position"] and not d["fold_equality"]

    def test_summary_free_metadata_walk_fallback(self, spark, table):
        """Tables written by engines that omit summary totals decide
        from one manifest walk instead."""
        table.delete_where(spark, "id < 20", mode="merge-on-read")
        md = table.metadata()
        stripped = dict(md)
        stripped["snapshots"] = [
            {**s, "summary": {"operation": s["summary"].get("operation", "append")}}
            for s in md["snapshots"]
        ]
        d = plan_auto_fold(stripped, threshold=0.05)
        assert d["fold_position"]


class TestMaintainAutoCli:
    def _maintain(self, wh, extra, capsys):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        rc = main(
            ["maintain", "--warehouse", wh, "--table", "ev"] + extra
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        return out

    def test_auto_folds_over_threshold_and_restores_fast_path(
        self, spark, tmp_path, capsys
    ):
        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        t.delete_where(spark, "id < 20", mode="deletion-vectors")
        # pending deletes force the read-side count path
        assert t.count_rows(spark=spark) == 180
        out = self._maintain(wh, ["--auto"], capsys)
        assert out["auto_fold"]["fold_position"] is True
        assert out["fold_deletes_snapshot"] is not None
        t2 = cat.load_table("otel", "ev")
        assert t2.plan_scan()[1] == []  # deletes folded away
        assert t2.count_rows() == 180  # metadata-only fast path again
        assert t2.read(spark).count() == 180

    def test_auto_holds_under_threshold(self, spark, tmp_path, capsys):
        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        t.delete_where(spark, "id < 4", mode="deletion-vectors")  # 2%
        out = self._maintain(wh, ["--auto"], capsys)
        assert out["auto_fold"]["fold_position"] is False
        assert out["fold_deletes_snapshot"] is None
        t2 = cat.load_table("otel", "ev")
        assert any(f.is_deletion_vector for f in t2.plan_scan()[1])

    def test_threshold_flag_respected(self, spark, tmp_path, capsys):
        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        t.delete_where(spark, "id < 4", mode="deletion-vectors")  # 2%
        out = self._maintain(wh, ["--auto", "--fold-threshold", "0.01"], capsys)
        assert out["auto_fold"]["fold_position"] is True
        assert out["fold_deletes_snapshot"] is not None

    def test_explicit_fold_flag_still_works_with_auto(
        self, spark, tmp_path, capsys
    ):
        """--fold-deletes remains an unconditional override; --auto only
        ADDS folds, never suppresses an explicit request."""
        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        t.delete_where(spark, "id < 4", mode="deletion-vectors")  # 2%
        out = self._maintain(wh, ["--auto", "--fold-deletes"], capsys)
        assert out["auto_fold"]["fold_position"] is False
        assert out["fold_deletes_snapshot"] is not None
