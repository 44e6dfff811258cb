"""Catalog table lifecycle: drop (with and without purge) and rename.

Drop semantics mirror Iceberg's: without purge the catalog entry goes
away but every file stays (external-data salvage); with purge the whole
location is reclaimed. Rename exists ONLY on the REST catalog — its
registry maps names to locations independently — while the filesystem
catalog refuses exactly like Iceberg's HadoopCatalog (metadata and
manifests record absolute location-bound paths)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog


def _df(spark, n=20):
    return spark.range(n).select(
        "id",
        F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("ts"),
    )


class TestFsLifecycle:
    def test_drop_without_purge_leaves_files(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        data_files = [f.file_path for f in t.plan_files()[0]]
        assert cat.drop_table("otel", "ev") is True
        assert not cat.table_exists("otel", "ev")
        assert "ev" not in cat.list_tables("otel")
        with pytest.raises(FileNotFoundError):
            cat.load_table("otel", "ev")
        # every data file survives for manual salvage
        assert all(os.path.exists(p) for p in data_files)
        # idempotent: a second drop reports absence
        assert cat.drop_table("otel", "ev") is False

    def test_drop_with_purge_reclaims_location(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        location = t.location
        assert cat.drop_table("otel", "ev", purge=True) is True
        assert not os.path.exists(location)
        assert not cat.table_exists("otel", "ev")

    def test_recreate_after_drop(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        cat.drop_table("otel", "ev", purge=True)
        t2 = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t2.append_dataframe(_df(spark, 5))
        assert t2.read(spark).count() == 5

    def test_recreate_after_plain_drop_surfaces_clearly(self, spark, tmp_path):
        """The directory catalog derives the location from the name, so
        re-creating over un-purged salvage remains must fail with a
        CLEAR signal, not a confusing version-CAS conflict."""
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        t.append_dataframe(_df(spark))
        cat.drop_table("otel", "ev")  # no purge: remains stay
        with pytest.raises(FileExistsError, match="dropped table"):
            cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")

    def test_rename_refused(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        cat.create_table("otel", "ev", _df(spark).schema, partition_source="ts")
        with pytest.raises(NotImplementedError, match="REST"):
            cat.rename_table("otel", "ev", "otel", "ev2")


class TestRestLifecycle:
    @pytest.fixture()
    def catalog(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from rest_stub import make_server

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        client = RestCatalogClient(uri, warehouse=warehouse)
        client.ensure_namespace("otel")
        yield client
        server.shutdown()

    def test_drop_without_purge_leaves_files(self, spark, catalog):
        t = catalog.ensure_table(
            "otel", "ev", _df(spark).schema, partition_source="ts"
        )
        t.append_dataframe(_df(spark))
        data_files = [f.file_path for f in t.plan_files()[0]]
        assert catalog.drop_table("otel", "ev") is True
        assert not catalog.table_exists("otel", "ev")
        assert all(os.path.exists(p) for p in data_files)
        assert catalog.drop_table("otel", "ev") is False

    def test_drop_with_purge_reclaims_location(self, spark, catalog):
        t = catalog.ensure_table(
            "otel", "ev", _df(spark).schema, partition_source="ts"
        )
        t.append_dataframe(_df(spark))
        location = t.location()
        assert catalog.drop_table("otel", "ev", purge=True) is True
        assert not os.path.exists(location)

    def test_drop_busts_the_ensure_cache(self, spark, catalog):
        """ensure_table's per-process cache must not resurrect a dropped
        table silently — the ensure after a drop CREATES a fresh one."""
        t = catalog.ensure_table(
            "otel", "ev", _df(spark).schema, partition_source="ts"
        )
        t.append_dataframe(_df(spark))
        catalog.drop_table("otel", "ev", purge=True)
        t2 = catalog.ensure_table(
            "otel", "ev", _df(spark).schema, partition_source="ts"
        )
        assert t2.current_snapshot() is None  # a genuinely fresh table

    def test_rename_preserves_data_and_location(self, spark, catalog):
        t = catalog.ensure_table(
            "otel", "ev", _df(spark).schema, partition_source="ts"
        )
        t.append_dataframe(_df(spark))
        old_location = t.location()
        catalog.rename_table("otel", "ev", "otel", "events_renamed")
        assert not catalog.table_exists("otel", "ev")
        t2 = catalog.ensure_table(
            "otel", "events_renamed", _df(spark).schema, partition_source="ts"
        )
        assert t2.location() == old_location  # location independent of name
        assert t2.read(spark).count() == 20
        # writes keep working under the new identity
        t2.append_dataframe(_df(spark, 5))
        assert t2.read(spark).count() == 25

    def test_rename_onto_existing_conflicts(self, spark, catalog):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestError,
        )

        catalog.ensure_table("otel", "a", _df(spark).schema, partition_source="ts")
        catalog.ensure_table("otel", "b", _df(spark).schema, partition_source="ts")
        with pytest.raises(RestError) as exc:
            catalog.rename_table("otel", "a", "otel", "b")
        assert exc.value.status == 409

    def test_rename_missing_source_404s(self, spark, catalog):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestError,
        )

        with pytest.raises(RestError) as exc:
            catalog.rename_table("otel", "ghost", "otel", "x")
        assert exc.value.status == 404
