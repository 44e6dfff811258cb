"""Iceberg v3 `geometry` / `geography` types (spec "Primitive Types":
geometry(C) with planar edges, geography(C, A) with spherical edges
interpolated by algorithm A; defaults CRS OGC:CRS84 and algorithm
spherical). Spark has no geo type, so both surface as BinaryType WKB via
the `iceberg_types` override — same pattern as ns timestamps. The engine
treats values as opaque bytes: v3-gated at create AND evolution, refused
as partition/sort source (no defined ordering), no bounds, no defaults.
Completes the v3 type matrix (round-8 verdict ask #3) alongside
timestamp_ns/unknown/variant.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    decode_bound,
    file_column_bounds,
    live_files,
    parse_geo_type,
)

from rest_stub import make_server

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("shape", BinaryType(), True),
    ]
)
GEO_TYPES = {"shape": "geometry"}

# WKB for POINT(i 2i), little-endian: byte order 1, type 1, two doubles
import struct as _struct


def _wkb_point(x: float, y: float) -> bytes:
    return b"\x01\x01\x00\x00\x00" + _struct.pack("<dd", x, y)


def _df(spark, n=5):
    rows = [(i, _wkb_point(float(i), 2.0 * i)) for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


class TestParseGeoType:
    def test_defaults(self):
        assert parse_geo_type("geometry") == ("geometry", "OGC:CRS84", None)
        assert parse_geo_type("geography") == (
            "geography", "OGC:CRS84", "spherical",
        )

    def test_parameterized(self):
        assert parse_geo_type("geometry(srid:3857)") == (
            "geometry", "srid:3857", None,
        )
        assert parse_geo_type("geography(OGC:CRS84, karney)") == (
            "geography", "OGC:CRS84", "karney",
        )

    def test_not_geo(self):
        assert parse_geo_type("long") is None
        assert parse_geo_type("variant") is None
        assert parse_geo_type({"type": "struct"}) is None

    def test_malformed(self):
        with pytest.raises(ValueError, match="malformed"):
            parse_geo_type("geometry()")
        with pytest.raises(ValueError, match="malformed"):
            parse_geo_type("geometry(a, b)")  # geometry takes no algorithm
        with pytest.raises(ValueError, match="algorithm"):
            parse_geo_type("geography(OGC:CRS84, euclidean)")


class TestRefusalMatrix:
    def test_v2_create_refused(self, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="format-version"):
            cat.create_table("otel", "g", SCHEMA, iceberg_types=GEO_TYPES)

    def test_non_binary_carrier_refused(self, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="BinaryType"):
            cat.create_table(
                "otel", "g", SCHEMA,
                iceberg_types={"id": "geometry"},
                properties={"format-version": "3"},
            )

    def test_partition_source_refused(self, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="partition source"):
            cat.create_table(
                "otel", "g", SCHEMA,
                iceberg_types=GEO_TYPES,
                partition_source="shape",
                properties={"format-version": "3"},
            )

    def test_bucket_partition_refused(self, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="partition source"):
            cat.create_table(
                "otel", "g", SCHEMA,
                iceberg_types=GEO_TYPES,
                partition_by=[("shape", "bucket[4]")],
                properties={"format-version": "3"},
            )

    def test_sort_refused(self, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="sort"):
            cat.create_table(
                "otel", "g", SCHEMA,
                iceberg_types=GEO_TYPES,
                sort_by=["shape"],
                properties={"format-version": "3"},
            )

    def test_evolution_v3_gated_and_defaults_refused(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        plain = StructType([StructField("id", LongType(), False)])
        t = cat.create_table("otel", "g", plain)
        t.append_dataframe(spark.createDataFrame([(1,), (2,)], plain))
        new = [StructField("shape", BinaryType(), True)]
        with pytest.raises(ValueError, match="upgrade_format_version"):
            t.add_columns(new, iceberg_types={"shape": "geometry"})
        t.upgrade_format_version(3)
        with pytest.raises(ValueError, match="default"):
            t.add_columns(
                new,
                iceberg_types={"shape": "geometry"},
                defaults={"shape": "POINT(0 0)"},
            )
        t.add_columns(new, iceberg_types={"shape": "geography(srid:4979)"})
        rows = t.read(spark).collect()
        assert len(rows) == 2 and all(r["shape"] is None for r in rows)

    def test_malformed_override_refused_at_create(self, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="malformed|algorithm"):
            cat.create_table(
                "otel", "g", SCHEMA,
                iceberg_types={"shape": "geometry(,)"},
                properties={"format-version": "3"},
            )


class TestRoundtrip:
    def test_fs_wkb_roundtrip_no_bounds(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "g", SCHEMA,
            iceberg_types={"shape": "geometry(srid:3857)"},
            properties={"format-version": "3"},
        )
        t.append_dataframe(_df(spark).coalesce(1))
        md = t.metadata()
        assert (
            next(
                f["type"]
                for f in md["schemas"][-1]["fields"]
                if f["name"] == "shape"
            )
            == "geometry(srid:3857)"
        )
        got = {r["id"]: bytes(r["shape"]) for r in t.read(spark).collect()}
        assert got == {i: _wkb_point(float(i), 2.0 * i) for i in range(5)}
        # the geo column carries no manifest bounds; orderable siblings do
        fields = {f["name"]: f["id"] for f in md["schemas"][-1]["fields"]}
        data, _ = live_files(md, md["current-snapshot-id"])
        lower, upper = file_column_bounds(data[0].file_path, md)
        assert fields["shape"] not in lower and fields["shape"] not in upper
        assert decode_bound(lower[fields["id"]], "long") == 0
        assert decode_bound(upper[fields["id"]], "long") == 4

    def test_dml_rides_along(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "g", SCHEMA,
            iceberg_types=GEO_TYPES,
            properties={"format-version": "3"},
        )
        t.append_dataframe(_df(spark, 8))
        _, n = t.delete_where(spark, "id >= 6", mode="copy-on-write")
        assert n == 2
        got = {r["id"]: bytes(r["shape"]) for r in t.read(spark).collect()}
        assert got == {i: _wkb_point(float(i), 2.0 * i) for i in range(6)}

    def test_rest_roundtrip_and_gate(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            with pytest.raises(ValueError, match="format-version"):
                client.create_table(
                    "otel", "g2", SCHEMA, iceberg_types=GEO_TYPES
                )
            t = client.ensure_table(
                "otel", "g", SCHEMA,
                iceberg_types={"shape": "geography(OGC:CRS84, vincenty)"},
                properties={"format-version": "3"},
            )
            t.append_dataframe(_df(spark, 3))
            got = {r["id"]: bytes(r["shape"]) for r in t.read(spark).collect()}
            assert got == {i: _wkb_point(float(i), 2.0 * i) for i in range(3)}
            assert (
                next(
                    f["type"]
                    for f in t.metadata()["schemas"][-1]["fields"]
                    if f["name"] == "shape"
                )
                == "geography(OGC:CRS84, vincenty)"
            )
        finally:
            server.shutdown()

    def test_lineage_composes(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "otel", "g", SCHEMA,
            iceberg_types=GEO_TYPES,
            properties={"format-version": "3"},
        )
        t.append_dataframe(_df(spark).orderBy("id").coalesce(1))
        rows = t.read(spark, with_lineage=True).collect()
        assert {r["_row_id"] for r in rows} == set(range(5))
