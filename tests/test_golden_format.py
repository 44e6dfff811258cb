"""Golden byte-format tests for the fs Iceberg catalog.

The fixtures in tests/golden/ were built by tests/golden/make_golden.py,
an INDEPENDENT encoder written directly from the public Avro 1.11 and
Iceberg v2 specs (it imports nothing from the package). These tests
close the "only reader of the byte format is the writer itself" gap:

* write side — with uuid/time/urandom frozen, FsCatalog.create_table +
  FsTable.append_files must produce the exact fixture bytes (metadata
  JSON, Avro manifest, Avro manifest list). Any drift in either
  implementation — or a shared spec misread corrected in one place —
  fails byte equality.
* read side — the package must read the independently-encoded fixtures
  back into the expected logical state (all_files, plan_files,
  incremental scan, time travel).
* stats cross-check — manifest-recorded record_count/file_size must
  match the Parquet footers Spark actually wrote.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil

import pytest

import pyarrow.parquet as pq

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from opentelemetry_iceberg_exporter_spark.sinks import avro_ocf, iceberg_fs
from opentelemetry_iceberg_exporter_spark.sinks.avro_ocf import read_ocf
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    DataFile,
    FsCatalog,
    FsTable,
)

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load_gen():
    """The generator doubles as the frozen-constants registry."""
    spec = importlib.util.spec_from_file_location(
        "make_golden", os.path.join(GOLDEN, "make_golden.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GEN = _load_gen()


@pytest.fixture()
def frozen(monkeypatch):
    """Freeze every nondeterminism the commit path consumes: table/file
    uuids (uuid.uuid4), wall clock (time.time), snapshot-id seed and OCF
    sync markers (os.urandom)."""
    import uuid as uuid_mod

    uuids = iter(
        [
            uuid_mod.UUID(GEN.TABLE_UUID),  # table-uuid
            uuid_mod.UUID(hex="a" * 32),  # version-hint tmp (name irrelevant)
            uuid_mod.UUID(hex=GEN.MANIFEST_UUID_HEX),  # manifest file
            uuid_mod.UUID(hex=GEN.LIST_UUID_HEX),  # manifest list file
            uuid_mod.UUID(hex="b" * 32),  # version-hint tmp
            uuid_mod.UUID(hex=GEN.DELETE_MANIFEST_UUID_HEX),  # delete manifest
            uuid_mod.UUID(hex=GEN.DELETE_LIST_UUID_HEX),  # delete manifest list
            uuid_mod.UUID(hex="c" * 32),  # version-hint tmp
            uuid_mod.UUID(hex=GEN.EQ_MANIFEST_UUID_HEX),  # equality manifest
            uuid_mod.UUID(hex=GEN.EQ_LIST_UUID_HEX),  # equality manifest list
            uuid_mod.UUID(hex="d" * 32),  # version-hint tmp
            uuid_mod.UUID(hex=GEN.MERGED_MANIFEST_UUID_HEX),  # rewrite: merged manifest
            uuid_mod.UUID(hex=GEN.MERGED_LIST_UUID_HEX),  # rewrite: manifest list
            uuid_mod.UUID(hex="e" * 32),  # version-hint tmp
            uuid_mod.UUID(hex=GEN.DV_PUFFIN_UUID_HEX),  # deletion-vector puffin
            uuid_mod.UUID(hex=GEN.DV_MANIFEST_UUID_HEX),  # DV manifest
            uuid_mod.UUID(hex=GEN.DV_LIST_UUID_HEX),  # DV manifest list
            uuid_mod.UUID(hex="f" * 32),  # version-hint tmp
            uuid_mod.UUID(hex=GEN.DV2_PUFFIN_UUID_HEX),  # fold: unioned puffin
            uuid_mod.UUID(hex=GEN.DV2_MANIFEST_UUID_HEX),  # fold: DV manifest
            uuid_mod.UUID(hex=GEN.SUPERSEDED_MANIFEST_UUID_HEX),  # fold: rewrite
            uuid_mod.UUID(hex=GEN.DV2_LIST_UUID_HEX),  # fold: manifest list
            uuid_mod.UUID(hex="1" * 32),  # version-hint tmp
        ]
    )
    times = iter(
        [
            GEN.T_CREATE_MS / 1000.0,
            GEN.T_APPEND_MS / 1000.0,
            GEN.T_DELETE_MS / 1000.0,
            GEN.T_EQ_MS / 1000.0,
            GEN.T_REWRITE_MS / 1000.0,  # rewrite snapshot timestamp
            GEN.T_REWRITE_MS / 1000.0,  # rewrite metadata last-updated
            GEN.T_DV_MS / 1000.0,  # DV delete commit
            GEN.T_DV2_MS / 1000.0,  # fold (second DV) commit
        ]
    )
    seeds = iter(
        [
            GEN.SNAPSHOT_SEED,
            GEN.SNAPSHOT2_SEED,
            GEN.SNAPSHOT3_SEED,
            GEN.SNAPSHOT4_SEED,
            GEN.SNAPSHOT5_SEED,
            GEN.SNAPSHOT6_SEED,
        ]
    )

    def fake_urandom(n: int) -> bytes:
        if n == 8:
            return next(seeds)
        if n == 16:
            return GEN.SYNC
        raise AssertionError(f"unexpected urandom({n})")

    monkeypatch.setattr(iceberg_fs.uuid, "uuid4", lambda: next(uuids))
    monkeypatch.setattr(iceberg_fs.time, "time", lambda: next(times))
    monkeypatch.setattr(iceberg_fs.os, "urandom", fake_urandom)
    monkeypatch.setattr(avro_ocf.os, "urandom", fake_urandom)


def _golden_bytes(name: str) -> bytes:
    with open(os.path.join(GOLDEN, name), "rb") as f:
        return f.read()


TABLE_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("ts", TimestampType(), True),
        StructField("name", StringType(), True),
    ]
)


class TestGoldenWrite:
    def test_create_and_append_write_exact_golden_bytes(self, frozen):
        """End-to-end byte pin: create table + append two files with all
        randomness frozen; every artifact must equal the independently
        spec-encoded fixture byte for byte."""
        root = os.path.dirname(GEN.LOC.rstrip("/"))  # .../wh/otel
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)
        catalog = FsCatalog("/tmp/spark_graft_golden/wh")
        table = catalog.create_table(
            "otel",
            "gold",
            TABLE_SCHEMA,
            partition_source="ts",
            granularity="hourly",
            properties={"owner": "golden"},
        )
        assert table.location == GEN.LOC

        got_v1 = _golden_bytes("v1.metadata.json")
        with open(os.path.join(GEN.LOC, "metadata", "v1.metadata.json"), "rb") as f:
            assert f.read() == got_v1

        files = [
            DataFile(GEN.FILE_A, 1234, 10, {"ts_hour": 473040}),
            DataFile(GEN.FILE_B, 567, 3, {"ts_hour": None}),
        ]
        sid = table.append_files(files)
        assert sid == GEN.SNAPSHOT_ID

        manifest_path = os.path.join(
            GEN.LOC, "metadata", f"{GEN.MANIFEST_UUID_HEX}-m0.avro"
        )
        list_path = os.path.join(
            GEN.LOC, "metadata", f"snap-{GEN.SNAPSHOT_ID}-1-{GEN.LIST_UUID_HEX}.avro"
        )
        with open(manifest_path, "rb") as f:
            assert f.read() == _golden_bytes("manifest.avro"), "manifest byte drift"
        with open(list_path, "rb") as f:
            assert f.read() == _golden_bytes("manifest-list.avro"), "manifest-list byte drift"
        with open(os.path.join(GEN.LOC, "metadata", "v2.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("v2.metadata.json"), "metadata JSON drift"

        # third artifact set: a merge-on-read position-delete commit —
        # the DELETE manifest (content=1, -m1 suffix), its manifest list
        # (new delete manifest + carried data manifest), and v3 metadata
        sid2 = table._commit_with_retry(
            [
                DataFile(
                    GEN.DELETE_FILE,
                    GEN.DELETE_FILE_SIZE,
                    GEN.DELETE_ROW_COUNT,
                    {},
                    content=1,
                )
            ],
            operation="delete",
            carry_forward=True,
            extra_summary={"deleted-records": str(GEN.DELETE_ROW_COUNT)},
        )
        assert sid2 == GEN.SNAPSHOT2_ID
        with open(
            os.path.join(GEN.LOC, "metadata", f"{GEN.DELETE_MANIFEST_UUID_HEX}-m1.avro"),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("delete-manifest.avro"), "delete manifest drift"
        with open(
            os.path.join(
                GEN.LOC,
                "metadata",
                f"snap-{GEN.SNAPSHOT2_ID}-1-{GEN.DELETE_LIST_UUID_HEX}.avro",
            ),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("delete-manifest-list.avro"), (
                "delete manifest-list drift"
            )
        with open(os.path.join(GEN.LOC, "metadata", "v3.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("v3.metadata.json"), "v3 metadata drift"

        # fourth artifact set: a merge-on-read EQUALITY-delete commit —
        # content=2 entry with equality_ids in a content=1 manifest
        sid3 = table._commit_with_retry(
            [
                DataFile(
                    GEN.EQ_FILE,
                    GEN.EQ_FILE_SIZE,
                    GEN.EQ_ROW_COUNT,
                    {},
                    content=2,
                    equality_ids=tuple(GEN.EQ_FIELD_IDS),
                )
            ],
            operation="delete",
            carry_forward=True,
            extra_summary={"deleted-key-tuples": str(GEN.EQ_ROW_COUNT)},
        )
        assert sid3 == GEN.SNAPSHOT3_ID
        with open(
            os.path.join(GEN.LOC, "metadata", f"{GEN.EQ_MANIFEST_UUID_HEX}-m1.avro"),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("eq-manifest.avro"), "eq manifest drift"
        with open(
            os.path.join(
                GEN.LOC,
                "metadata",
                f"snap-{GEN.SNAPSHOT3_ID}-1-{GEN.EQ_LIST_UUID_HEX}.avro",
            ),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("eq-manifest-list.avro"), (
                "eq manifest-list drift"
            )
        with open(os.path.join(GEN.LOC, "metadata", "v4.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("v4.metadata.json"), "v4 metadata drift"

        # fifth artifact set: rewrite_manifests — the two small delete
        # manifests merge into one EXISTING-entry manifest (original
        # snapshot ids + explicit seqs preserved byte-exactly), the data
        # manifest is carried verbatim, and the commit is a metadata-only
        # `replace` snapshot
        sid4 = table.rewrite_manifests(min_count=2)
        assert sid4 == GEN.SNAPSHOT4_ID
        with open(
            os.path.join(GEN.LOC, "metadata", f"{GEN.MERGED_MANIFEST_UUID_HEX}-m1.avro"),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("merged-manifest.avro"), (
                "merged manifest drift"
            )
        with open(
            os.path.join(
                GEN.LOC,
                "metadata",
                f"snap-{GEN.SNAPSHOT4_ID}-1-{GEN.MERGED_LIST_UUID_HEX}.avro",
            ),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("merged-manifest-list.avro"), (
                "merged manifest-list drift"
            )
        with open(os.path.join(GEN.LOC, "metadata", "v5.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("v5.metadata.json"), "v5 metadata drift"

        # sixth artifact set: a DELETION-VECTOR delete — roaring bitmap
        # in a deletion-vector-v1 Puffin blob (positions {0,2} of file
        # A), manifest entry with the v3 locator fields 143-145
        import numpy as np

        from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
            write_deletion_vector_file,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.roaring import serialize_64

        vec = serialize_64(np.array(GEN.DV_POSITIONS, dtype=np.uint64))
        dv_path, spans = write_deletion_vector_file(
            GEN.LOC, {GEN.FILE_A: (vec, len(GEN.DV_POSITIONS))}, sequence_number=5
        )
        assert dv_path == GEN.DV_PUFFIN_PATH
        with open(dv_path, "rb") as f:
            assert f.read() == _golden_bytes("dv.puffin"), "DV puffin drift"
        off, length, card = spans[GEN.FILE_A]
        sid5 = table._commit_with_retry(
            [
                DataFile(
                    dv_path,
                    os.path.getsize(dv_path),
                    card,
                    {},
                    content=1,
                    referenced_data_file=GEN.FILE_A,
                    content_offset=off,
                    content_size_in_bytes=length,
                )
            ],
            operation="delete",
            carry_forward=True,
            extra_summary={
                "deleted-records": str(card),
                "added-dvs": "1",
            },
        )
        assert sid5 == GEN.SNAPSHOT5_ID
        with open(
            os.path.join(GEN.LOC, "metadata", f"{GEN.DV_MANIFEST_UUID_HEX}-m1.avro"),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("dv-manifest.avro"), "DV manifest drift"
        with open(
            os.path.join(
                GEN.LOC,
                "metadata",
                f"snap-{GEN.SNAPSHOT5_ID}-1-{GEN.DV_LIST_UUID_HEX}.avro",
            ),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("dv-manifest-list.avro"), (
                "DV manifest-list drift"
            )
        with open(os.path.join(GEN.LOC, "metadata", "v6.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("v6.metadata.json"), "v6 metadata drift"

        # seventh artifact set: a SECOND DV delete on FILE_A — the v3
        # one-DV-per-file FOLD-ON-WRITE commit: the new Puffin holds the
        # UNION of prior and new positions, and the snapshot-5 entry is
        # superseded via a rewritten carried manifest whose entry flips
        # to status=DELETED with its original snapshot id and seqs
        vec2 = serialize_64(np.array(GEN.DV2_UNION_POSITIONS, dtype=np.uint64))
        dv2_path, spans2 = write_deletion_vector_file(
            GEN.LOC,
            {GEN.FILE_A: (vec2, len(GEN.DV2_UNION_POSITIONS))},
            sequence_number=6,
        )
        assert dv2_path == GEN.DV2_PUFFIN_PATH
        with open(dv2_path, "rb") as f:
            assert f.read() == _golden_bytes("dv2.puffin"), "fold DV puffin drift"
        off2, len2, card2 = spans2[GEN.FILE_A]
        superseded = DataFile(
            dv_path,
            os.path.getsize(dv_path),
            card,
            {},
            content=1,
            sequence_number=5,
            referenced_data_file=GEN.FILE_A,
            content_offset=off,
            content_size_in_bytes=length,
        )
        sid6 = table._commit_with_retry(
            [
                DataFile(
                    dv2_path,
                    os.path.getsize(dv2_path),
                    card2,
                    {},
                    content=1,
                    referenced_data_file=GEN.FILE_A,
                    content_offset=off2,
                    content_size_in_bytes=len2,
                )
            ],
            operation="delete",
            carry_forward=True,
            extra_summary={
                "deleted-records": str(len(GEN.DV2_NEW_POSITIONS)),
                "added-dvs": "1",
            },
            removed_files=[superseded],
        )
        assert sid6 == GEN.SNAPSHOT6_ID
        with open(
            os.path.join(GEN.LOC, "metadata", f"{GEN.DV2_MANIFEST_UUID_HEX}-m1.avro"),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("dv2-manifest.avro"), (
                "fold DV manifest drift"
            )
        with open(
            os.path.join(
                GEN.LOC,
                "metadata",
                f"{GEN.SUPERSEDED_MANIFEST_UUID_HEX}-m1.avro",
            ),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("superseded-dv-manifest.avro"), (
                "superseded manifest drift"
            )
        with open(
            os.path.join(
                GEN.LOC,
                "metadata",
                f"snap-{GEN.SNAPSHOT6_ID}-1-{GEN.DV2_LIST_UUID_HEX}.avro",
            ),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("dv2-manifest-list.avro"), (
                "fold manifest-list drift"
            )
        with open(os.path.join(GEN.LOC, "metadata", "v7.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("v7.metadata.json"), "v7 metadata drift"
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)

    def test_v3_lineage_chain_writes_exact_golden_bytes(self, monkeypatch):
        """A SEPARATE table chain (the main one carries live parquet
        position deletes, which the upgrade ceremony refuses by design):
        create -> upgrade_format_version(3) -> append. Pins the
        upgrade's metadata shape (format-version 3 + next-row-id), the
        field-142 first_row_id manifest layout, and the snapshot's
        first-row-id/added-rows advancing next-row-id — all against the
        independent spec encoder."""
        import uuid as uuid_mod

        uuids = iter(
            [
                uuid_mod.UUID(GEN.LN_TABLE_UUID),  # table-uuid
                uuid_mod.UUID(hex="a" * 32),  # version-hint tmp (create)
                uuid_mod.UUID(hex="b" * 32),  # version-hint tmp (upgrade)
                uuid_mod.UUID(hex=GEN.LN_MANIFEST_UUID_HEX),
                uuid_mod.UUID(hex=GEN.LN_LIST_UUID_HEX),
                uuid_mod.UUID(hex="c" * 32),  # version-hint tmp (append)
            ]
        )
        times = iter(
            [
                GEN.T_LN_CREATE_MS / 1000.0,
                GEN.T_LN_UPGRADE_MS / 1000.0,
                GEN.T_LN_APPEND_MS / 1000.0,
            ]
        )

        def fake_urandom(n: int) -> bytes:
            if n == 8:
                return GEN.LN_SNAPSHOT_SEED
            if n == 16:
                return GEN.SYNC
            raise AssertionError(f"unexpected urandom({n})")

        monkeypatch.setattr(iceberg_fs.uuid, "uuid4", lambda: next(uuids))
        monkeypatch.setattr(iceberg_fs.time, "time", lambda: next(times))
        monkeypatch.setattr(iceberg_fs.os, "urandom", fake_urandom)
        monkeypatch.setattr(avro_ocf.os, "urandom", fake_urandom)

        shutil.rmtree("/tmp/spark_graft_golden/wh/otel/gold3", ignore_errors=True)
        catalog = FsCatalog("/tmp/spark_graft_golden/wh")
        table = catalog.create_table(
            "otel",
            "gold3",
            TABLE_SCHEMA,
            partition_source="ts",
            granularity="hourly",
            properties={"owner": "golden"},
        )
        assert table.location == GEN.LN_LOC
        with open(os.path.join(GEN.LN_LOC, "metadata", "v1.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("ln-v1.metadata.json")

        assert table.upgrade_format_version(3) == 3
        with open(os.path.join(GEN.LN_LOC, "metadata", "v2.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("ln-v2.metadata.json"), (
                "upgrade metadata drift"
            )

        sid = table.append_files(
            [
                DataFile(GEN.LN_FILE_A, GEN.LN_FILE_A_SIZE, GEN.LN_FILE_A_ROWS,
                         {"ts_hour": 473042}),
                DataFile(GEN.LN_FILE_B, GEN.LN_FILE_B_SIZE, GEN.LN_FILE_B_ROWS,
                         {"ts_hour": None}),
            ]
        )
        assert sid == GEN.LN_SNAPSHOT_ID
        with open(
            os.path.join(GEN.LN_LOC, "metadata", f"{GEN.LN_MANIFEST_UUID_HEX}-m0.avro"),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("ln-manifest.avro"), (
                "lineage manifest drift"
            )
        with open(
            os.path.join(
                GEN.LN_LOC,
                "metadata",
                f"snap-{GEN.LN_SNAPSHOT_ID}-1-{GEN.LN_LIST_UUID_HEX}.avro",
            ),
            "rb",
        ) as f:
            assert f.read() == _golden_bytes("ln-manifest-list.avro"), (
                "lineage manifest-list drift"
            )
        with open(os.path.join(GEN.LN_LOC, "metadata", "v3.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("ln-v3.metadata.json"), (
                "lineage metadata drift"
            )
        shutil.rmtree("/tmp/spark_graft_golden/wh/otel/gold3", ignore_errors=True)

    def test_generator_is_byte_stable(self, tmp_path):
        """Regenerating the fixtures reproduces the committed bytes —
        the generator itself is deterministic (no hidden entropy)."""
        import subprocess
        import sys

        work = tmp_path / "golden"
        work.mkdir()
        shutil.copy(os.path.join(GOLDEN, "make_golden.py"), work / "make_golden.py")
        subprocess.run([sys.executable, str(work / "make_golden.py")], check=True)
        for name in (
            "manifest.avro",
            "manifest-list.avro",
            "delete-manifest.avro",
            "delete-manifest-list.avro",
            "eq-manifest.avro",
            "eq-manifest-list.avro",
            "v1.metadata.json",
            "v2.metadata.json",
            "v3.metadata.json",
            "v4.metadata.json",
            "stats.puffin",
            "ln-manifest.avro",
            "ln-manifest-list.avro",
            "ln-v1.metadata.json",
            "ln-v2.metadata.json",
            "ln-v3.metadata.json",
            "tns-v1.metadata.json",
            "var-v1.metadata.json",
            "geo-v1.metadata.json",
        ):
            with open(work / name, "rb") as f:
                assert f.read() == _golden_bytes(name), name

    def test_variant_v3_birth_metadata(self, monkeypatch):
        """A v3-BIRTH unpartitioned table with a `variant` column: the
        engine's first metadata file is byte-identical to the spec-side
        generator's var-v1.metadata.json."""
        import uuid as uuid_mod

        from pyspark.sql.types import (
            LongType,
            StructField,
            StructType,
            TimestampType,
        )

        try:
            from pyspark.sql.types import VariantType
        except ImportError:
            pytest.skip("Spark VariantType unavailable")

        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs

        uuids = iter(
            [
                uuid_mod.UUID(GEN.VAR_TABLE_UUID),  # table-uuid
                uuid_mod.UUID(hex="a" * 32),  # version-hint tmp
            ]
        )
        monkeypatch.setattr(iceberg_fs.uuid, "uuid4", lambda: next(uuids))
        monkeypatch.setattr(
            iceberg_fs.time, "time", lambda: GEN.T_VAR_CREATE_MS / 1000.0
        )

        shutil.rmtree("/tmp/spark_graft_golden/wh/otel/goldvar", ignore_errors=True)
        catalog = FsCatalog("/tmp/spark_graft_golden/wh")
        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("ts", TimestampType(), True),
                StructField("attrs", VariantType(), True),
            ]
        )
        table = catalog.create_table(
            "otel",
            "goldvar",
            schema,
            properties={"owner": "golden", "format-version": "3"},
        )
        assert table.location == GEN.VAR_LOC
        with open(os.path.join(GEN.VAR_LOC, "metadata", "v1.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("var-v1.metadata.json"), (
                "variant v3-birth metadata drift"
            )
        shutil.rmtree("/tmp/spark_graft_golden/wh/otel/goldvar", ignore_errors=True)

    def test_geo_v3_birth_metadata(self, monkeypatch):
        """A v3-BIRTH table with geometry/geography columns (BinaryType
        WKB + iceberg_types overrides, parameterized and default forms):
        the engine's first metadata file is byte-identical to the
        spec-side generator's geo-v1.metadata.json."""
        import uuid as uuid_mod

        from pyspark.sql.types import BinaryType, LongType, StructField, StructType

        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs

        uuids = iter(
            [
                uuid_mod.UUID(GEN.GEO_TABLE_UUID),  # table-uuid
                uuid_mod.UUID(hex="a" * 32),  # version-hint tmp
            ]
        )
        monkeypatch.setattr(iceberg_fs.uuid, "uuid4", lambda: next(uuids))
        monkeypatch.setattr(
            iceberg_fs.time, "time", lambda: GEN.T_GEO_CREATE_MS / 1000.0
        )

        shutil.rmtree("/tmp/spark_graft_golden/wh/otel/goldgeo", ignore_errors=True)
        catalog = FsCatalog("/tmp/spark_graft_golden/wh")
        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("shape", BinaryType(), True),
                StructField("area", BinaryType(), True),
                StructField("route", BinaryType(), True),
            ]
        )
        table = catalog.create_table(
            "otel",
            "goldgeo",
            schema,
            properties={"owner": "golden", "format-version": "3"},
            iceberg_types={
                "shape": "geometry",
                "area": "geometry(srid:3857)",
                "route": "geography(OGC:CRS84, karney)",
            },
        )
        assert table.location == GEN.GEO_LOC
        with open(os.path.join(GEN.GEO_LOC, "metadata", "v1.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("geo-v1.metadata.json"), (
                "geospatial v3-birth metadata drift"
            )
        shutil.rmtree("/tmp/spark_graft_golden/wh/otel/goldgeo", ignore_errors=True)

    def test_view_metadata(self, spark, monkeypatch):
        """A created VIEW's first metadata file (view spec v1) is
        byte-identical to the spec-side generator's
        view-v1.metadata.json — uuid/clock frozen, the SQL's analyzed
        schema recorded."""
        import uuid as uuid_mod

        from pyspark.sql.types import StringType, StructField, StructType

        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_views

        for leftover in ("goldview", "gvsrc"):
            shutil.rmtree(
                f"/tmp/spark_graft_golden/wh/otel/{leftover}", ignore_errors=True
            )
        catalog = FsCatalog("/tmp/spark_graft_golden/wh")
        catalog.create_table(
            "otel", "gvsrc", StructType([StructField("name", StringType(), True)])
        )
        import types

        uuids = iter(
            [
                uuid_mod.UUID(GEN.VIEW_UUID),  # view-uuid
                uuid_mod.UUID(hex="b" * 32),  # view-hint tmp
            ]
        )
        # patch the MODULE's namespace, not the global uuid/time modules
        # (a live SparkSession may call uuid4 internally mid-create)
        monkeypatch.setattr(
            iceberg_views, "uuid", types.SimpleNamespace(uuid4=lambda: next(uuids))
        )
        monkeypatch.setattr(
            iceberg_views,
            "time",
            types.SimpleNamespace(time=lambda: GEN.T_VIEW_CREATE_MS / 1000.0),
        )
        view = catalog.create_view(
            spark,
            "otel",
            "goldview",
            GEN.VIEW_SQL_TEXT,
            properties={"comment": "golden view"},
        )
        assert view.location == GEN.VIEW_LOC
        with open(os.path.join(GEN.VIEW_LOC, "metadata", "v1.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("view-v1.metadata.json"), (
                "view metadata drift"
            )
        for leftover in ("goldview", "gvsrc"):
            shutil.rmtree(
                f"/tmp/spark_graft_golden/wh/otel/{leftover}", ignore_errors=True
            )

    def test_ns_timestamp_v3_birth_metadata(self, monkeypatch):
        """A v3-BIRTH table with a timestamptz_ns column + hours spec:
        the engine's first metadata file is byte-identical to the
        spec-side generator's tns-v1.metadata.json (no upgrade ceremony
        — format-version 3 and next-row-id from creation)."""
        import uuid as uuid_mod

        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs

        uuids = iter(
            [
                uuid_mod.UUID(GEN.TNS_TABLE_UUID),  # table-uuid
                uuid_mod.UUID(hex="a" * 32),  # version-hint tmp
            ]
        )
        monkeypatch.setattr(iceberg_fs.uuid, "uuid4", lambda: next(uuids))
        monkeypatch.setattr(
            iceberg_fs.time, "time", lambda: GEN.T_TNS_CREATE_MS / 1000.0
        )

        shutil.rmtree("/tmp/spark_graft_golden/wh/otel/goldns", ignore_errors=True)
        catalog = FsCatalog("/tmp/spark_graft_golden/wh")
        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("ts_ns", LongType(), True),  # epoch-nanos
                StructField("name", StringType(), True),
            ]
        )
        table = catalog.create_table(
            "otel",
            "goldns",
            schema,
            partition_source="ts_ns",
            granularity="hourly",
            properties={"owner": "golden", "format-version": "3"},
            iceberg_types={"ts_ns": "timestamptz_ns"},
        )
        assert table.location == GEN.TNS_LOC
        with open(os.path.join(GEN.TNS_LOC, "metadata", "v1.metadata.json"), "rb") as f:
            assert f.read() == _golden_bytes("tns-v1.metadata.json"), (
                "ns-timestamp v3-birth metadata drift"
            )
        shutil.rmtree("/tmp/spark_graft_golden/wh/otel/goldns", ignore_errors=True)


class TestGoldenPuffin:
    """The Puffin container byte format, pinned against the independent
    spec encoder in make_golden.py (which imports nothing from the
    package)."""

    def test_package_writes_exact_golden_bytes(self, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
            encode_kmv,
            write_puffin,
        )

        g = GEN

        path = str(tmp_path / "stats.puffin")
        write_puffin(
            path,
            [
                {
                    "type": "engine-kmv-ndv-v1",
                    "fields": [1],
                    "snapshot-id": g.SNAPSHOT_ID,
                    "sequence-number": g.PUFFIN_SEQ,
                    "payload": encode_kmv(g.PUFFIN_HASHES, k=g.PUFFIN_K),
                    "properties": {"ndv": str(g.PUFFIN_NDV)},
                }
            ],
            {"created-by": "otel-spark-engine"},
        )
        with open(path, "rb") as f:
            assert f.read() == _golden_bytes("stats.puffin")

    def test_package_reads_independent_bytes(self):
        from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
            decode_kmv,
            kmv_estimate,
            read_puffin,
        )

        g = GEN

        meta, payloads = read_puffin(os.path.join(GOLDEN, "stats.puffin"))
        (bm,) = meta["blobs"]
        assert bm["type"] == "engine-kmv-ndv-v1"
        assert bm["snapshot-id"] == g.SNAPSHOT_ID
        assert bm["properties"] == {"ndv": str(g.PUFFIN_NDV)}
        k, hashes = decode_kmv(payloads[0])
        assert (k, hashes) == (g.PUFFIN_K, g.PUFFIN_HASHES)
        assert kmv_estimate(k, hashes) == float(len(g.PUFFIN_HASHES))


class TestGoldenRead:
    @pytest.fixture()
    def golden_table(self):
        """Materialize the fixture table at its frozen location (paths
        inside the fixtures are absolute) and hand it to FsTable."""
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)
        meta_dir = os.path.join(GEN.LOC, "metadata")
        os.makedirs(meta_dir)
        for src, dst in (
            ("v1.metadata.json", "v1.metadata.json"),
            ("v2.metadata.json", "v2.metadata.json"),
            ("manifest.avro", f"{GEN.MANIFEST_UUID_HEX}-m0.avro"),
            ("manifest-list.avro", f"snap-{GEN.SNAPSHOT_ID}-1-{GEN.LIST_UUID_HEX}.avro"),
        ):
            shutil.copy(os.path.join(GOLDEN, src), os.path.join(meta_dir, dst))
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
            f.write("2")
        yield FsTable(GEN.LOC)
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)

    def test_package_reads_independent_bytes(self, golden_table):
        t = golden_table
        md = t.metadata()
        assert md["table-uuid"] == GEN.TABLE_UUID
        assert t.current_snapshot()["snapshot-id"] == GEN.SNAPSHOT_ID
        assert t.all_files() == sorted([GEN.FILE_A, GEN.FILE_B])
        files, pruned = t.plan_files()
        assert {f.file_path: f.record_count for f in files} == {
            GEN.FILE_A: 10,
            GEN.FILE_B: 3,
        }
        # null-partition file survives pruning (never pruned); the
        # partitioned file prunes by range
        files_in, _ = t.plan_files(partition_range=(473040, 473040))
        assert {f.file_path for f in files_in} == {GEN.FILE_A, GEN.FILE_B}
        files_out, pruned = t.plan_files(partition_range=(0, 1))
        assert {f.file_path for f in files_out} == {GEN.FILE_B} and pruned == 1

    def test_incremental_scan_over_golden(self, golden_table):
        files, end = golden_table.incremental_scan()
        assert end == GEN.SNAPSHOT_ID
        assert {f.file_path for f in files} == {GEN.FILE_A, GEN.FILE_B}

    @pytest.fixture()
    def golden_table_v3(self):
        """The fixture table AFTER the independently-encoded
        merge-on-read delete commit (version-hint 3)."""
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)
        meta_dir = os.path.join(GEN.LOC, "metadata")
        os.makedirs(meta_dir)
        for src, dst in (
            ("v1.metadata.json", "v1.metadata.json"),
            ("v2.metadata.json", "v2.metadata.json"),
            ("v3.metadata.json", "v3.metadata.json"),
            ("manifest.avro", f"{GEN.MANIFEST_UUID_HEX}-m0.avro"),
            ("manifest-list.avro", f"snap-{GEN.SNAPSHOT_ID}-1-{GEN.LIST_UUID_HEX}.avro"),
            ("delete-manifest.avro", f"{GEN.DELETE_MANIFEST_UUID_HEX}-m1.avro"),
            (
                "delete-manifest-list.avro",
                f"snap-{GEN.SNAPSHOT2_ID}-1-{GEN.DELETE_LIST_UUID_HEX}.avro",
            ),
        ):
            shutil.copy(os.path.join(GOLDEN, src), os.path.join(meta_dir, dst))
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
            f.write("3")
        yield FsTable(GEN.LOC)
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)

    def test_package_reads_independent_delete_commit(self, golden_table_v3):
        t = golden_table_v3
        assert t.current_snapshot()["snapshot-id"] == GEN.SNAPSHOT2_ID
        assert t.current_snapshot()["summary"]["operation"] == "delete"
        data, deletes, _ = t.plan_scan()
        assert {f.file_path for f in data} == {GEN.FILE_A, GEN.FILE_B}
        assert [f.file_path for f in deletes] == [GEN.DELETE_FILE]
        assert deletes[0].content == 1
        assert deletes[0].record_count == GEN.DELETE_ROW_COUNT
        # the delete file is a first-class reference
        assert GEN.DELETE_FILE in t.all_files()
        # time travel to the pre-delete snapshot sees no delete files
        data1, deletes1, _ = t.plan_scan(snapshot_id=GEN.SNAPSHOT_ID)
        assert deletes1 == [] and len(data1) == 2
        # incremental scans refuse to cross the delete snapshot
        with pytest.raises(ValueError, match="delete"):
            t.incremental_files(from_snapshot_id=GEN.SNAPSHOT_ID)

    @pytest.fixture()
    def golden_table_v4(self):
        """The fixture table AFTER the independently-encoded
        equality-delete commit (version-hint 4)."""
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)
        meta_dir = os.path.join(GEN.LOC, "metadata")
        os.makedirs(meta_dir)
        for src, dst in (
            ("v1.metadata.json", "v1.metadata.json"),
            ("v2.metadata.json", "v2.metadata.json"),
            ("v3.metadata.json", "v3.metadata.json"),
            ("v4.metadata.json", "v4.metadata.json"),
            ("manifest.avro", f"{GEN.MANIFEST_UUID_HEX}-m0.avro"),
            ("manifest-list.avro", f"snap-{GEN.SNAPSHOT_ID}-1-{GEN.LIST_UUID_HEX}.avro"),
            ("delete-manifest.avro", f"{GEN.DELETE_MANIFEST_UUID_HEX}-m1.avro"),
            (
                "delete-manifest-list.avro",
                f"snap-{GEN.SNAPSHOT2_ID}-1-{GEN.DELETE_LIST_UUID_HEX}.avro",
            ),
            ("eq-manifest.avro", f"{GEN.EQ_MANIFEST_UUID_HEX}-m1.avro"),
            (
                "eq-manifest-list.avro",
                f"snap-{GEN.SNAPSHOT3_ID}-1-{GEN.EQ_LIST_UUID_HEX}.avro",
            ),
        ):
            shutil.copy(os.path.join(GOLDEN, src), os.path.join(meta_dir, dst))
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
            f.write("4")
        yield FsTable(GEN.LOC)
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)

    def test_package_reads_independent_equality_delete_commit(self, golden_table_v4):
        t = golden_table_v4
        assert t.current_snapshot()["snapshot-id"] == GEN.SNAPSHOT3_ID
        data, deletes, _ = t.plan_scan()
        assert {f.file_path for f in data} == {GEN.FILE_A, GEN.FILE_B}
        by_path = {f.file_path: f for f in deletes}
        assert set(by_path) == {GEN.DELETE_FILE, GEN.EQ_FILE}
        eq = by_path[GEN.EQ_FILE]
        assert eq.content == 2
        assert eq.equality_ids == tuple(GEN.EQ_FIELD_IDS)
        assert eq.sequence_number == 3
        # data files carry their original (commit 1) sequence numbers —
        # the strict seq<delete comparison depends on this
        assert all(f.sequence_number == 1 for f in data)
        assert by_path[GEN.DELETE_FILE].sequence_number == 2

    @pytest.fixture()
    def golden_table_v5(self):
        """The fixture table AFTER the independently-encoded
        rewrite_manifests commit (version-hint 5)."""
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)
        meta_dir = os.path.join(GEN.LOC, "metadata")
        os.makedirs(meta_dir)
        for src, dst in (
            ("v1.metadata.json", "v1.metadata.json"),
            ("v2.metadata.json", "v2.metadata.json"),
            ("v3.metadata.json", "v3.metadata.json"),
            ("v4.metadata.json", "v4.metadata.json"),
            ("v5.metadata.json", "v5.metadata.json"),
            ("manifest.avro", f"{GEN.MANIFEST_UUID_HEX}-m0.avro"),
            ("manifest-list.avro", f"snap-{GEN.SNAPSHOT_ID}-1-{GEN.LIST_UUID_HEX}.avro"),
            ("delete-manifest.avro", f"{GEN.DELETE_MANIFEST_UUID_HEX}-m1.avro"),
            (
                "delete-manifest-list.avro",
                f"snap-{GEN.SNAPSHOT2_ID}-1-{GEN.DELETE_LIST_UUID_HEX}.avro",
            ),
            ("eq-manifest.avro", f"{GEN.EQ_MANIFEST_UUID_HEX}-m1.avro"),
            (
                "eq-manifest-list.avro",
                f"snap-{GEN.SNAPSHOT3_ID}-1-{GEN.EQ_LIST_UUID_HEX}.avro",
            ),
            ("merged-manifest.avro", f"{GEN.MERGED_MANIFEST_UUID_HEX}-m1.avro"),
            (
                "merged-manifest-list.avro",
                f"snap-{GEN.SNAPSHOT4_ID}-1-{GEN.MERGED_LIST_UUID_HEX}.avro",
            ),
        ):
            shutil.copy(os.path.join(GOLDEN, src), os.path.join(meta_dir, dst))
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
            f.write("5")
        yield FsTable(GEN.LOC)
        shutil.rmtree("/tmp/spark_graft_golden", ignore_errors=True)

    def test_package_reads_independent_rewritten_manifests(self, golden_table_v5):
        """The merged EXISTING-entry manifest must plan exactly like the
        pre-rewrite manifests: same live set, same delete files, and —
        critically — the ORIGINAL sequence numbers (equality deletes
        apply to seq strictly below theirs)."""
        t = golden_table_v5
        assert t.current_snapshot()["snapshot-id"] == GEN.SNAPSHOT4_ID
        assert t.current_snapshot()["summary"]["operation"] == "replace"
        data, deletes, _ = t.plan_scan()
        assert {f.file_path for f in data} == {GEN.FILE_A, GEN.FILE_B}
        by_path = {f.file_path: f for f in deletes}
        assert set(by_path) == {GEN.DELETE_FILE, GEN.EQ_FILE}
        assert by_path[GEN.EQ_FILE].sequence_number == 3  # NOT the rewrite's 4
        assert by_path[GEN.EQ_FILE].equality_ids == tuple(GEN.EQ_FIELD_IDS)
        assert by_path[GEN.DELETE_FILE].sequence_number == 2
        assert all(f.sequence_number == 1 for f in data)
        # the replace snapshot is invisible to incremental consumers
        files, end = t.incremental_scan(from_snapshot_id=GEN.SNAPSHOT3_ID)
        assert files == [] and end == GEN.SNAPSHOT4_ID
        # time travel to every pre-rewrite snapshot still resolves
        for sid, n_del in (
            (GEN.SNAPSHOT_ID, 0),
            (GEN.SNAPSHOT2_ID, 1),
            (GEN.SNAPSHOT3_ID, 2),
        ):
            d_, dels_, _ = t.plan_scan(snapshot_id=sid)
            assert len(d_) == 2 and len(dels_) == n_del

    @pytest.fixture()
    def golden_table_v6(self, golden_table_v5):
        """v5 plus the independently-encoded deletion-vector commit."""
        meta_dir = os.path.join(GEN.LOC, "metadata")
        os.makedirs(os.path.dirname(GEN.DV_PUFFIN_PATH), exist_ok=True)
        for src, dst in (
            ("v6.metadata.json", os.path.join(meta_dir, "v6.metadata.json")),
            ("dv-manifest.avro", os.path.join(meta_dir, f"{GEN.DV_MANIFEST_UUID_HEX}-m1.avro")),
            (
                "dv-manifest-list.avro",
                os.path.join(
                    meta_dir, f"snap-{GEN.SNAPSHOT5_ID}-1-{GEN.DV_LIST_UUID_HEX}.avro"
                ),
            ),
            ("dv.puffin", GEN.DV_PUFFIN_PATH),
        ):
            shutil.copy(os.path.join(GOLDEN, src), dst)
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
            f.write("6")
        return golden_table_v5  # same location, now at v6

    def test_package_reads_independent_dv_commit(self, golden_table_v6):
        """The package must plan the spec-encoded DV commit exactly:
        locator fields through to the DataFile, and the roaring blob
        decodes to the expected positions via its manifest span."""
        import numpy as np

        from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
            read_deletion_vector_span,
        )

        t = golden_table_v6
        assert t.current_snapshot()["snapshot-id"] == GEN.SNAPSHOT5_ID
        data, deletes, _ = t.plan_scan()
        dv = [f for f in deletes if f.is_deletion_vector]
        assert len(dv) == 1
        assert dv[0].file_path == GEN.DV_PUFFIN_PATH
        assert dv[0].referenced_data_file == GEN.FILE_A
        assert dv[0].content_offset == 4
        assert dv[0].record_count == len(GEN.DV_POSITIONS)
        assert dv[0].sequence_number == 5
        pos = read_deletion_vector_span(
            dv[0].file_path, dv[0].content_offset, dv[0].content_size_in_bytes
        )
        assert np.array_equal(pos, np.array(GEN.DV_POSITIONS, dtype=np.uint64))
        # pre-DV deletes carried through with original sequence numbers
        by_path = {f.file_path: f for f in deletes}
        assert by_path[GEN.EQ_FILE].sequence_number == 3
        assert by_path[GEN.DELETE_FILE].sequence_number == 2
        # the summary totals count the blob span
        s = t.current_snapshot()["summary"]
        assert s["total-delete-files"] == "3"
        assert s["total-position-deletes"] == str(
            GEN.DELETE_ROW_COUNT + len(GEN.DV_POSITIONS)
        )

    @pytest.fixture()
    def golden_table_v7(self, golden_table_v6):
        """v6 plus the independently-encoded FOLD commit (second DV on
        FILE_A: unioned vector + superseded snapshot-5 entry)."""
        meta_dir = os.path.join(GEN.LOC, "metadata")
        for src, dst in (
            ("v7.metadata.json", os.path.join(meta_dir, "v7.metadata.json")),
            (
                "dv2-manifest.avro",
                os.path.join(meta_dir, f"{GEN.DV2_MANIFEST_UUID_HEX}-m1.avro"),
            ),
            (
                "superseded-dv-manifest.avro",
                os.path.join(
                    meta_dir, f"{GEN.SUPERSEDED_MANIFEST_UUID_HEX}-m1.avro"
                ),
            ),
            (
                "dv2-manifest-list.avro",
                os.path.join(
                    meta_dir,
                    f"snap-{GEN.SNAPSHOT6_ID}-1-{GEN.DV2_LIST_UUID_HEX}.avro",
                ),
            ),
            ("dv2.puffin", GEN.DV2_PUFFIN_PATH),
        ):
            shutil.copy(os.path.join(GOLDEN, src), dst)
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
            f.write("7")
        return golden_table_v6  # same location, now at v7

    def test_package_reads_independent_fold_commit(self, golden_table_v7):
        """After the spec-encoded fold commit the package must see
        EXACTLY ONE live vector for FILE_A — the union — with the
        superseded entry invisible (DELETED marker), prior plain deletes
        untouched, totals tracking the live set, and time travel still
        resolving the pre-fold stack."""
        import numpy as np

        from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
            read_deletion_vector_span,
        )

        t = golden_table_v7
        assert t.current_snapshot()["snapshot-id"] == GEN.SNAPSHOT6_ID
        data, deletes, _ = t.plan_scan()
        dv = [f for f in deletes if f.is_deletion_vector]
        assert len(dv) == 1  # ONE live vector per data file — the invariant
        assert dv[0].file_path == GEN.DV2_PUFFIN_PATH
        assert dv[0].referenced_data_file == GEN.FILE_A
        assert dv[0].record_count == len(GEN.DV2_UNION_POSITIONS)
        assert dv[0].sequence_number == 6
        pos = read_deletion_vector_span(
            dv[0].file_path, dv[0].content_offset, dv[0].content_size_in_bytes
        )
        assert np.array_equal(
            pos, np.array(GEN.DV2_UNION_POSITIONS, dtype=np.uint64)
        )
        # prior plain deletes untouched, with original sequence numbers
        by_path = {f.file_path: f for f in deletes}
        assert by_path[GEN.EQ_FILE].sequence_number == 3
        assert by_path[GEN.DELETE_FILE].sequence_number == 2
        # totals track the LIVE set: still 3 delete files, position
        # deletes = plain (4) + union (4)
        s = t.current_snapshot()["summary"]
        assert s["total-delete-files"] == "3"
        assert s["total-position-deletes"] == str(
            GEN.DELETE_ROW_COUNT + len(GEN.DV2_UNION_POSITIONS)
        )
        assert s["removed-delete-files"] == "1"
        assert s["removed-position-deletes"] == str(len(GEN.DV_POSITIONS))
        # the files view shows only the live vector...
        rows = read_ocf(
            os.path.join(
                GEN.LOC,
                "metadata",
                f"{GEN.SUPERSEDED_MANIFEST_UUID_HEX}-m1.avro",
            )
        )[2]
        # ...while the superseded manifest retains the removal marker
        assert rows[0]["status"] == 2  # DELETED
        assert rows[0]["snapshot_id"] == GEN.SNAPSHOT5_ID
        assert rows[0]["sequence_number"] == 5
        # time travel to snapshot 5 still sees the ORIGINAL vector
        _, deletes5, _ = t.plan_scan(snapshot_id=GEN.SNAPSHOT5_ID)
        dv5 = [f for f in deletes5 if f.is_deletion_vector]
        assert len(dv5) == 1 and dv5[0].file_path == GEN.DV_PUFFIN_PATH
        assert dv5[0].record_count == len(GEN.DV_POSITIONS)

    def test_ocf_decode_matches_expected_rows(self):
        schema, meta, rows = read_ocf(os.path.join(GOLDEN, "manifest.avro"))
        assert meta["format-version"] == "2" and meta["content"] == "data"
        assert json.loads(meta["partition-spec"]) == GEN.SPEC_FIELDS
        assert [r["data_file"]["file_path"] for r in rows] == [GEN.FILE_A, GEN.FILE_B]
        assert rows[0]["data_file"]["partition"] == {"ts_hour": 473040}
        assert rows[1]["data_file"]["partition"] == {"ts_hour": None}
        assert rows[0]["sequence_number"] == 1 and rows[0]["status"] == 1
        schema_l, meta_l, rows_l = read_ocf(os.path.join(GOLDEN, "manifest-list.avro"))
        assert meta_l["snapshot-id"] == str(GEN.SNAPSHOT_ID)
        assert rows_l[0]["manifest_length"] == os.path.getsize(
            os.path.join(GOLDEN, "manifest.avro")
        )
        assert rows_l[0]["added_rows_count"] == 13


class TestManifestStatsVsParquetFooters:
    def test_manifest_stats_match_spark_written_footers(self, spark, tmp_path):
        """The stats the commit records must equal what Spark physically
        wrote: record_count vs the Parquet footer's num_rows, and
        file_size_in_bytes vs the on-disk length — for every data file
        of a real partitioned append."""
        catalog = FsCatalog(str(tmp_path / "wh"))
        df = (
            spark.range(50)
            .withColumn(
                "ts",
                F.to_timestamp(
                    F.lit("2024-03-01 00:00:00").cast("timestamp")
                    + F.make_interval(hours=(F.col("id") % 5).cast("int"))
                ),
            )
            .withColumn("name", F.concat(F.lit("n"), F.col("id")))
        )
        t = catalog.create_table("otel", "stats", df.schema, partition_source="ts")
        t.append_dataframe(df)
        snapshot = t.current_snapshot()
        _, _, manifests = read_ocf(snapshot["manifest-list"])
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            current_schema,
            decode_bound,
        )

        schema_fields = {
            f_["id"]: f_["type"]
            for f_ in current_schema(t.metadata())["fields"]
            if isinstance(f_["type"], str)
        }
        n_checked = 0
        n_bounds = 0
        for m in manifests:
            _, _, entries = read_ocf(m["manifest_path"])
            for e in entries:
                d = e["data_file"]
                footer = pq.ParquetFile(d["file_path"]).metadata
                assert d["record_count"] == footer.num_rows
                assert d["file_size_in_bytes"] == os.path.getsize(d["file_path"])
                # manifest-recorded bounds decode to the footer min/max
                lower = {b["key"]: b["value"] for b in d["lower_bounds"] or []}
                upper = {b["key"]: b["value"] for b in d["upper_bounds"] or []}
                assert set(lower) == set(schema_fields)  # id + name bounded
                actual = spark.read.parquet(d["file_path"])
                lo_id, hi_id = (
                    actual.selectExpr("min(id)", "max(id)").first()
                )
                id_fid = next(
                    fid for fid, ty in schema_fields.items() if ty == "long"
                )
                assert decode_bound(lower[id_fid], "long") == lo_id
                assert decode_bound(upper[id_fid], "long") == hi_id
                n_bounds += 1
                n_checked += 1
        assert n_checked >= 5  # one file per hour partition
        assert n_bounds == n_checked
        # manifest-list rollups agree with the entry sums
        assert sum(m["added_rows_count"] for m in manifests) == 50
