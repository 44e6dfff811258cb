"""Declared VARIANT shred paths (catalog.shred_paths): the engine
rides Spark's inferred shredding, so which attribute paths get typed
parquet columns — and therefore prune via footer stats — would
otherwise be an accident of per-file inference. The declaration makes
it a contract: recorded as a table property at DDL, verified against
the written footers after every exporter commit, drift reported per
shred_check (fail raises ShredDriftError, warn logs)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.config import (
    CatalogConfig,
    ExporterConfig,
    PartitionConfig,
    StorageConfig,
)
from opentelemetry_iceberg_exporter_spark.sinks.variant_prune import (
    parse_shred_path,
    verify_shred_paths,
)

try:
    from pyspark.sql.types import VariantType
except ImportError:  # pragma: no cover - Spark < 4
    VariantType = None

pytestmark = pytest.mark.skipif(
    VariantType is None, reason="Spark VariantType unavailable"
)


def _cfg(tmp_path, **kw):
    return ExporterConfig(
        storage=StorageConfig(
            provider="filesystem", bucket=str(tmp_path), prefix="otel-exp"
        ),
        catalog=CatalogConfig(
            catalog_type="fs",
            warehouse=str(tmp_path / "wh"),
            **kw.pop("catalog_kw", {}),
        ),
        partition=PartitionConfig(granularity="hourly"),
        **kw,
    )


class TestConfig:
    def test_path_grammar(self):
        assert parse_shred_path("$.http.status_code") == ("http", "status_code")
        assert parse_shred_path("$['a.b'].c") == ("a.b", "c")
        for bad in ("$", "a.b", "$.a[0]", "$[0]", "", 7):
            with pytest.raises((ValueError, TypeError)):
                parse_shred_path(bad)

    def test_requires_variant_attrs(self, tmp_path):
        cfg = _cfg(
            tmp_path,
            catalog_kw={
                "shred_paths": {"traces": {"span_attributes": ["$.k"]}}
            },
        )
        with pytest.raises(ValueError, match="requires variant_attrs"):
            cfg.validate()
        cfg2 = _cfg(
            tmp_path,
            variant_attrs=True,
            catalog_kw={
                "shred_paths": {"traces": {"span_attributes": ["$.k"]}}
            },
        )
        cfg2.validate()

    def test_bad_declarations_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="not an object-key path"):
            _cfg(
                tmp_path,
                variant_attrs=True,
                catalog_kw={
                    "shred_paths": {"traces": {"span_attributes": ["$.a[0]"]}}
                },
            ).validate()
        with pytest.raises(ValueError, match="non-empty list"):
            _cfg(
                tmp_path,
                variant_attrs=True,
                catalog_kw={"shred_paths": {"traces": {"span_attributes": []}}},
            ).validate()
        bad = _cfg(tmp_path, variant_attrs=True)
        bad.catalog.shred_check = "explode"
        with pytest.raises(ValueError, match="shred_check"):
            bad.validate()

    def test_non_variant_column_refused_at_ddl(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
        )

        cfg = _cfg(
            tmp_path,
            variant_attrs=True,
            catalog_kw={"shred_paths": {"traces": {"span_id": ["$.k"]}}},
        )
        with pytest.raises(ValueError, match="not a variant attribute column"):
            FsIcebergSink(spark, cfg).ensure_all_tables()

    def test_ddl_records_table_property(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
        )

        cfg = _cfg(
            tmp_path,
            variant_attrs=True,
            catalog_kw={
                "shred_paths": {
                    "traces": {
                        "span_attributes": [
                            "$['http.status_code']",
                            "$['http.method']",
                        ]
                    }
                }
            },
        )
        sink = FsIcebergSink(spark, cfg)
        sink.ensure_all_tables()
        md = sink.catalog.load_table("otel", "otel_traces").metadata()
        assert (
            md["properties"]["variant.shred-paths.span_attributes"]
            == "$['http.status_code'],$['http.method']"
        )


def _write_variant(spark, path, json_col):
    (
        spark.range(6)
        .select(F.col("id"), F.parse_json(json_col).alias("attrs"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )
    return glob.glob(os.path.join(path, "*.parquet"))


class TestVerify:
    def test_uniform_typed_path_passes(self, spark, tmp_path):
        files = _write_variant(
            spark,
            str(tmp_path / "u"),
            F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}")),
        )
        assert verify_shred_paths(files, {"attrs": ["$.k"]}) == []

    def test_absent_path_passes(self, spark, tmp_path):
        """A declared path with NO values in the batch is not drift:
        nothing escaped typing, and the pruner proves such groups
        matchless for free."""
        files = _write_variant(
            spark,
            str(tmp_path / "a"),
            F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}")),
        )
        assert verify_shred_paths(files, {"attrs": ["$.missing.deep"]}) == []

    def test_mixed_type_values_are_drift(self, spark, tmp_path):
        """Type-mixed values land in the residual — footer stats cannot
        bound them, so the declared path's pruning is gone: violation."""
        files = _write_variant(
            spark,
            str(tmp_path / "m"),
            F.when(
                F.col("id") % 2 == 0,
                F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}")),
            ).otherwise(F.lit('{"k": "oops"}')),
        )
        violations = verify_shred_paths(files, {"attrs": ["$.k"]})
        assert len(violations) == 1
        _fp, col, path, reason = violations[0]
        assert (col, path) == ("attrs", "$.k")
        assert "residual" in reason

    def test_verified_path_actually_prunes(self, spark, tmp_path):
        """The point of the contract: a file that PASSES verification
        is prunable by footer stats on the declared path — a disjoint
        range predicate provably excludes it."""
        from opentelemetry_iceberg_exporter_spark.sinks.variant_prune import (
            VariantPredicate,
            file_may_match,
        )

        files = _write_variant(
            spark,
            str(tmp_path / "p"),
            F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}")),
        )
        assert verify_shred_paths(files, {"attrs": ["$.k"]}) == []
        # values are 0..5: [100, None) is provably matchless
        assert not file_may_match(
            files[0], VariantPredicate("attrs", ("k",), "long", 100, None)
        )
        assert file_may_match(
            files[0], VariantPredicate("attrs", ("k",), "long", 3, None)
        )

    def test_unreadable_file_is_drift(self, tmp_path):
        bad = str(tmp_path / "junk.parquet")
        with open(bad, "wb") as f:
            f.write(b"not parquet at all")
        violations = verify_shred_paths([bad], {"attrs": ["$.k", "$.j"]})
        assert len(violations) == 2
        assert all("unreadable footer" in r for _, _, _, r in violations)


def _traces_json(status_literal: str) -> str:
    return (
        '{"resourceSpans": [{"resource": {"attributes": [{"key": '
        '"service.name", "value": {"stringValue": "svc"}}]}, "scopeSpans": '
        '[{"scope": {"name": "lib"}, "spans": [{"traceId": '
        '"0102030405060708090a0b0c0d0e0f10", "spanId": "0102030405060708", '
        '"name": "op", "kind": 2, "startTimeUnixNano": '
        '"1705314600000000000", "endTimeUnixNano": "1705314601000000000", '
        '"attributes": [{"key": "http.status_code", "value": '
        f"{status_literal}" '}], "status": {"code": 1}}]}]}]}'
    )


class TestComposedV3Exporter:
    def test_all_v3_features_compose_in_one_config(self, spark, tmp_path):
        """The full v3 production shape in ONE exporter config:
        ns_timestamps + variant_attrs + shred_paths + bloom filters +
        a declared view — DDL stamps every contract on the table, a
        clean append passes shred verification, and the declared view
        reads over the committed data."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
        )
        from opentelemetry_iceberg_exporter_spark.streaming.pipeline import (
            flatten_signal,
        )

        cfg = _cfg(
            tmp_path,
            ns_timestamps=True,
            variant_attrs=True,
            catalog_kw={
                "shred_paths": {
                    "traces": {"span_attributes": ["$['http.status_code']"]}
                },
                "bloom_filter_columns": {"traces": ["span_id"]},
                "views": {
                    "span_count": "SELECT COUNT(*) AS n FROM otel_otel_traces"
                },
            },
        )
        cfg.validate()
        sink = FsIcebergSink(spark, cfg)
        sink.ensure_all_tables()
        raw = spark.createDataFrame(
            [(_traces_json('{"intValue": "200"}'),)], "value string"
        )
        flat = flatten_signal(
            raw, "traces", ns_timestamps=True, variant_attrs=True
        )["traces"]
        assert sink.append(flat, "traces") is not None  # shred check green
        t = sink.catalog.load_table("otel", "otel_traces")
        md = t.metadata()
        assert md["format-version"] == 3
        props = md["properties"]
        assert props["variant.shred-paths.span_attributes"] == (
            "$['http.status_code']"
        )
        assert (
            props["write.parquet.bloom-filter-enabled.column.span_id"]
            == "true"
        )
        types = {f["name"]: f["type"] for f in md["schemas"][0]["fields"]}
        assert types["start_time_unix_nano"] == "timestamptz_ns"
        assert types["span_attributes"] == "variant"
        v = sink.catalog.load_view("otel", "span_count")
        assert v.read(spark).collect()[0]["n"] == 1


class TestSinkEnforcement:
    def _sink(self, spark, tmp_path, shred_check="fail"):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
        )

        cfg = _cfg(
            tmp_path,
            variant_attrs=True,
            catalog_kw={
                "shred_paths": {
                    "traces": {"span_attributes": ["$['http.status_code']"]}
                },
                "shred_check": shred_check,
            },
        )
        cfg.validate()
        return FsIcebergSink(spark, cfg)

    def _flat(self, spark, lines):
        from opentelemetry_iceberg_exporter_spark.streaming.pipeline import (
            flatten_signal,
        )

        raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
        return flatten_signal(raw, "traces", variant_attrs=True)["traces"]

    def test_clean_batch_commits(self, spark, tmp_path):
        sink = self._sink(spark, tmp_path)
        sid = sink.append(
            self._flat(spark, [_traces_json('{"intValue": "200"}')]), "traces"
        )
        assert sid is not None

    def test_drifting_batch_fails_loud(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            ShredDriftError,
        )

        sink = self._sink(spark, tmp_path)
        # one span carries the status code as an int, one as a string —
        # inference cannot type the path, values land in the residual
        drifting = self._flat(
            spark,
            [
                _traces_json('{"intValue": "200"}'),
                _traces_json('{"stringValue": "200"}'),
            ],
        )
        with pytest.raises(ShredDriftError, match="http.status_code"):
            sink.append(drifting, "traces")

    def test_upsert_commits_are_checked_too(self, spark, tmp_path):
        """CDC-upsert commits write data files like appends — they get
        the same post-commit footer verification."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
            ShredDriftError,
        )

        cfg = _cfg(
            tmp_path,
            variant_attrs=True,
            catalog_kw={
                "shred_paths": {
                    "traces": {"span_attributes": ["$['http.status_code']"]}
                },
                "upsert_keys": {"traces": ["trace_id", "span_id"]},
            },
        )
        cfg.validate()
        sink = FsIcebergSink(spark, cfg)
        clean = self._flat(spark, [_traces_json('{"intValue": "200"}')])
        assert sink.append(clean, "traces") is not None
        drifting = self._flat(
            spark,
            [
                _traces_json('{"intValue": "201"}'),
                _traces_json('{"stringValue": "201"}'),
            ],
        )
        with pytest.raises(ShredDriftError, match="http.status_code"):
            sink.append(drifting, "traces")

    def test_rest_transport_enforces_too(self, spark, tmp_path):
        """Shred enforcement is transport-neutral: the REST sink's
        append runs the same post-commit footer check."""
        import os

        from rest_stub import make_server

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            RestIcebergSink,
            ShredDriftError,
        )

        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _state, uri = make_server(warehouse)
        try:
            cfg = _cfg(
                tmp_path,
                variant_attrs=True,
                catalog_kw={
                    "shred_paths": {
                        "traces": {
                            "span_attributes": ["$['http.status_code']"]
                        }
                    },
                },
            )
            cfg.catalog.catalog_type = "rest"
            cfg.catalog.uri = uri
            cfg.catalog.warehouse = warehouse
            cfg.validate()
            sink = RestIcebergSink(spark, cfg)
            clean = self._flat(spark, [_traces_json('{"intValue": "200"}')])
            assert sink.append(clean, "traces") is not None
            drifting = self._flat(
                spark,
                [
                    _traces_json('{"intValue": "201"}'),
                    _traces_json('{"stringValue": "201"}'),
                ],
            )
            with pytest.raises(ShredDriftError, match="http.status_code"):
                sink.append(drifting, "traces")
        finally:
            server.shutdown()

    def test_verify_shred_cli_audits_live_files(self, spark, tmp_path, capsys):
        """`verify-shred` re-checks a table's LIVE files against the
        declared table property: clean -> rc 0, after warn-mode drift
        landed -> rc 3 with the violation list."""
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        sink = self._sink(spark, tmp_path, shred_check="warn")
        sink.append(
            self._flat(spark, [_traces_json('{"intValue": "200"}')]), "traces"
        )
        argv = [
            "verify-shred", "--warehouse", sink.config.catalog.warehouse,
            "--namespace", "otel", "--table", "otel_traces",
        ]
        assert main(argv) == 0
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["violations"] == [] and report["files"] == 1
        assert report["declared"] == {
            "span_attributes": ["$['http.status_code']"]
        }
        # warn mode lets a drifting batch COMMIT; the audit then finds it
        sink.append(
            self._flat(
                spark,
                [
                    _traces_json('{"intValue": "201"}'),
                    _traces_json('{"stringValue": "201"}'),
                ],
            ),
            "traces",
        )
        assert main(argv) == 3
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert len(report["violations"]) == 1
        assert report["violations"][0]["column"] == "span_attributes"

    def test_warn_mode_logs_and_continues(self, spark, tmp_path, caplog):
        import logging

        sink = self._sink(spark, tmp_path, shred_check="warn")
        drifting = self._flat(
            spark,
            [
                _traces_json('{"intValue": "200"}'),
                _traces_json('{"stringValue": "200"}'),
            ],
        )
        with caplog.at_level(logging.WARNING):
            sid = sink.append(drifting, "traces")
        assert sid is not None
        assert any("shred-path drift" in r.message for r in caplog.records)