"""Kafka source wiring (SURVEY §2.1 S1, §2.9 X3 persistent queue).

The container ships no spark-sql-kafka connector, so these tests pin the
config surface, the option map handed to the Kafka reader, and the
availability gate — the same level at which the Iceberg sink is verified
(SQL-gen) when its jars are absent. The file-source path of
open_source_stream IS executed end-to-end here and in
test_otlp_protobuf.py / test_sinks_pipeline.py.
"""

from __future__ import annotations

import pytest

from opentelemetry_iceberg_exporter_spark.config import ExporterConfig, SourceConfig
from opentelemetry_iceberg_exporter_spark.streaming import (
    kafka_available,
    open_source_stream,
)


class TestSourceConfig:
    def test_defaults_valid_for_batch_only(self):
        # default file source with no path: valid at the ExporterConfig
        # level (batch replay passes input_path explicitly)
        cfg = ExporterConfig()
        cfg.storage.bucket = "/tmp/wh"
        cfg.validate()

    def test_file_source_requires_path(self):
        with pytest.raises(ValueError, match="source.path"):
            SourceConfig(kind="file").validate()

    def test_kafka_requires_servers_and_topic(self):
        with pytest.raises(ValueError, match="bootstrap_servers"):
            SourceConfig(kind="kafka", topic="otlp").validate()
        with pytest.raises(ValueError, match="topic"):
            SourceConfig(kind="kafka", bootstrap_servers="b:9092").validate()

    def test_invalid_kind_and_wire_format(self):
        with pytest.raises(ValueError, match="source kind"):
            SourceConfig(kind="pulsar").validate()
        with pytest.raises(ValueError, match="wire format"):
            SourceConfig(kind="file", path="/x", wire_format="avro").validate()

    def test_kafka_option_map(self):
        src = SourceConfig(
            kind="kafka",
            bootstrap_servers="b1:9092,b2:9092",
            topic="otlp-traces",
            starting_offsets="latest",
            max_per_trigger=512,
            options={"kafka.security.protocol": "SASL_SSL"},
        )
        opts = src.kafka_options()
        assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
        assert opts["subscribe"] == "otlp-traces"
        assert opts["startingOffsets"] == "latest"
        # the reference's 512-record batch processor maps to admission
        # control (otel-config.yaml:26-29)
        assert opts["maxOffsetsPerTrigger"] == "512"
        assert opts["failOnDataLoss"] == "true"
        assert opts["kafka.security.protocol"] == "SASL_SSL"

    def test_kafka_option_map_omits_unset_trigger_cap(self):
        src = SourceConfig(kind="kafka", bootstrap_servers="b:9092", topic="t")
        assert "maxOffsetsPerTrigger" not in src.kafka_options()


class TestKafkaGate:
    def test_kafka_not_available_in_container(self, spark):
        # documents the environment limit the COVERAGE note tracks
        assert kafka_available(spark) is False

    def test_open_kafka_source_raises_actionable_error(self, spark):
        src = SourceConfig(kind="kafka", bootstrap_servers="b:9092", topic="t")
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            open_source_stream(spark, src, "traces")

    def test_open_file_source_streams(self, spark, tmp_path):
        # the file branch of the same dispatch executes for real
        (tmp_path / "in").mkdir()
        (tmp_path / "in" / "a.jsonl").write_text('{"resourceSpans": []}\n')
        src = SourceConfig(kind="file", path=str(tmp_path / "in"))
        df = open_source_stream(spark, src, "traces")
        assert df.isStreaming and df.columns == ["value"]
