"""Schema contract tests — the Spark analog of the reference's
schema_test.go:11-433 (field order, types, nullability, counts)."""

from __future__ import annotations

import pytest

from opentelemetry_iceberg_exporter_spark import schemas as S
from pyspark.sql.types import ArrayType, StringType, TimestampType


def test_table_counts():
    # column counts per FIXTURES.md / schema.go:316-594
    assert len(S.TRACES_SCHEMA.fields) == 33
    assert len(S.LOGS_SCHEMA.fields) == 18
    assert len(S.GAUGE_SCHEMA.fields) == 23
    assert len(S.SUM_SCHEMA.fields) == 25
    assert len(S.HISTOGRAM_SCHEMA.fields) == 28
    assert len(S.EXP_HISTOGRAM_SCHEMA.fields) == 33
    assert len(S.SUMMARY_SCHEMA.fields) == 19


def test_traces_field_order_prefix():
    names = [f.name for f in S.TRACES_SCHEMA.fields]
    assert names[:9] == [
        "trace_id",
        "span_id",
        "trace_state",
        "parent_span_id",
        "span_flags",
        "span_name",
        "span_kind",
        "start_time_unix_nano",
        "end_time_unix_nano",
    ]
    assert names[-1] == "scope_dropped_attributes_count"


def test_nullability_rules():
    t = {f.name: f for f in S.TRACES_SCHEMA.fields}
    assert not t["trace_id"].nullable
    assert t["trace_state"].nullable
    assert t["parent_span_id"].nullable
    assert t["status_code"].nullable
    assert t["service_name"].nullable
    l = {f.name: f for f in S.LOGS_SCHEMA.fields}
    assert l["trace_id"].nullable  # zero IDs -> NULL (logs.go:133-146)
    assert l["observed_time_unix_nano"].nullable
    assert l["event_name"].nullable


def test_timestamps_are_microsecond_native():
    t = {f.name: f for f in S.TRACES_SCHEMA.fields}
    assert isinstance(t["start_time_unix_nano"].dataType, TimestampType)
    assert isinstance(t["events_time_unix_nano"].dataType, ArrayType)
    assert isinstance(t["events_time_unix_nano"].dataType.elementType, TimestampType)


def test_summary_dot_columns_preserved():
    names = [f.name for f in S.SUMMARY_SCHEMA.fields]
    assert "quantile_values.quantile" in names
    assert "quantile_values.value" in names


def test_metrics_common_prefix_identical():
    prefix = [
        (f.name, f.dataType, f.nullable) for f in S.GAUGE_SCHEMA.fields[:15]
    ]
    for schema in (
        S.SUM_SCHEMA,
        S.HISTOGRAM_SCHEMA,
        S.EXP_HISTOGRAM_SCHEMA,
        S.SUMMARY_SCHEMA,
    ):
        assert [(f.name, f.dataType, f.nullable) for f in schema.fields[:15]] == prefix


def test_table_name_resolution():
    assert S.table_name(S.SIGNAL_TRACES) == "otel_traces"
    assert S.table_name(S.SIGNAL_METRICS_EXP_HISTOGRAM) == "otel_metrics_exponential_histogram"
    assert S.table_name(S.SIGNAL_TRACES, prefix="custom") == "custom_traces"
    assert (
        S.table_name(S.SIGNAL_LOGS, overrides={S.SIGNAL_LOGS: "my_logs"}) == "my_logs"
    )
    with pytest.raises(ValueError):
        S.table_name("nope")


def test_partition_column_resolution():
    assert S.partition_column(S.SIGNAL_TRACES) == "start_time_unix_nano"
    assert S.partition_column(S.SIGNAL_LOGS) == "time_unix_nano"
    assert S.partition_column_for_table("otel_traces") == "start_time_unix_nano"
    assert S.partition_column_for_table("custom_metrics_gauge") == "time_unix_nano"
