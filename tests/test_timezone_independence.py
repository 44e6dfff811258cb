"""Session-timezone independence of the events/timestamp pipeline.

The round-2 testdata stores timestamps as parquet timestamp[us]
isAdjustedToUTC=false (Spark TIMESTAMP_NTZ). DuckDB treats that
wall-clock as UTC in epoch math; load_table/epoch_micros_sql mirror that
rule with timestampdiff on NTZ operands, which must NOT depend on
spark.sql.session.timeZone. This suite runs a session pinned to a
non-UTC timezone and checks the epoch-derived results still match the
oracle — the failure mode that unix_micros(cast(ntz as timestamp))
would reintroduce silently (it resolves through the session tz).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def tokyo_spark(spark):
    """Same JVM, separate session state with a non-UTC session timezone.

    newSession() shares the SparkContext (cheap) but has independent SQL
    conf, so the UTC conf set by build_session does not leak in.
    """
    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    return s


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    return con


def test_ts_ns_matches_duckdb_under_tokyo(tokyo_spark: SparkSession, sf_dir):
    from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

    ev = load_table(tokyo_spark, sf_dir, "events")
    s = sorted(r["ts_ns"] for r in ev.select("ts_ns").limit(0).collect())  # force plan
    s = sorted(r["ts_ns"] for r in ev.select("ts_ns").collect())
    con = _duck(sf_dir)
    d = sorted(
        v
        for (v,) in con.sql(
            "SELECT (epoch_ns(ts) // 1000) * 1000 FROM events"
        ).fetchall()
    )
    assert s == d


def test_epoch_hour_partition_matches_under_tokyo(tokyo_spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.queries import load_all_queries

    spec = load_all_queries()["e01_epoch_hour_partition"]
    con = _duck(sf_dir)
    s_rows = {tuple(r) for r in spec.fn(tokyo_spark, sf_dir).collect()}
    d_rows = {tuple(r) for r in con.sql(spec.oracle).fetchall()}
    assert s_rows == d_rows


def test_asof_join_matches_under_tokyo(tokyo_spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.queries import load_all_queries

    spec = load_all_queries()["e07_asof_join_last_order"]
    con = _duck(sf_dir)
    s_rows = {tuple(r) for r in spec.fn(tokyo_spark, sf_dir).collect()}
    d_rows = {tuple(r) for r in con.sql(spec.oracle).fetchall()}
    assert s_rows == d_rows


def test_partition_values_correct_in_dst_fold(spark):
    """DST fall-back fold: under a session zone where the instant's wall
    clock is ambiguous, the old convert_timezone(None, tz, ltz) path
    round-tripped through the session wall clock and picked one offset —
    mispartitioning the second occurrence. The epoch-micros NTZ build
    must place both fold instants in their true UTC hours regardless of
    session zone."""
    from pyspark.sql import functions as F

    from opentelemetry_iceberg_exporter_spark.sinks.parquet_sink import (
        partition_value_columns,
    )

    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    # 2024-11-03 NY fall-back: 05:30Z = 01:30 EDT (first), 06:30Z = 01:30
    # EST (second) — same NY wall clock, different instants/UTC hours
    df = s.createDataFrame(
        [(1, "2024-11-03T05:30:00+00:00"), (2, "2024-11-03T06:30:00+00:00")],
        "id int, iso string",
    ).select("id", F.to_timestamp("iso").alias("ts"))
    cols = partition_value_columns(F.col("ts"), "hourly", "UTC")
    out = {
        r["id"]: (r["year"], r["month"], r["day"], r["hour"])
        for r in df.select("id", *[c.alias(n) for n, c in cols]).collect()
    }
    assert out[1] == ("2024", "11", "03", "05")
    assert out[2] == ("2024", "11", "03", "06")  # the fold victim

    # target-zone rendering also lands both in NY hour 01 (same wall)
    cols_ny = partition_value_columns(F.col("ts"), "hourly", "America/New_York")
    out_ny = {
        r["id"]: r["hour"]
        for r in df.select("id", *[c.alias(n) for n, c in cols_ny]).collect()
    }
    assert out_ny[1] == "01" and out_ny[2] == "01"
