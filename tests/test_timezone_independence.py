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
