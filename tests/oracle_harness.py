"""Local replica of the driver's DuckDB-oracle comparison.

Runs each registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares: row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by their
stringified tuple) — mirroring CORRECTNESS_r{N}.json semantics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb

from opentelemetry_iceberg_exporter_spark.sources.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips doubles exactly; -0.0 normalized
        return repr(v + 0.0) if v != 0 else "0.0"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    duck_rows: int


def compare(name, spark_df, con, oracle: str) -> CompareResult:
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return CompareResult(
            name, False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}",
            len(s_rows), len(d_rows),
        )
    if len(s_rows) != len(d_rows):
        return CompareResult(
            name, False, f"row count: spark={len(s_rows)} duck={len(d_rows)}",
            len(s_rows), len(d_rows),
        )
    cs = _canon_rows(s_cols, s_rows)
    cd = _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return CompareResult(
            name, False, f"value mismatch, first diffs: {diffs}", len(s_rows), len(d_rows)
        )
    return CompareResult(name, True, "ok", len(s_rows), len(d_rows))
