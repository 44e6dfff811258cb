"""Local replica of the driver's DuckDB-oracle comparison.

Runs each registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares: row count, column names, and
order-insensitive values — mirroring CORRECTNESS_r{N}.json semantics.

The driver canonicalizes through PANDAS (Spark `toPandas()` vs DuckDB
`.df()`), sorts rows with `DataFrame.sort_values`, and hashes stringified
cells. Round 1 showed two failure classes that a fetchall()-based replica
masks:

* DuckDB HUGEINT (uncast integer SUM) reaches pandas as float64 → "2.0"
  vs Spark's "2" → hash mismatch with identical values (e09);
* list-typed cells crash `sort_values` ("unhashable type: 'list'")
  (o07/o08/o10).

So this replica goes through the same pandas path: if a query fails here
it would fail the driver, and vice versa.
"""

from __future__ import annotations

from dataclasses import dataclass

import duckdb
import pandas as pd

from opentelemetry_iceberg_exporter_spark.sources.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


def _cell(v) -> str:
    # Null-ish cells (None / NaN / NaT) compare equal on the driver even
    # when the two engines surface them as different dtypes (r1: o02/o04
    # passed with Spark None vs DuckDB NaN). Everything non-null keeps its
    # pandas str() — so int 2 vs float 2.0 still mismatches, as the driver
    # showed for e09.
    try:
        if v is None or pd.isna(v):
            return "∅"
    except (TypeError, ValueError):  # pd.isna on list-like
        pass
    return str(v)


def _canon(pdf: pd.DataFrame) -> list[str]:
    """Driver-shaped canonicalization: columns ordered by name, rows
    ordered by sort_values over every column (raises on list cells, as
    the driver does), cells stringified with plain str()."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return [
        "|".join(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    duck_rows: int


def compare(name, spark_df, con, oracle: str) -> CompareResult:
    s_pdf = spark_df.toPandas()
    s_pdf.columns = [c.lower() for c in s_pdf.columns]
    d_pdf = con.sql(oracle).df()
    d_pdf.columns = [c.lower() for c in d_pdf.columns]

    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        return CompareResult(
            name,
            False,
            f"schema mismatch: spark={sorted(s_pdf.columns)} duck={sorted(d_pdf.columns)}",
            len(s_pdf),
            len(d_pdf),
        )
    if len(s_pdf) != len(d_pdf):
        return CompareResult(
            name, False, f"row count: spark={len(s_pdf)} duck={len(d_pdf)}",
            len(s_pdf), len(d_pdf),
        )
    cs = _canon(s_pdf)
    cd = _canon(d_pdf)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return CompareResult(
            name, False, f"value mismatch, first diffs: {diffs}", len(s_pdf), len(d_pdf)
        )
    return CompareResult(name, True, "ok", len(s_pdf), len(d_pdf))
