"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — name -> (spark, sf_dir) -> DataFrame, one per implemented
                operator (SURVEY.md §2 + LLM-pipeline extensions).
oracle_sql()  — matching DuckDB SQL for the correctness gate; omitted for
                genuinely non-SQL-expressible ops (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opentelemetry_iceberg_exporter_spark.queries import load_all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 5-way star join + revenue aggregation on sf0.001."""
    specs = load_all_queries()
    return specs["q03_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
