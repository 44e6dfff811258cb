"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY §4) — Catalyst is ours, and these
helpers make its decisions testable: broadcast-vs-shuffle joins, parquet
predicate pushdown, column pruning, partial top-k. The plan-contract
tests (tests/test_plans.py) pin the plans we want so a regression into a
worse shape (e.g. a dimension join degrading to sort-merge, a filter
failing to reach the scan) fails CI — the 100 TB guardrail that small-SF
row-count tests can't provide.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    jdf = df._jdf
    explain_mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return jdf.queryExecution().explainString(explain_mode)


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in the plan, e.g. BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin."""
    plan = physical_plan(df, "simple")
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans (flattened)."""
    plan = physical_plan(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for each parquet scan (column pruning)."""
    plan = physical_plan(df, "formatted")
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def num_shuffles(df: DataFrame) -> int:
    """Count of shuffle exchanges in the final plan (AQE may reduce at
    runtime; this is the static plan count)."""
    plan = physical_plan(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobin)", plan))


def has_operator(df: DataFrame, name: str) -> bool:
    return name in physical_plan(df, "simple")
