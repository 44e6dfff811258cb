"""Curated query surface: every operator class from SURVEY.md §2 exercised
as a named (spark_fn, oracle_sql) pair over the driver's star schema.

Registry pattern: submodules call `register(...)`; `__spark_entry__.py`
exposes the result to the driver harness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, doc: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration) and return the
    registry."""
    from . import relational  # noqa: F401
    from . import events  # noqa: F401
    from . import otlp  # noqa: F401
    from . import iceberg_v3  # noqa: F401
    from . import streaming  # noqa: F401
    from ..operators import dedup  # noqa: F401
    from ..operators import sampling  # noqa: F401
    from ..operators import similarity  # noqa: F401
    from ..operators import text  # noqa: F401
    from ..operators import multimodal  # noqa: F401

    return REGISTRY
