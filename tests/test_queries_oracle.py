"""Every registered query must match its DuckDB oracle at sf0.001
(row count + schema + order-insensitive values) — the local mirror of
the driver's correctness gate."""

from __future__ import annotations

import pytest

from opentelemetry_iceberg_exporter_spark.queries import load_all_queries

from oracle_harness import compare, duck_connection

SPECS = load_all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only contract
        return
    res = compare(name, df, duck, spec.oracle)
    assert res.ok, res.detail
