"""Distributed footer probing (sinks/footer_probe.py).

The r9-flagged scale risk: bloom probes fire exactly when min/max
bounds DON'T prune, so the candidate list is the table's whole live
file set — O(100k) footer+bitset reads must not funnel through the
driver. These tests pin the routing contract (driver threads below the
threshold, ONE executor-side job at/above it), verdict parity between
the two paths on real bloom/variant tables, and that only booleans
come back from the job.
"""

from __future__ import annotations

from functools import partial

import pytest

from opentelemetry_iceberg_exporter_spark.sinks import footer_probe
from opentelemetry_iceberg_exporter_spark.sinks.bloom_prune import (
    _file_provably_matchless,
    prune_files_by_bloom,
)
from opentelemetry_iceberg_exporter_spark.sinks.footer_probe import (
    DISTRIBUTED_THRESHOLD,
    probe_verdicts,
)
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

BLOOM_PROP = {"write.parquet.bloom-filter-enabled.column.doc_id": "true"}


@pytest.fixture(scope="module")
def many_files_table(spark, tmp_path_factory):
    """A bloom-enabled table with more data files than the distributed
    threshold, every file sharing the same doc_id bounds (bounds
    pruning is blind; only the blooms differ)."""
    cat = FsCatalog(str(tmp_path_factory.mktemp("probewh")))
    t = None
    n_files = DISTRIBUTED_THRESHOLD + 4
    for i in range(n_files):
        df = (
            spark.range(3)
            .selectExpr(
                # every file spans doc-000..doc-999 lexically via the
                # shared sentinel rows, plus one file-unique id
                f"concat('doc-', lpad(cast(id * 999 as string), 3, '0')) as doc_id",
                "id as v",
            )
            .union(
                spark.createDataFrame([(f"doc-{i:03d}x", 7)], "doc_id string, v long")
            )
            .coalesce(1)
        )
        if t is None:
            t = cat.create_table(
                "otel", "many", df.schema, properties=dict(BLOOM_PROP)
            )
        t.append_dataframe(df)
    return t


class TestRouting:
    def test_small_list_stays_on_driver(self, spark, monkeypatch):
        monkeypatch.setattr(
            footer_probe,
            "_distributed_verdicts",
            lambda *a, **k: pytest.fail("small list must not launch a job"),
        )
        out = probe_verdicts(
            ["/nonexistent/a", "/nonexistent/b"],
            partial(_file_provably_matchless, probes={"doc_id": (6, [b"x"])}),
            spark=spark,
        )
        # unreadable files: conservative keep (dead=False)
        assert out == {"/nonexistent/a": False, "/nonexistent/b": False}

    def test_no_session_stays_on_driver_at_any_size(self, monkeypatch):
        monkeypatch.setattr(
            footer_probe,
            "_distributed_verdicts",
            lambda *a, **k: pytest.fail("no session: no job"),
        )
        paths = [f"/nonexistent/{i}" for i in range(DISTRIBUTED_THRESHOLD * 2)]
        out = probe_verdicts(
            paths,
            partial(_file_provably_matchless, probes={"doc_id": (6, [b"x"])}),
            spark=None,
        )
        assert all(v is False for v in out.values())

    @pytest.mark.slow
    def test_large_list_with_session_ships_to_executors(
        self, spark, monkeypatch, many_files_table
    ):
        monkeypatch.setattr(
            footer_probe,
            "_driver_verdicts",
            lambda *a, **k: pytest.fail(
                "large list with a session must run executor-side"
            ),
        )
        data, _ = many_files_table.plan_files()
        assert len(data) >= DISTRIBUTED_THRESHOLD
        kept, dropped = prune_files_by_bloom(
            list(data), {"doc_id": (6, [b"doc-003x"])}, spark=spark
        )
        # exactly the one file holding the unique id survives
        assert len(kept) == 1 and len(dropped) == len(data) - 1


class TestParity:
    @pytest.mark.slow
    def test_distributed_equals_driver_verdicts(self, spark, many_files_table):
        data, _ = many_files_table.plan_files()
        paths = [f.file_path for f in data]
        fn = partial(
            _file_provably_matchless, probes={"doc_id": (6, [b"doc-010x", b"doc-011x"])}
        )
        driver = probe_verdicts(paths, fn, spark=None)
        dist = probe_verdicts(paths, fn, spark=spark, threshold=1)
        assert driver == dist
        assert sum(not dead for dead in dist.values()) == 2  # the two holders

    @pytest.mark.slow
    def test_distributed_verdicts_are_plain_booleans(self, spark, many_files_table):
        """Verdicts-only contract: the job returns {path: bool}, never
        footer/bitset payloads."""
        data, _ = many_files_table.plan_files()
        fn = partial(_file_provably_matchless, probes={"doc_id": (6, [b"absent"])})
        out = probe_verdicts(
            [f.file_path for f in data], fn, spark=spark, threshold=1
        )
        assert set(out) == {f.file_path for f in data}
        assert all(type(v) is bool for v in out.values())

    def test_unreadable_file_kept_in_distributed_mode(self, spark):
        fn = partial(_file_provably_matchless, probes={"doc_id": (6, [b"x"])})
        paths = [f"/nonexistent/p{i}" for i in range(4)]
        out = probe_verdicts(paths, fn, spark=spark, threshold=1)
        assert all(v is False for v in out.values())


class TestPlannerIntegration:
    @pytest.mark.slow
    def test_delete_where_point_lookup_distributes(
        self, spark, monkeypatch, many_files_table
    ):
        """plan_dml_files(spark=...) over a >threshold candidate list
        routes the probe executor-side and still prunes to one file."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            plan_dml_files,
        )

        monkeypatch.setattr(
            footer_probe,
            "_driver_verdicts",
            lambda *a, **k: pytest.fail("planner probe must distribute"),
        )
        md = many_files_table.metadata()
        live, excluded, _ = plan_dml_files(
            md,
            md["current-snapshot-id"],
            "doc_id = 'doc-005x'",
            spark=spark,
        )
        assert len(live) == 1
        assert len(excluded) == DISTRIBUTED_THRESHOLD + 3
