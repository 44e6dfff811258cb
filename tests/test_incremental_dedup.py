"""Incremental corpus dedup: batch-over-batch near-dup filtering against
a catalog-backed LSH band index (operators/incremental_dedup.py).

Texts are crafted so collisions are structural, not probabilistic:
identical texts share every band; NEAR (one token changed in ~28) shares
exactly one band with BASE under the pinned minhash constants (verified
by test_near_variant_shares_a_band, which guards the corpus itself);
distinct filler texts share none.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.dedup import (
    band_rows,
    minhash_signatures,
)
from opentelemetry_iceberg_exporter_spark.operators.incremental_dedup import (
    IncrementalDeduper,
    create_index_table,
    dedup_tail,
)
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "turtles carry bright lanterns across the frozen river during a long "
    "winter night under pale stars"
)
NEAR = BASE.replace("turtles", "rabbits")
OTHER = (
    "completely different content about spark catalyst optimizer plans "
    "and shuffle partitions in distributed query execution engines at "
    "massive scale"
)
THIRD = (
    "a corpus of technical documentation describing avro manifest files "
    "snapshot isolation and atomic commit protocols for table formats on "
    "object storage"
)
SHORT = "two tokens"  # < 3-shingle width -> empty shingle set


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def deduper(tmp_path):
    cat = FsCatalog(str(tmp_path / "warehouse"))
    table = create_index_table(cat, "dedup", "band_index")
    return IncrementalDeduper(table)


def _statuses(res) -> dict[str, tuple[str, str | None]]:
    return {
        r["doc_id"]: (r["status"], r["match_id"]) for r in res.decisions.collect()
    }


def test_near_variant_shares_a_band(spark):
    """Guards the crafted corpus: NEAR must collide with BASE on at
    least one band (else every cross-batch test below is vacuous)."""
    rows = band_rows(
        minhash_signatures(_df(spark, [("a", BASE), ("b", NEAR), ("c", OTHER)]),
                           "doc_id", "text"),
        "doc_id",
    ).collect()
    keys: dict[str, set] = {}
    for r in rows:
        keys.setdefault(r["doc_id"], set()).add((r["band_idx"], r["band_key"]))
    assert keys["a"] & keys["b"], "NEAR no longer collides with BASE"
    assert not (keys["a"] & keys["c"]) and not (keys["b"] & keys["c"])


@pytest.mark.slow
class TestBatchScopedProbe:
    """The index read is bloom-pruned to files that might share a band
    key with the batch: bytes read scale with the BATCH, not the
    corpus."""

    @staticmethod
    def _filler(i: int) -> str:
        return (
            f"filler document number {i:03d} with entirely distinct "
            f"token stream alpha{i} beta{i} gamma{i} delta{i} epsilon{i} "
            f"zeta{i} eta{i} theta{i} iota{i} kappa{i} covering enough "
            f"shingles to band normally"
        )

    def test_index_bytes_read_scale_with_batch_not_corpus(self, spark, deduper):
        deduper.ingest(spark, _df(spark, [("base", BASE)]))
        for i in range(5):
            deduper.ingest(spark, _df(spark, [(f"f{i}", self._filler(i))]))
        # probe: a near-dup of BASE — its band keys live only in the
        # first commit's files; the duplicate decision appends nothing
        r1 = deduper.ingest(spark, _df(spark, [("probe1", NEAR)]))
        assert _statuses(r1)["probe1"][0] == "duplicate"
        assert r1.index_files_total >= 6
        # one append fans out to at most the bucket[8] width plus bloom
        # false positives; the probe must not open every shard's files
        assert r1.index_files_read < r1.index_files_total
        assert r1.index_bytes_read < r1.index_bytes_total

        # grow the corpus: the SAME probe batch reads the same files
        for i in range(5, 10):
            deduper.ingest(spark, _df(spark, [(f"f{i}", self._filler(i))]))
        r2 = deduper.ingest(spark, _df(spark, [("probe2", NEAR)]))
        assert _statuses(r2)["probe2"][0] == "duplicate"
        assert r2.index_files_total > r1.index_files_total
        assert r2.index_bytes_total > r1.index_bytes_total
        # the scale pin: bytes read track the batch, not the corpus
        assert r2.index_bytes_read == r1.index_bytes_read
        assert r2.index_files_read == r1.index_files_read


class TestIngest:
    def test_first_batch_all_accepted(self, spark, deduper):
        res = deduper.ingest(spark, _df(spark, [("d1", BASE), ("d2", OTHER)]))
        assert _statuses(res) == {
            "d1": ("accepted", None),
            "d2": ("accepted", None),
        }
        assert res.accepted == 2 and res.duplicates == 0
        assert res.snapshot_id is not None
        # n_bands = 4 rows per accepted doc
        assert deduper.read_index(spark).count() == 8

    def test_cross_batch_duplicate(self, spark, deduper):
        deduper.ingest(spark, _df(spark, [("d1", BASE)]))
        res = deduper.ingest(
            spark, _df(spark, [("d2", BASE), ("d3", NEAR), ("d4", OTHER)])
        )
        st = _statuses(res)
        assert st["d2"] == ("duplicate", "d1")  # identical to indexed
        assert st["d3"] == ("duplicate", "d1")  # near-dup of indexed
        assert st["d4"] == ("accepted", None)
        # only d4's bands were appended
        assert deduper.read_index(spark).count() == 8

    def test_within_batch_duplicate_keeps_min_id(self, spark, deduper):
        res = deduper.ingest(
            spark, _df(spark, [("y", BASE), ("x", BASE), ("z", OTHER)])
        )
        st = _statuses(res)
        assert st["x"] == ("accepted", None)
        assert st["y"] == ("duplicate", "x")
        assert st["z"] == ("accepted", None)

    def test_component_touching_corpus_all_duplicate(self, spark, deduper):
        deduper.ingest(spark, _df(spark, [("m", BASE)]))
        res = deduper.ingest(spark, _df(spark, [("a", BASE), ("b", BASE)]))
        st = _statuses(res)
        # whole within-batch component collapses onto the corpus doc
        assert st["a"] == ("duplicate", "m")
        assert st["b"] == ("duplicate", "m")
        assert res.snapshot_id is None  # nothing accepted, no commit

    def test_replay_is_already_and_commits_nothing(self, spark, deduper):
        batch = _df(spark, [("d1", BASE), ("d2", OTHER)])
        deduper.ingest(spark, batch)
        n_before = deduper.read_index(spark).count()
        res = deduper.ingest(spark, batch)  # crash-replay of same batch
        assert _statuses(res) == {
            "d1": ("already", None),
            "d2": ("already", None),
        }
        assert res.snapshot_id is None
        assert deduper.read_index(spark).count() == n_before

    def test_replay_with_new_docs_accepts_only_new(self, spark, deduper):
        deduper.ingest(spark, _df(spark, [("d1", BASE)]))
        res = deduper.ingest(spark, _df(spark, [("d1", BASE), ("d5", THIRD)]))
        st = _statuses(res)
        assert st["d1"] == ("already", None)
        assert st["d5"] == ("accepted", None)

    def test_unbandable_accepted_but_never_indexed(self, spark, deduper):
        res1 = deduper.ingest(spark, _df(spark, [("s1", SHORT)]))
        assert _statuses(res1) == {"s1": ("unbandable", None)}
        assert res1.snapshot_id is None
        # a later short doc is NOT a near-dup match (no md5("") skew key)
        res2 = deduper.ingest(spark, _df(spark, [("s2", "other short")]))
        assert _statuses(res2) == {"s2": ("unbandable", None)}
        assert deduper.read_index(spark).count() == 0

    def test_index_time_travel_reproduces_decisions(self, spark, deduper):
        s1 = deduper.ingest(spark, _df(spark, [("d1", BASE)])).snapshot_id
        deduper.ingest(spark, _df(spark, [("d2", OTHER)]))
        assert deduper.read_index(spark).count() == 8
        old = deduper.read_index(spark, snapshot_id=s1)
        assert old.count() == 4
        assert [r["doc_id"] for r in old.select("doc_id").distinct().collect()] == ["d1"]


class TestDedupTail:
    def _docs_table(self, spark, tmp_path):
        from pyspark.sql.types import StringType, StructField, StructType

        cat = FsCatalog(str(tmp_path / "docs_wh"))
        schema = StructType(
            [
                StructField("doc_id", StringType(), False),
                StructField("text", StringType(), True),
            ]
        )
        return cat.create_table("corpus", "documents", schema)

    def test_continuous_dedup_over_appends(self, spark, tmp_path, deduper):
        docs = self._docs_table(spark, tmp_path)
        ck = str(tmp_path / "tail.ck")
        docs.append_dataframe(_df(spark, [("d1", BASE), ("d2", OTHER)]))
        docs.append_dataframe(_df(spark, [("d3", BASE), ("d4", THIRD)]))

        seen = []
        results = dedup_tail(
            spark, docs, deduper, ck,
            on_batch=lambda df, res: seen.append(res.total),
        )
        assert len(results) == 1 or len(results) == 2  # tailer may batch
        agg = {
            "accepted": sum(r.accepted for r in results),
            "duplicates": sum(r.duplicates for r in results),
        }
        assert agg == {"accepted": 3, "duplicates": 1}
        assert seen == [r.total for r in results]

        # caught up: nothing more to do
        assert dedup_tail(spark, docs, deduper, ck) == []

        # a third append later is deduped against the full history
        docs.append_dataframe(_df(spark, [("d5", NEAR), ("d6", SHORT)]))
        later = dedup_tail(spark, docs, deduper, ck)
        assert len(later) == 1
        st = _statuses(later[0])
        assert st["d5"] == ("duplicate", "d1")
        assert st["d6"] == ("unbandable", None)

    def test_crash_replay_exactly_once_effect(self, spark, tmp_path, deduper):
        docs = self._docs_table(spark, tmp_path)
        ck = str(tmp_path / "tail.ck")
        docs.append_dataframe(_df(spark, [("d1", BASE), ("d2", OTHER)]))
        dedup_tail(spark, docs, deduper, ck)
        n = deduper.read_index(spark).count()

        # simulate a crash AFTER the index append but BEFORE the cursor
        # commit: wipe the cursor and drain again
        os.remove(ck)
        replay = dedup_tail(spark, docs, deduper, ck)
        assert len(replay) == 1
        assert replay[0].already == 2 and replay[0].accepted == 0
        assert deduper.read_index(spark).count() == n  # no duplicate rows

    def test_ingest_commit_records_source_snapshot(self, spark, tmp_path, deduper):
        docs = self._docs_table(spark, tmp_path)
        ck = str(tmp_path / "tail.ck")
        docs.append_dataframe(_df(spark, [("d1", BASE)]))
        dedup_tail(spark, docs, deduper, ck)
        snap = [
            s
            for s in deduper.table.metadata()["snapshots"]
            if "dedup-source-snapshot" in s["summary"]
        ]
        assert len(snap) == 1
        assert snap[0]["summary"]["dedup-source-snapshot"] == str(
            docs.metadata()["current-snapshot-id"]
        )


class TestPlanContract:
    def test_ingest_decisions_have_no_cartesian(self, spark, deduper):
        """Both joins of an ingest (index lookup, within-batch pairs)
        must stay equi-joins — a band-key typo degrading either to a
        nested-loop join would still pass the semantic tests on tiny
        batches while being quadratic at scale."""
        deduper.ingest(spark, _df(spark, [("d1", BASE)]))
        # build (don't run) a second ingest's decision plan
        batch = _df(spark, [("x", NEAR), ("y", OTHER)])
        from opentelemetry_iceberg_exporter_spark.operators.dedup import (
            band_rows,
            minhash_signatures,
        )

        rows = band_rows(
            minhash_signatures(batch, "doc_id", "text"), "doc_id"
        )
        idx = deduper.read_index(spark)
        joined = rows.join(
            idx,
            (rows["band_idx"] == idx["band_idx"])
            & (rows["band_key"] == idx["band_key"]),
        )
        js = joined._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in js
        assert "BroadcastNestedLoopJoin" not in js


class TestRestParity:
    def test_ingest_over_rest_transport(self, spark, tmp_path):
        from rest_stub import make_server
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            cat = RestCatalogClient(uri, warehouse=warehouse)
            table = create_index_table(cat, "dedup", "band_index")
            dd = IncrementalDeduper(table)
            dd.ingest(spark, _df(spark, [("d1", BASE)]))
            res = dd.ingest(spark, _df(spark, [("d2", NEAR), ("d3", OTHER)]))
            st = _statuses(res)
            assert st["d2"] == ("duplicate", "d1")
            assert st["d3"] == ("accepted", None)
            assert dd.read_index(spark).count() == 8
        finally:
            server.shutdown()
