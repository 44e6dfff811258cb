"""Sequence-packing operator contracts (operators/packing.py).

pack_concat_chunks is pinned cross-engine: the distributed two-pass
prefix sum (range shuffle + partition-local window + broadcast offsets)
must equal DuckDB's single global window cumsum exactly — and must not
change when the partition count does. pack_first_fit is pinned on its
invariants: complete unique assignment, budget respected (except
explicit overflow singletons), determinism under repartitioning, and
the FFD fill-efficiency bound."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.functions import tokens
from opentelemetry_iceberg_exporter_spark.operators.packing import (
    duck_concat_chunks_sql,
    pack_concat_chunks,
    pack_first_fit,
)

BUDGET = 512


@pytest.fixture()
def doc_tokens(spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )


class TestConcatChunks:
    def test_matches_duckdb_global_cumsum(self, spark, doc_tokens, sf_dir, tmp_path):
        src = str(tmp_path / "toks.parquet")
        doc_tokens.coalesce(1).write.parquet(src)
        got = {
            r["doc_id"]: (r["start_offset"], r["first_seq"], r["last_seq"])
            for r in pack_concat_chunks(
                doc_tokens, "doc_id", "n_tokens", BUDGET
            ).collect()
        }
        con = duckdb.connect()
        want = {
            r[0]: (r[2], r[3], r[4])
            for r in con.execute(
                duck_concat_chunks_sql(
                    f"read_parquet('{src}/*.parquet')", "doc_id", "n_tokens", BUDGET
                )
            ).fetchall()
        }
        assert got == want

    def test_partitioning_invariant(self, spark, doc_tokens):
        a = {
            r["doc_id"]: r["start_offset"]
            for r in pack_concat_chunks(
                doc_tokens, "doc_id", "n_tokens", BUDGET, num_partitions=3
            ).collect()
        }
        b = {
            r["doc_id"]: r["start_offset"]
            for r in pack_concat_chunks(
                doc_tokens.repartition(17), "doc_id", "n_tokens", BUDGET,
                num_partitions=11,
            ).collect()
        }
        assert a == b

    def test_offsets_are_a_gapless_concatenation(self, spark, doc_tokens):
        rows = pack_concat_chunks(doc_tokens, "doc_id", "n_tokens", BUDGET).collect()
        rows.sort(key=lambda r: r["start_offset"])
        pos = 0
        for r in rows:
            assert r["start_offset"] == pos
            pos += r["n_tokens"]
        assert pos == sum(r["n_tokens"] for r in rows)

    def test_seq_span_semantics(self, spark):
        df = spark.createDataFrame(
            [("a", 300), ("b", 300), ("c", 0), ("d", 600)], "doc_id string, n long"
        )
        out = {
            r["doc_id"]: r
            for r in pack_concat_chunks(df, "doc_id", "n", 512, order_col="doc_id").collect()
        }
        # a: [0,300) -> seq 0 only; b: [300,600) spans the 512 cut
        assert (out["a"]["first_seq"], out["a"]["last_seq"]) == (0, 0)
        assert (out["b"]["first_seq"], out["b"]["last_seq"]) == (0, 1)
        # c: zero tokens at offset 600 -> seq 1, no span
        assert (out["c"]["first_seq"], out["c"]["last_seq"]) == (1, 1)
        # d: [600,1200) spans the 1024 cut
        assert (out["d"]["first_seq"], out["d"]["last_seq"]) == (1, 2)

    def test_budget_validation(self, spark, doc_tokens):
        with pytest.raises(ValueError, match="budget"):
            pack_concat_chunks(doc_tokens, "doc_id", "n_tokens", 0)


class TestFirstFit:
    def test_complete_unique_assignment(self, spark, doc_tokens):
        out = pack_first_fit(doc_tokens, "doc_id", "n_tokens", BUDGET)
        n = doc_tokens.count()
        assert out.count() == n
        assert out.select("doc_id").distinct().count() == n

    def test_bins_respect_budget_except_overflow(self, spark, doc_tokens):
        out = pack_first_fit(doc_tokens, "doc_id", "n_tokens", BUDGET).collect()
        loads: dict[int, int] = {}
        members: dict[int, list] = {}
        for r in out:
            loads[r["bin_id"]] = loads.get(r["bin_id"], 0) + r["n_tokens"]
            members.setdefault(r["bin_id"], []).append(r)
        for b, load in loads.items():
            if load > BUDGET:
                # overflow bins hold exactly one too-large document
                assert len(members[b]) == 1 and members[b][0]["overflow"]
        assert any(len(m) > 1 for m in members.values())  # packing happened

    def test_deterministic_under_repartition(self, spark, doc_tokens):
        a = {
            r["doc_id"]: r["bin_id"]
            for r in pack_first_fit(doc_tokens, "doc_id", "n_tokens", BUDGET).collect()
        }
        b = {
            r["doc_id"]: r["bin_id"]
            for r in pack_first_fit(
                doc_tokens.repartition(13), "doc_id", "n_tokens", BUDGET
            ).collect()
        }
        assert a == b

    def test_ffd_fill_efficiency(self, spark, doc_tokens):
        """Bins used stay within the FFD bound of the ideal:
        11/9 * ceil(total/budget) + num_shards (one tail bin per
        shard)."""
        shards = 8
        out = pack_first_fit(
            doc_tokens.filter("n_tokens <= %d" % BUDGET),
            "doc_id",
            "n_tokens",
            BUDGET,
            num_shards=shards,
        )
        total = out.agg(F.sum("n_tokens")).collect()[0][0]
        bins_used = out.select("bin_id").distinct().count()
        ideal = -(-total // BUDGET)
        assert bins_used <= (11 * ideal) // 9 + shards + 1

    def test_single_shard_matches_sequential_ffd(self, spark):
        """num_shards=1 is plain FFD — pin it against a hand-rolled
        implementation on a small instance."""
        data = [("d%02d" % i, t) for i, t in enumerate(
            [500, 400, 300, 300, 200, 200, 100, 100, 50, 700]
        )]
        df = spark.createDataFrame(data, "doc_id string, n long")
        out = {
            r["doc_id"]: r["bin_id"]
            for r in pack_first_fit(df, "doc_id", "n", 512, num_shards=1).collect()
        }
        # sequential FFD over tokens desc, id asc
        order = sorted(data, key=lambda x: (-x[1], x[0]))
        bins, expect = [], {}
        for did, t in order:
            if t > 512:
                expect[did] = len(bins)
                bins.append(t)
                continue
            for i, load in enumerate(bins):
                if load + t <= 512:
                    expect[did] = i
                    bins[i] = load + t
                    break
            else:
                expect[did] = len(bins)
                bins.append(t)
        assert out == expect


class TestPlanShape:
    def test_first_fit_is_one_shuffle(self, spark, doc_tokens):
        import re

        plan = (
            pack_first_fit(doc_tokens, "doc_id", "n_tokens", BUDGET)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange ", plan)) == 1
        assert "SinglePartition" not in plan

    def test_concat_chunks_has_no_global_window(self, spark, doc_tokens):
        # the range shuffle is absorbed by the localCheckpoint; what
        # must never appear downstream is a SinglePartition exchange
        # (the naive global-window cumsum shape)
        plan = (
            pack_concat_chunks(doc_tokens, "doc_id", "n_tokens", BUDGET)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SinglePartition" not in plan
