"""Incremental exact-substring dedup (operators/incremental_substr.py):
batch-over-batch ExactSubstr against a catalog-backed k-gram anchor
index — corpus-known substrings excised without re-reading corpus
text, one canonical copy across history, exactly-once replay, both
transports, time-traveled decisions."""

from __future__ import annotations

import os

import pytest

from opentelemetry_iceberg_exporter_spark.operators.incremental_substr import (
    IncrementalSubstrDeduper,
    create_substr_index_table,
)
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

from rest_stub import make_server

PASSAGE = (
    "permission is hereby granted, free of charge, to any person "
    "obtaining a copy of this software and associated documentation"
)
K = 30


@pytest.fixture()
def dedup(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    table = create_substr_index_table(cat, "corpus", "substr_idx")
    return IncrementalSubstrDeduper(table, k=K)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _texts(result):
    # ingest casts ids to STRING (the index schema type) — same
    # contract as IncrementalDeduper
    return {
        r["doc_id"]: r["text_deduped"] for r in result.output.collect()
    }


class TestIngest:
    def test_first_batch_keeps_canonical_excises_rest(self, spark, dedup):
        res = dedup.ingest(
            spark,
            _batch(
                spark,
                [
                    (1, "alpha " * 4 + PASSAGE + " omega " * 4),
                    (2, "beta " * 5 + PASSAGE + " delta " * 5),
                ],
            ),
        )
        texts = _texts(res)
        assert PASSAGE in texts["1"] and PASSAGE not in texts["2"]
        assert res.docs == 2 and res.trimmed_docs >= 1
        assert res.snapshot_id is not None and res.new_grams > 0

    def test_second_batch_excised_against_corpus(self, spark, dedup):
        dedup.ingest(spark, _batch(spark, [(1, "x " * 10 + PASSAGE)]))
        # the fresh region is LONGER than k, so grams fully inside it
        # (no overlap with the excised span) must still be indexed
        # non-repetitive (no internal >=k duplicate) and longer than k
        fresh = "fresh zero one two three four five six seven eight nine "
        res2 = dedup.ingest(spark, _batch(spark, [(7, fresh + PASSAGE)]))
        texts = _texts(res2)
        assert PASSAGE not in texts["7"]  # the corpus owns it already
        # the excised span may swallow the shared boundary space
        assert texts["7"].startswith(fresh.rstrip())
        # and genuinely new content indexes
        assert res2.new_grams > 0

    def test_anchor_overlapping_excised_span_not_indexed(self, spark, dedup):
        """A fresh anchor whose k-char window overlaps a span excised
        from its own text must NOT enter the index: its content does
        not survive in the output corpus, so indexing it would excise
        later copies against a canonical that no longer exists."""
        dedup.ingest(spark, _batch(spark, [(1, "x " * 10 + PASSAGE)]))
        # doc 7's entire fresh region is SHORTER than k: every fresh
        # gram extends into the excised PASSAGE span
        res2 = dedup.ingest(
            spark, _batch(spark, [(7, "tiny fresh bit " + PASSAGE)])
        )
        assert res2.new_grams == 0
        assert dedup.read_index(spark).filter("doc_id = '7'").count() == 0
        # and the content is NOT lost corpus-wide: a later copy of the
        # same substring keeps its own text (no dangling canonical)
        res3 = dedup.ingest(
            spark, _batch(spark, [(9, "tiny fresh bit " + PASSAGE)])
        )
        texts = _texts(res3)
        assert texts["9"].startswith("tiny fresh bit")
        assert PASSAGE not in texts["9"]  # PASSAGE itself is corpus-owned

    def test_replay_is_byte_identical_and_appends_nothing(self, spark, dedup):
        batch = _batch(
            spark,
            [
                (1, "alpha " * 4 + PASSAGE + " omega " * 4),
                (2, "beta " * 5 + PASSAGE + " delta " * 5),
            ],
        )
        first = dedup.ingest(spark, batch)
        before = {r["doc_id"]: r["text_deduped"] for r in first.output.collect()}
        replay = dedup.ingest(spark, batch)
        after = _texts(replay)
        assert after == before  # byte-identical decisions
        assert replay.new_grams == 0  # exactly-once index effect
        assert replay.snapshot_id is None or replay.new_grams == 0

    def test_duplicate_doc_under_new_id_fully_excised(self, spark, dedup):
        text = "unique preamble " + PASSAGE + " unique epilogue tail words"
        dedup.ingest(spark, _batch(spark, [(1, text)]))
        res = dedup.ingest(spark, _batch(spark, [(99, text)]))
        texts = _texts(res)
        # the whole duplicated body vanishes (anchors cover it)
        assert PASSAGE not in texts["99"]
        assert len(texts["99"]) < len(text) * 0.35

    def test_clean_docs_pass_through(self, spark, dedup):
        dedup.ingest(spark, _batch(spark, [(1, "one corpus document " * 3)]))
        res = dedup.ingest(
            spark,
            _batch(
                spark,
                [(5, "totally novel content with no overlap whatsoever here")],
            ),
        )
        texts = _texts(res)
        assert texts["5"] == (
            "totally novel content with no overlap whatsoever here"
        )
        row = res.output.filter("doc_id = '5'").first()
        assert row["spans_removed"] == 0 and row["chars_removed"] == 0

    def test_time_traveled_index_reproduces_decisions(self, spark, dedup):
        r1 = dedup.ingest(spark, _batch(spark, [(1, "p " * 9 + PASSAGE)]))
        # batch 2 needs fresh content longer than k OUTSIDE the excised
        # span, else the overlap exemption (correctly) indexes nothing
        dedup.ingest(
            spark,
            _batch(
                spark, [(2, "qq zero one two three four five six " + PASSAGE)]
            ),
        )
        # the index as of snapshot 1 has only batch 1's grams
        idx_then = dedup.read_index(spark, snapshot_id=r1.snapshot_id)
        idx_now = dedup.read_index(spark)
        assert idx_then.count() < idx_now.count()
        assert idx_then.filter("doc_id = '2'").count() == 0

    def test_stride_content_sampling(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh2"))
        table = create_substr_index_table(cat, "corpus", "idx_s")
        d = IncrementalSubstrDeduper(table, k=K, stride=4)
        long_shared = PASSAGE + " and then " + PASSAGE.upper()
        d.ingest(spark, _batch(spark, [(1, "A" * 17 + long_shared)]))
        res = d.ingest(spark, _batch(spark, [(2, "ZZZ" * 7 + long_shared)]))
        texts = _texts(res)
        # offsets differ mod stride; content sampling still anchors
        assert "hereby granted" not in texts["2"]


@pytest.mark.slow
class TestBatchScopedProbe:
    """The index read is bloom-pruned to the files that might hold a
    batch hash: bytes read scale with the BATCH, not the corpus."""

    @staticmethod
    def _shard(i: int) -> str:
        # non-repetitive (no internal >=k duplicate), distinct per i
        words = " ".join(f"w{i:03d}n{j:02d}" for j in range(12))
        return f"shard {i:03d} {words} end"

    def test_index_bytes_read_scale_with_batch_not_corpus(self, spark, dedup):
        for i in range(6):
            dedup.ingest(spark, _batch(spark, [(100 + i, self._shard(i))]))
        # probe: an exact duplicate of shard 0 — its grams live ONLY in
        # batch 0's files; fully excised, so nothing is appended and the
        # ingest is a pure read
        r1 = dedup.ingest(spark, _batch(spark, [(999, self._shard(0))]))
        assert r1.new_grams == 0 and _texts(r1)["999"] == ""
        assert r1.index_files_total >= 6
        # one append fans out to at most the bucket[8] width: the probe
        # must not open the other shards' files
        assert r1.index_files_read <= 8
        assert r1.index_bytes_read < r1.index_bytes_total

        # grow the corpus 2x: the SAME probe batch reads the same files
        for i in range(6, 12):
            dedup.ingest(spark, _batch(spark, [(100 + i, self._shard(i))]))
        r2 = dedup.ingest(spark, _batch(spark, [(998, self._shard(0))]))
        assert r2.index_files_total > r1.index_files_total
        assert r2.index_bytes_total > r1.index_bytes_total
        # the scale pin: bytes read track the batch, not the corpus
        assert r2.index_bytes_read == r1.index_bytes_read
        assert r2.index_files_read == r1.index_files_read

    def test_empty_batch_reads_zero_index_files(self, spark, dedup):
        """An empty batch has no keys, so the probe proves every index
        file matchless: nothing read, nothing appended, no snapshot."""
        dedup.ingest(spark, _batch(spark, [(1, self._shard(1))]))
        empty = spark.createDataFrame([], "doc_id long, text string")
        r = dedup.ingest(spark, empty)
        assert r.docs == 0 and r.new_grams == 0 and r.snapshot_id is None
        assert r.index_files_read == 0 and r.index_files_total > 0

    def test_compacted_index_keeps_blooms_and_correctness(self, spark, dedup):
        """rewrite_data_files bounds the probe's O(files) footer reads
        as batches accumulate; the consolidated files must keep their
        bloom filters (write options come from table properties) and
        ingest decisions must be unchanged. (File-level pruning within
        one small compacted test index is structurally gone — every
        bucket file holds every shard's grams; at production scale
        pruning is probabilistic per 128MB file. The bloom presence is
        what keeps it possible.)"""
        from opentelemetry_iceberg_exporter_spark.sinks.parquet_footer import (
            footer_row_group_stats,
        )

        for i in range(6):
            dedup.ingest(spark, _batch(spark, [(100 + i, self._shard(i))]))
        before, _ = dedup.table.plan_files()
        rows_before = dedup.read_index(spark).count()
        assert dedup.table.rewrite_data_files(spark, min_files=2) is not None
        after, _ = dedup.table.plan_files()
        assert len(after) < len(before)
        assert dedup.read_index(spark).count() == rows_before
        # every compacted file still carries a bloom on h
        for f in after:
            groups = footer_row_group_stats(f.file_path)
            assert groups and all(
                g["columns"]["h"].get("bloom_offset") is not None
                for g in groups
            )
        # and the probe-backed ingest still decides identically
        r = dedup.ingest(spark, _batch(spark, [(999, self._shard(0))]))
        assert _texts(r)["999"] == "" and r.new_grams == 0

    def test_fold_duplicate_anchors_repairs_races(self, spark, dedup):
        from pyspark.sql import functions as F

        dedup.ingest(spark, _batch(spark, [(1, self._shard(1))]))
        idx = dedup.read_index(spark)
        n = idx.count()
        # simulate a racing writer: re-append the same hashes under a
        # LARGER canonical (min-fold must keep the original rows)
        dedup.table.append_dataframe(
            idx.withColumn("doc_id", F.lit("zzz-racer"))
        )
        assert dedup.read_index(spark).count() == 2 * n
        folded = dedup.fold_duplicate_anchors(spark)
        assert folded == n
        after = dedup.read_index(spark)
        assert after.count() == n
        assert after.filter("doc_id = 'zzz-racer'").count() == 0
        # idempotent: a clean index folds nothing and commits nothing
        snap = dedup.table.metadata()["current-snapshot-id"]
        assert dedup.fold_duplicate_anchors(spark) == 0
        assert dedup.table.metadata()["current-snapshot-id"] == snap

    def test_ingest_race_tolerant_before_fold(self, spark, dedup):
        """Advisor finding (r11): with duplicate hash rows in the index
        (racing double-insert, BEFORE fold_duplicate_anchors runs) a
        replayed canonical doc must still hit its OWN canonical and
        stay untouched — the ingest join min-folds candidate rows per
        hash, so a duplicated hash can never excise every copy
        (corpus-wide content loss)."""
        from pyspark.sql import functions as F

        doc = "alpha " * 4 + PASSAGE + " omega " * 4
        dedup.ingest(spark, _batch(spark, [(1, doc)]))
        idx = dedup.read_index(spark)
        # racing writer double-inserted the same hashes under a LARGER
        # canonical (string '9...' > '1'): min-fold must prefer doc 1
        dedup.table.append_dataframe(
            idx.withColumn("doc_id", F.lit("9999-racer")).withColumn(
                "pos", F.col("pos") + F.lit(1)
            )
        )
        res = dedup.ingest(spark, _batch(spark, [(1, doc)]))
        texts = _texts(res)
        assert texts["1"] == doc  # replay byte-identical, nothing excised
        assert res.new_grams == 0  # and nothing re-indexed


class TestTail:
    def test_substr_tail_drains_and_resumes(self, spark, tmp_path):
        """The checkpointed tailer drives the ingester exactly-once:
        two source commits drain as two ingests; a re-run with the same
        checkpoint processes nothing new."""
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from opentelemetry_iceberg_exporter_spark.operators.incremental_substr import (
            substr_tail,
        )

        cat = FsCatalog(str(tmp_path / "wh"))
        src_schema = StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("text", StringType(), True),
            ]
        )
        src = cat.create_table("corpus", "docs", src_schema)
        src.append_dataframe(_batch(spark, [(1, "lead " * 5 + PASSAGE)]).coalesce(1))
        src.append_dataframe(_batch(spark, [(2, "tail " * 5 + PASSAGE)]).coalesce(1))
        idx = create_substr_index_table(cat, "corpus", "substr_idx")
        d = IncrementalSubstrDeduper(idx, k=K)
        ckpt = str(tmp_path / "ckpt")
        seen: list = []
        results = substr_tail(
            spark, src, d, ckpt,
            on_batch=lambda df, res: seen.append(_texts(res)),
            max_files_per_batch=1,  # one ingest per source commit
        )
        assert len(results) == 2
        assert PASSAGE in seen[0]["1"]  # first commit owns the passage
        assert PASSAGE not in seen[1]["2"]  # second commit trimmed
        # resume: nothing new
        assert substr_tail(spark, src, d, ckpt) == []


class TestCli:
    def test_substr_ingest_cli(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
        _batch(spark, [(1, "pre " * 5 + PASSAGE)]).write.parquet(b1)
        _batch(spark, [(2, "post " * 5 + PASSAGE)]).write.parquet(b2)
        wh = str(tmp_path / "wh")
        base = ["substr-ingest", "--warehouse", wh, "--k", str(K)]
        assert main(base + ["--input", b1, "--output", str(tmp_path / "o1")]) == 0
        assert main(base + ["--input", b2, "--output", str(tmp_path / "o2")]) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["trimmed_docs"] == 1
        out2 = spark.read.parquet(str(tmp_path / "o2"))
        (row,) = out2.collect()
        assert PASSAGE not in row["text_deduped"]
        assert row["chars_removed"] > 0
        # the scale signal rides the CLI output
        assert stats["index_files_read"] <= stats["index_files_total"]

    def test_substr_fold_cli(self, spark, tmp_path, capsys):
        import json

        from pyspark.sql import functions as F

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        cat = FsCatalog(str(tmp_path / "wh"))
        table = create_substr_index_table(cat, "dedup", "substr_index")
        d = IncrementalSubstrDeduper(table, k=K)
        d.ingest(spark, _batch(spark, [(1, "zero one two " + PASSAGE)]))
        idx = d.read_index(spark)
        n = idx.count()
        table.append_dataframe(idx.withColumn("doc_id", F.lit("zz-racer")))
        base = [
            "substr-fold", "--warehouse", str(tmp_path / "wh"),
            "--table", "dedup.substr_index",
        ]
        assert main(base) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["folded_rows"] == n
        assert d.read_index(spark).count() == n
        # clean index: no-op, nothing committed
        assert main(base) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["folded_rows"] == 0


class TestTailCli:
    def test_substr_tail_cli(self, spark, tmp_path, capsys):
        import json

        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        cat = FsCatalog(str(tmp_path / "wh"))
        src_schema = StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("text", StringType(), True),
            ]
        )
        src = cat.create_table("corpus", "docs", src_schema)
        src.append_dataframe(_batch(spark, [(1, "lead " * 5 + PASSAGE)]).coalesce(1))
        src.append_dataframe(_batch(spark, [(2, "tail " * 5 + PASSAGE)]).coalesce(1))
        out = str(tmp_path / "trimmed")
        rc = main(
            [
                "substr-tail",
                "--warehouse", str(tmp_path / "wh"),
                "--source-table", "corpus.docs",
                "--index-table", "corpus.substr_idx",
                "--checkpoint", str(tmp_path / "ckpt"),
                "--k", str(K),
                "--output", out,
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["docs"] == 2 and stats["trimmed_docs"] == 1
        trimmed = {
            r["doc_id"]: r["text_deduped"]
            for r in spark.read.parquet(out).collect()
        }
        assert PASSAGE in trimmed["1"] and PASSAGE not in trimmed["2"]


class TestRestTransport:
    def test_fold_duplicate_anchors_over_rest(self, spark, tmp_path):
        """The race-repair fold commits its overwrite snapshot through
        the REST transport too."""
        from pyspark.sql import functions as F

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "whf")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            table = create_substr_index_table(client, "corpus", "fold_idx")
            d = IncrementalSubstrDeduper(table, k=K)
            d.ingest(spark, _batch(spark, [(1, "zero one two " + PASSAGE)]))
            idx = d.read_index(spark)
            n = idx.count()
            table.append_dataframe(idx.withColumn("doc_id", F.lit("zz-racer")))
            assert d.fold_duplicate_anchors(spark) == n
            after = d.read_index(spark)
            assert after.count() == n
            assert after.filter("doc_id = 'zz-racer'").count() == 0
            assert d.fold_duplicate_anchors(spark) == 0
        finally:
            server.shutdown()

    def test_rest_parity(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            table = create_substr_index_table(client, "corpus", "substr_idx")
            d = IncrementalSubstrDeduper(table, k=K)
            d.ingest(spark, _batch(spark, [(1, "pre " * 5 + PASSAGE)]))
            # fresh prefix longer than k (and non-repetitive) so the
            # overlap exemption leaves indexable novel grams
            res = d.ingest(
                spark,
                _batch(
                    spark,
                    [(2, "post zero one two three four five six " + PASSAGE)],
                ),
            )
            texts = _texts(res)
            assert PASSAGE not in texts["2"]
            assert res.new_grams > 0  # the novel prefix indexed
        finally:
            server.shutdown()