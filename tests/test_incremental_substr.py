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
        res2 = dedup.ingest(
            spark, _batch(spark, [(7, "fresh words only here " + PASSAGE)])
        )
        texts = _texts(res2)
        assert PASSAGE not in texts["7"]  # the corpus owns it already
        assert texts["7"].startswith("fresh words only here")
        # and genuinely new content indexes
        assert res2.new_grams > 0

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
        dedup.ingest(spark, _batch(spark, [(2, "q " * 9 + PASSAGE)]))
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
            res = d.ingest(spark, _batch(spark, [(2, "post " * 5 + PASSAGE)]))
            texts = _texts(res)
            assert PASSAGE not in texts["2"]
            assert res.new_grams > 0  # the novel "post" prefix indexed
        finally:
            server.shutdown()