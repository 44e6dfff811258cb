"""CLI surface for the incremental dedup index (dedup-ingest) and the
quality classifier (quality-train / quality-score)."""

from __future__ import annotations

import json

import duckdb
import pytest

from opentelemetry_iceberg_exporter_spark.__main__ import main

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "turtles carry bright lanterns across the frozen river during a long "
    "winter night under pale stars"
)
OTHER = (
    "completely different content about spark catalyst optimizer plans "
    "and shuffle partitions in distributed query execution engines at "
    "massive scale"
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode("overwrite").parquet(
        path
    )


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


class TestDedupIngestCli:
    def test_two_batches_cross_dedup(self, spark, tmp_path, capsys):
        wh = str(tmp_path / "wh")
        b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
        dec = str(tmp_path / "decisions")
        acc = str(tmp_path / "accepted")
        _write_batch(spark, b1, [("d1", BASE), ("d2", OTHER)])
        _write_batch(spark, b2, [("d3", BASE), ("d4", "fresh novel text " * 5)])

        rc = main(["dedup-ingest", "--input", b1, "--warehouse", wh])
        assert rc == 0
        s1 = _last_json(capsys)
        assert s1["accepted"] == 2 and s1["duplicates"] == 0
        assert s1["index_snapshot"] is not None

        rc = main(
            [
                "dedup-ingest", "--input", b2, "--warehouse", wh,
                "--output", dec, "--accepted-output", acc,
            ]
        )
        assert rc == 0
        s2 = _last_json(capsys)
        assert s2["accepted"] == 1 and s2["duplicates"] == 1

        rows = {
            r[0]: (r[1], r[2])
            for r in duckdb.sql(
                f"SELECT doc_id, status, match_id FROM '{dec}/*.parquet'"
            ).fetchall()
        }
        assert rows["d3"] == ("duplicate", "d1")
        assert rows["d4"][0] == "accepted"
        kept = duckdb.sql(
            f"SELECT doc_id, text FROM '{acc}/*.parquet'"
        ).fetchall()
        assert [k[0] for k in kept] == ["d4"]
        assert kept[0][1].startswith("fresh novel")

    def test_requires_warehouse_or_rest(self, spark, tmp_path):
        b1 = str(tmp_path / "b1")
        _write_batch(spark, b1, [("d1", BASE)])
        with pytest.raises(SystemExit, match="--warehouse is required"):
            main(["dedup-ingest", "--input", b1])


class TestDedupTailCli:
    def test_continuous_tail_exactly_once(self, spark, tmp_path, capsys):
        from pyspark.sql.types import StringType, StructField, StructType

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        schema = StructType(
            [
                StructField("doc_id", StringType(), False),
                StructField("text", StringType(), True),
            ]
        )
        docs = cat.create_table("corpus", "documents", schema)
        docs.append_dataframe(
            spark.createDataFrame([("d1", BASE), ("d2", OTHER)], ["doc_id", "text"])
        )
        docs.append_dataframe(
            spark.createDataFrame([("d3", BASE)], ["doc_id", "text"])
        )
        ck = str(tmp_path / "cursor.json")
        acc = str(tmp_path / "accepted")
        argv = [
            "dedup-tail", "--warehouse", wh,
            "--source-table", "corpus.documents",
            "--checkpoint", ck, "--accepted-output", acc,
        ]
        assert main(argv) == 0
        s1 = _last_json(capsys)
        assert s1["accepted"] == 2 and s1["duplicates"] == 1

        # caught up: second run does nothing
        assert main(argv) == 0
        s2 = _last_json(capsys)
        assert s2["batches"] == 0

        # a later append is deduped against the whole history
        docs.append_dataframe(
            spark.createDataFrame(
                [("d4", OTHER), ("d5", "genuinely new content here")],
                ["doc_id", "text"],
            )
        )
        assert main(argv) == 0
        s3 = _last_json(capsys)
        assert s3["accepted"] == 1 and s3["duplicates"] == 1
        kept = sorted(
            r[0] for r in duckdb.sql(f"SELECT doc_id FROM '{acc}/*.parquet'").fetchall()
        )
        assert kept == ["d1", "d2", "d5"]

    def test_bad_table_ref(self, tmp_path):
        with pytest.raises(SystemExit, match="namespace.name"):
            main(
                [
                    "dedup-tail", "--warehouse", str(tmp_path),
                    "--source-table", "nodots",
                    "--checkpoint", str(tmp_path / "ck"),
                ]
            )


@pytest.mark.slow
class TestQualityCli:
    def test_train_then_score_roundtrip(self, spark, tmp_path, capsys):
        good = [(f"g{i}", f"a clear factual sentence about topic {i} with details", 1)
                for i in range(5)]
        junk = [(f"j{i}", "click free winner " * 4, 0) for i in range(5)]
        train = str(tmp_path / "train")
        spark.createDataFrame(good + junk, ["doc_id", "text", "label"]).write.parquet(
            train
        )
        model = str(tmp_path / "model.json")
        rc = main(
            [
                "quality-train", "--input", train, "--label-col", "label",
                "--model-out", model, "--dim", "4096", "--iters", "10",
            ]
        )
        assert rc == 0
        t = _last_json(capsys)
        assert t["final_loss"] < 0.3 and t["nonzero_weights"] > 0

        scored = str(tmp_path / "scored")
        rc = main(
            [
                "quality-score", "--input", train, "--model", model,
                "--output", scored,
            ]
        )
        assert rc == 0
        s = _last_json(capsys)
        assert s["rows"] == 10 and s["kept"] == 5
        rows = duckdb.sql(
            f"SELECT doc_id, quality_keep FROM '{scored}/*.parquet'"
        ).fetchall()
        assert all(keep == doc.startswith("g") for doc, keep in rows)

    def test_score_keep_only_writes_input_rows(self, spark, tmp_path, capsys):
        rows = [("g0", "a clear factual sentence with details", 1),
                ("j0", "click free winner click free winner", 0)]
        train = str(tmp_path / "train")
        spark.createDataFrame(rows, ["doc_id", "text", "label"]).write.parquet(train)
        model = str(tmp_path / "model.json")
        main(
            [
                "quality-train", "--input", train, "--label-col", "label",
                "--model-out", model, "--dim", "1024", "--iters", "10",
            ]
        )
        kept = str(tmp_path / "kept")
        rc = main(
            [
                "quality-score", "--input", train, "--model", model,
                "--output", kept, "--keep-only",
            ]
        )
        assert rc == 0
        capsys.readouterr()
        out = duckdb.sql(f"SELECT doc_id, text, label FROM '{kept}/*.parquet'").fetchall()
        assert out == [("g0", "a clear factual sentence with details", 1)]
