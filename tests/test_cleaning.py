"""Corpus-cleaning operator contracts (operators/cleaning.py):
paragraph dedup and benchmark decontamination, both pinned
cross-engine against their DuckDB SQL mirrors (synthetic corpora with
known boilerplate/contamination AND the real documents table), plus
plan shape (benchmark set broadcasts; corpus text never shuffles)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.cleaning import (
    dedup_paragraphs,
    duck_dedup_paragraphs_sql,
    duck_flag_contamination_sql,
    flag_contamination,
)

BOILER = "This site uses cookies.\nAccept to continue."


def _corpus(spark):
    rows = [
        ("a", f"{BOILER}\n\nUnique story about a fox.\n\nThe end."),
        ("b", f"Intro text.\n\n{BOILER}\n\nAnother unique paragraph."),
        ("c", f"{BOILER}"),
        ("d", "Completely original text with no boilerplate."),
        ("e", "   \n\n   "),  # whitespace-only paragraphs
        ("f", f"Shared tail paragraph.\n\n{BOILER}"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


class TestParagraphDedup:
    def test_matches_duckdb_on_synthetic(self, spark, tmp_path):
        df = _corpus(spark)
        src = str(tmp_path / "c.parquet")
        df.coalesce(1).write.parquet(src)
        got = {
            r["doc_id"]: (r["text_deduped"], r["n_paragraphs"], r["n_dropped"])
            for r in dedup_paragraphs(df, "doc_id", "text", max_docs=2).collect()
        }
        con = duckdb.connect()
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(
                duck_dedup_paragraphs_sql(
                    f"read_parquet('{src}/*.parquet')", "doc_id", "text", 2
                )
            ).fetchall()
        }
        assert got == want

    def test_boilerplate_dropped_everywhere_order_kept(self, spark):
        out = {
            r["doc_id"]: r
            for r in dedup_paragraphs(
                _corpus(spark), "doc_id", "text", max_docs=2
            ).collect()
        }
        # the cookie banner appears in 4 docs > max_docs=2 -> dropped
        assert out["a"]["text_deduped"] == "Unique story about a fox.\n\nThe end."
        assert out["b"]["text_deduped"] == "Intro text.\n\nAnother unique paragraph."
        assert out["c"]["text_deduped"] == "" and out["c"]["n_dropped"] == 1
        assert out["d"]["n_dropped"] == 0
        assert out["e"]["n_paragraphs"] == 0  # whitespace never counts
        assert out["f"]["text_deduped"] == "Shared tail paragraph."

    def test_threshold_keeps_rare_paragraphs(self, spark):
        out = {
            r["doc_id"]: r["n_dropped"]
            for r in dedup_paragraphs(
                _corpus(spark), "doc_id", "text", max_docs=4
            ).collect()
        }
        assert all(v == 0 for v in out.values())  # banner in exactly 4 docs

    def test_matches_duckdb_on_real_documents(self, spark, sf_dir):
        from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
        got = {
            r["doc_id"]: (r["text_deduped"], r["n_paragraphs"], r["n_dropped"])
            for r in dedup_paragraphs(docs, "doc_id", "text", max_docs=1).collect()
        }
        con = duckdb.connect()
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(
                duck_dedup_paragraphs_sql(
                    f"(SELECT CAST(doc_id AS VARCHAR) AS doc_id, text "
                    f"FROM read_parquet('{sf_dir}/documents.parquet'))",
                    "doc_id",
                    "text",
                    1,
                )
            ).fetchall()
        }
        assert got == want


class TestContamination:
    def _bench(self, spark, sf_dir):
        from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        # benchmark = 20-token slices of a few real documents -> those
        # documents MUST flag; unrelated docs must not
        return (
            docs.filter(F.col("doc_id") % 50 == 0)
            .select(
                F.array_join(
                    F.slice(F.split(F.trim("text"), "\\s+"), 3, 20), " "
                ).alias("text")
            )
            .filter(F.size(F.split(F.trim("text"), "\\s+")) >= 13)
        )

    def test_matches_duckdb(self, spark, sf_dir, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
        bench = self._bench(spark, sf_dir)
        bsrc = str(tmp_path / "bench.parquet")
        bench.coalesce(1).write.parquet(bsrc)
        got = {
            r["doc_id"]: (r["contaminated_ngrams"], r["contaminated"])
            for r in flag_contamination(docs, bench, "doc_id", "text").collect()
        }
        con = duckdb.connect()
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                duck_flag_contamination_sql(
                    f"(SELECT CAST(doc_id AS VARCHAR) AS doc_id, text "
                    f"FROM read_parquet('{sf_dir}/documents.parquet'))",
                    f"read_parquet('{bsrc}/*.parquet')",
                    "doc_id",
                    "text",
                )
            ).fetchall()
        }
        assert got == want
        assert any(v[1] for v in got.values())  # the sliced docs flag
        assert not all(v[1] for v in got.values())

    def test_sliced_sources_flag(self, spark, sf_dir):
        from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
        out = {
            r["doc_id"]: r["contaminated"]
            for r in flag_contamination(
                docs, self._bench(spark, sf_dir), "doc_id", "text"
            ).collect()
        }
        flagged = {k for k, v in out.items() if v}
        sources = {
            r["doc_id"]
            for r in docs.filter(
                (F.col("doc_id") % 50 == 0)
                & (F.size(F.split(F.trim("text"), "\\s+")) >= 22)
            ).collect()
        }
        assert sources <= flagged

    def test_benchmark_side_broadcasts(self, spark, sf_dir):
        from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
        plan = (
            flag_contamination(docs, self._bench(spark, sf_dir), "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastExchange" in plan
