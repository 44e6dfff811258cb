"""redact_pii: cross-engine equality (Spark vs DuckDB on the same
patterns) plus semantic guarantees (categories detected, placeholders
substituted, idempotence, replacement-order protection)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from opentelemetry_iceberg_exporter_spark.operators.text import (
    PII_PATTERNS,
    duck_redact_pii_sql,
    redact_pii,
)
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

DOCS = [
    ("d1", "Contact alice@example.com or bob.smith+tag@mail.co.uk today"),
    ("d2", "server at 192.168.1.17 answered, backup at 10.0.0.1"),
    ("d3", "SSN 123-45-6789 on file; call +1 (555) 123-4567 now"),
    ("d4", "no pii here, just text with numbers like 7 and 42"),
    ("d5", "mixed: eve@corp.io from 8.8.8.8 phoned 555-867-5309"),
    ("d6", ""),
]


@pytest.fixture(scope="module")
def spark_result(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    rows = redact_pii(df, "doc_id", "text").collect()
    return {r.doc_id: r for r in rows}


class TestSemantics:
    def test_counts(self, spark_result):
        r = spark_result
        assert r["d1"].n_email == 2 and r["d1"].pii_total == 2
        assert r["d2"].n_ip == 2
        assert r["d3"].n_ssn == 1 and r["d3"].n_phone >= 1
        assert r["d4"].pii_total == 0
        assert r["d6"].pii_total == 0

    def test_placeholders_substituted(self, spark_result):
        r = spark_result
        assert "<EMAIL>" in r["d1"].text_redacted
        assert "alice@example.com" not in r["d1"].text_redacted
        assert r["d2"].text_redacted.count("<IP>") == 2
        assert "192.168.1.17" not in r["d2"].text_redacted
        assert "<SSN>" in r["d3"].text_redacted
        assert "123-45-6789" not in r["d3"].text_redacted
        assert r["d4"].text_redacted == DOCS[3][1]  # untouched

    def test_ssn_shielded_from_phone_pass(self, spark_result):
        # replacement ORDER contract: the SSN-shaped group must surface
        # as <SSN>, never be half-eaten by the broader phone pattern
        red = spark_result["d3"].text_redacted
        assert "<SSN>" in red and "<PHONE>" in red

    def test_idempotent(self, spark):
        df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
        once = redact_pii(df, "doc_id", "text").select(
            "doc_id", "text_redacted"
        )
        twice = redact_pii(
            once.withColumnRenamed("text_redacted", "text"), "doc_id", "text"
        ).collect()
        first = {r.doc_id: r.text_redacted for r in once.collect()}
        for r in twice:
            assert r.text_redacted == first[r.doc_id]
            assert r.pii_total == 0  # nothing left to find


class TestCrossEngine:
    def _compare(self, spark, df, con_docs):
        got = {
            r.doc_id: r
            for r in redact_pii(df, "doc_id", "text").collect()
        }
        con = duckdb.connect()
        con.register("documents", con_docs)
        want = con.execute(duck_redact_pii_sql()).fetchall()
        cols = [d[0] for d in con.description]
        for row in want:
            w = dict(zip(cols, row))
            g = got[w["doc_id"]]
            for name, _, _ in PII_PATTERNS:
                assert getattr(g, f"n_{name}") == w[f"n_{name}"], (w["doc_id"], name)
            assert g.text_redacted == w["text_redacted"], w["doc_id"]
            assert g.pii_total == w["pii_total"]

    def test_synthetic(self, spark):
        import pandas as pd

        df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
        self._compare(spark, df, pd.DataFrame(DOCS, columns=["doc_id", "text"]))

    def test_testdata_documents(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        self._compare(spark, docs, docs.toPandas())


class TestCli:
    def test_redact_report_and_replace(self, spark, sf_dir, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        report = str(tmp_path / "report")
        rc = main(
            ["redact", "--input", f"{sf_dir}/documents.parquet", "--output", report]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["rows"] == spark.read.parquet(report).count()
        assert set(spark.read.parquet(report).columns) >= {
            "doc_id", "n_email", "n_ip", "n_ssn", "n_phone", "text_redacted", "pii_total",
        }
        replaced = str(tmp_path / "replaced")
        rc = main(
            [
                "redact", "--input", f"{sf_dir}/documents.parquet",
                "--output", replaced, "--replace-text",
            ]
        )
        assert rc == 0
        out = spark.read.parquet(replaced)
        src = spark.read.parquet(f"{sf_dir}/documents.parquet")
        assert out.count() == src.count()
        assert set(out.columns) == set(src.columns)  # schema preserved
