"""Content-quality flags + corpus report (operators/text.py):
cross-engine equality for the flags, hand-computed values on a
synthetic corpus, and the report's aggregation invariants."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.text import (
    content_flags,
    corpus_report,
    duck_content_flags_sql,
)
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table


def test_flags_match_duckdb_on_testdata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s = {r["doc_id"]: tuple(r)[1:] for r in content_flags(docs, "doc_id", "text").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    d = {row[0]: row[1:] for row in con.sql(duck_content_flags_sql()).fetchall()}
    assert s == d


def test_flags_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "contact me@example.com or https://a.io/x and HTTP caps 123"),
            (2, "header\nbody one\nheader\nbody two\nheader"),
            (3, "no signals here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in content_flags(df, "doc_id", "text").collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_urls"] == 1
    assert out[3]["n_emails"] == 0 and out[3]["n_urls"] == 0
    # doc 2: 5 lines, 3 distinct -> boilerplate 1 - 3/5 = 0.4
    assert out[2]["n_lines"] == 5
    assert abs(out[2]["boilerplate_ratio"] - 0.4) < 1e-9
    assert out[3]["digit_ratio"] == 0.0


def test_corpus_report_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rep = corpus_report(docs, ["lang"], "doc_id", "text").collect()
    by_lang = {r["lang"]: r for r in rep}
    # partition: group doc counts sum to the corpus
    assert sum(r["n_docs"] for r in rep) == docs.count()
    # spot-check one group against direct aggregation
    lang, row = next(iter(by_lang.items()))
    direct = docs.filter(F.col("lang") == lang).count()
    assert row["n_docs"] == direct
    for r in rep:
        assert r["min_tokens"] <= r["avg_tokens"] <= r["max_tokens"]
        assert 0.0 <= r["dup_rate"] < 1.0
        assert r["p10_quality"] <= r["p50_quality"]


def test_corpus_report_counts_known_dups(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "same text here"),
            (2, "a", "same  TEXT here"),  # normalizes equal -> dup
            (3, "a", "different entirely"),
            (4, "b", "unique in b"),
        ],
        "doc_id long, src string, text string",
    )
    rep = {r["src"]: r for r in corpus_report(df, ["src"], "doc_id", "text").collect()}
    assert abs(rep["a"]["dup_rate"] - (1 / 3)) < 1e-6  # dup_rate rounds to 6dp
    assert rep["b"]["dup_rate"] == 0.0
