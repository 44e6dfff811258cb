"""tf-idf top-terms operator (operators/text.py): cross-engine equality
with the DuckDB rendering on real testdata, and ranking semantics on a
hand-computed corpus."""

from __future__ import annotations

import duckdb

from opentelemetry_iceberg_exporter_spark.operators.text import (
    duck_tfidf_sql,
    tfidf_top_terms,
)
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table


def test_matches_duckdb_on_testdata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s = {
        (r["doc_id"], r["rk"]): (r["term"], r["tf"], r["term_df"], r["idf_log"])
        for r in tfidf_top_terms(docs, "doc_id", "text", top_k=5).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    d = {
        (doc_id, rk): (term, tf, term_df, idf_log)
        for doc_id, rk, term, tf, term_df, idf_log in con.sql(
            duck_tfidf_sql(top_k=5)
        ).fetchall()
    }
    assert s == d


def test_ranking_semantics(spark):
    """'rare' appears only in doc 1 (df=1), 'common' in all three (df=3):
    rare must outrank common for doc 1 even at equal tf."""
    df = spark.createDataFrame(
        [
            (1, "common rare common"),
            (2, "common filler words"),
            (3, "common other stuff"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, "doc_id", "text", top_k=2).collect()
    doc1 = sorted((r["rk"], r["term"]) for r in out if r["doc_id"] == 1)
    # doc1: common tf=2 df=3 -> score 2; rare tf=1 df=1 -> score 3
    assert doc1 == [(1, "rare"), (2, "common")]


def test_min_df_filters_hapaxes(spark):
    df = spark.createDataFrame(
        [(1, "shared unique1"), (2, "shared unique2")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, "doc_id", "text", top_k=5, min_df=2).collect()
    assert {r["term"] for r in out} == {"shared"}
