"""Winnowing rolling-hash fingerprints (operators/text.py): cross-engine
agreement with the DuckDB rendering on real testdata, the winnowing
coverage guarantee (shared substrings >= k+w-1 chars produce shared
fingerprints), and short-document edge cases."""

from __future__ import annotations

import duckdb

from opentelemetry_iceberg_exporter_spark.operators.text import (
    WINNOW_K,
    WINNOW_W,
    duck_winnowing_sql,
    winnowing_fingerprints,
)
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table


def test_matches_duckdb_on_testdata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s = {
        r["doc_id"]: (r["fingerprints"], r["n_grams"])
        for r in winnowing_fingerprints(docs, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    d = {
        doc_id: (fp, n)
        for doc_id, fp, n in con.sql(duck_winnowing_sql()).fetchall()
    }
    assert s == d


def test_shared_substring_guarantee(spark):
    """Any common substring of length >= k+w-1 must contribute at least
    one common fingerprint (the winnowing theorem); disjoint texts
    share nothing."""
    shared = "the quick brown fox jumps over the lazy dog"
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    df = spark.createDataFrame(
        [
            (1, f"AAAA {shared} BBBB"),
            (2, f"XXXX {shared} YYYY"),
            (3, "completely different content with zero overlap at all q"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnowing_fingerprints(df, "doc_id", "text").collect()
    }
    assert out[1] & out[2], "docs sharing a long substring must share fingerprints"
    # overlap similarity ranks the true near-pair first
    sim12 = len(out[1] & out[2]) / min(len(out[1]), len(out[2]))
    sim13 = len(out[1] & out[3]) / min(len(out[1]), len(out[3]))
    assert sim12 > sim13


def test_short_documents(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, "abcde"), (3, "abcdefg")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in winnowing_fingerprints(df, "doc_id", "text").collect()
    }
    assert out[1]["fingerprints"] == [] and out[1]["n_grams"] == 0  # < k chars
    # exactly k chars -> one gram, fewer grams than w -> all kept
    assert out[2]["n_grams"] == 1 and len(out[2]["fingerprints"]) == 1
    assert out[3]["n_grams"] == 3 and 1 <= len(out[3]["fingerprints"]) <= 3


def test_winnowing_pairs_find_substring_overlap(spark):
    from opentelemetry_iceberg_exporter_spark.operators.text import winnowing_pairs

    shared = "a long enough shared passage of duplicated text appears here"
    df = spark.createDataFrame(
        [
            (1, f"intro one {shared} outro one"),
            (2, f"intro two {shared} outro two"),
            (3, "nothing in common with the others whatsoever zz"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in winnowing_pairs(df, "doc_id", "text").collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_position_independence(spark):
    """Winnowed fingerprints of identical content are identical no matter
    where the content sits (fingerprints are hash VALUES, not offsets)."""
    body = "some reasonably long piece of duplicated text content"
    df = spark.createDataFrame(
        [(1, body), (2, "prefix " * 10 + body)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnowing_fingerprints(df, "doc_id", "text").collect()
    }
    assert out[1] <= out[2]  # every fingerprint of the bare body survives
