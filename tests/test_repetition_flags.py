"""Gopher-style repetition signals: hand-computed fractions on crafted
docs, edge cases (too-short, empty), and cross-engine equality against
the DuckDB mirror on synthetic + real testdata documents."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from opentelemetry_iceberg_exporter_spark.operators.text import (
    duck_repetition_flags_sql,
    repetition_flags,
)
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

DOCS = [
    ("d1", "a b a b a b"),                      # heavy 2-gram loop
    ("d2", "one two three four five six seven"),  # no repetition
    ("d3", "x y z w v x y z w v x y z w v"),    # repeated 5-gram block
    ("d4", "hi"),                               # too short for any n
    ("d5", ""),                                 # empty
    ("d6", "spam spam spam spam spam spam spam spam"),
]


@pytest.fixture(scope="module")
def flags(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    return {r.doc_id: r for r in repetition_flags(df, "doc_id", "text").collect()}


class TestHandComputed:
    def test_top_2gram_loop(self, flags):
        # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> top "a b"
        # count 3, chars 3*3=9; token stream chars = 11
        assert flags["d1"].top_2gram_char_frac == round(9 / 11, 6)

    def test_no_repetition_dup_is_zero(self, flags):
        assert flags["d2"].dup_5gram_char_frac == 0.0
        # unique 2-grams: top count 1 -> frac = len(one 2-gram)/total
        assert 0 < flags["d2"].top_2gram_char_frac < 0.5

    def test_repeated_block_dup_5gram(self, flags):
        # "x y z w v" *3: the 5-gram "x y z w v" occurs 3 times (plus
        # rotations occurring twice) -> heavy dup mass, capped at 1
        assert flags["d3"].dup_5gram_char_frac > 0.5
        assert flags["d3"].dup_5gram_char_frac <= 1.0

    def test_short_and_empty_are_zero(self, flags):
        for d in ("d4", "d5"):
            r = flags[d]
            assert r.top_2gram_char_frac == 0.0
            assert r.dup_8gram_char_frac == 0.0

    def test_single_token_loop(self, flags):
        # "spam" x8 -> the top 2-gram "spam spam" covers everything
        assert flags["d6"].top_2gram_char_frac > 0.5
        assert flags["d6"].dup_5gram_char_frac == 1.0  # capped


class TestCrossEngine:
    def _compare(self, spark_rows, pdf):
        con = duckdb.connect()
        con.register("documents", pdf)
        want = con.execute(duck_repetition_flags_sql()).fetchall()
        cols = [d[0] for d in con.description]
        assert len(want) == len(spark_rows)
        for row in want:
            w = dict(zip(cols, row))
            g = spark_rows[w["doc_id"]]
            for c in cols:
                if c == "doc_id":
                    continue
                assert getattr(g, c) == pytest.approx(w[c], abs=1e-9), (w["doc_id"], c)

    def test_synthetic(self, spark, flags):
        import pandas as pd

        self._compare(flags, pd.DataFrame(DOCS, columns=["doc_id", "text"]))

    def test_testdata_documents(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        got = {
            r.doc_id: r for r in repetition_flags(docs, "doc_id", "text").collect()
        }
        self._compare(got, docs.toPandas())
