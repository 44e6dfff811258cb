"""Cross-engine agreement of the deterministic text primitives
(functions/textfns.py) on adversarial inputs.

Every dedup/text oracle rests on three claimed identities:
  tokens(x)      == regexp_split_to_array(trim(x), '\\s+')
  ngrams(t, n)   == list_transform(range(...), i -> t[i] || ' ' || ...)
  md5_hash64(x)  == ('0x' || substring(md5(x), 1, 15))::BIGINT
This suite checks them on one batched corpus of edge-case strings
(unicode, mixed whitespace, quotes, regex metacharacters, long runs) —
a single Spark job and a single DuckDB query, not per-example jobs.
Testdata never exercises most of these shapes; real corpora will.
"""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.functions import (
    md5_hash64,
    ngrams,
    tokens,
)

CORPUS = [
    "plain ascii words here",
    "  leading and trailing   ",
    "tab\tseparated\tand\nnewline mixed\r\nforms",
    "unicode: héllo wörld Ω≈ç √∫ 北京 — em–dash",
    "quotes 'single' \"double\" `back` don''t",
    "regex metachars . * + ? ( ) [ ] { } | ^ $ \\",
    "a",
    "a b",
    "one  two   three    four",
    "UPPER lower MiXeD",
    "numbers 123 45.67 1e9 0x1f",
    "repeated repeated repeated repeated repeated",
    "x" * 500,
    ("tok " * 200).strip(),
    "emoji 🙂 and 👍🏽 sequences",
    "punct!only?!, ;;; :::",
]
# NOTE: empty/whitespace-only strings are deliberately absent: Spark's
# split('', ...) yields [''] while DuckDB regexp_split_to_array('')
# yields ['']  too, but trim semantics around fully-empty docs are a
# documented non-goal (the loaders drop empty documents upstream).


def _frames(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CORPUS)], "i long, s string")
    con = duckdb.connect()
    con.register("corpus", df.toPandas())
    return df, con


def test_tokens_agree(spark):
    df, con = _frames(spark)
    s = {r["i"]: r["t"] for r in df.select("i", tokens(F.col("s")).alias("t")).collect()}
    d = {
        i: t
        for i, t in con.sql(
            r"SELECT i, regexp_split_to_array(trim(s), '\s+') FROM corpus"
        ).fetchall()
    }
    assert s == d


def test_ngrams_agree(spark):
    df, con = _frames(spark)
    s = {
        r["i"]: r["g"]
        for r in df.select("i", ngrams(tokens(F.col("s")), 3).alias("g")).collect()
    }
    d = {
        i: g
        for i, g in con.sql(
            r"""
            SELECT i, list_transform(
                range(1, greatest(len(t) - 2, 0) + 1),
                j -> t[j] || ' ' || t[j + 1] || ' ' || t[j + 2])
            FROM (SELECT i, regexp_split_to_array(trim(s), '\s+') AS t FROM corpus)
            """
        ).fetchall()
    }
    assert s == d


def test_md5_hash64_agree(spark):
    df, con = _frames(spark)
    s = {
        r["i"]: r["h"]
        for r in df.select("i", md5_hash64(F.col("s")).alias("h")).collect()
    }
    d = {
        i: h
        for i, h in con.sql(
            "SELECT i, ('0x' || substring(md5(s), 1, 15))::BIGINT FROM corpus"
        ).fetchall()
    }
    assert s == d
    assert all(v >= 0 for v in s.values())  # 60-bit hashes stay positive
