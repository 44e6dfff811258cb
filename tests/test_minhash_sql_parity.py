"""The minhash query path builds its expressions as SQL TEXT (plan
construction without per-node py4j round trips — the same fix as the
OTLP flatten's *_sql encoders). These tests pin the SQL twins exactly
equal to the Column-API reference builders on the real documents
table, so the fast path can never drift from the specified math."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.dedup import (
    _shingle_hashes,
    minhash_sig_cols,
    minhash_sig_sql,
    shingle_hashes_sql,
)


def _docs(spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_shingle_hashes_sql_matches_column_api(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ref = docs.select(
        "doc_id", F.sort_array(_shingle_hashes(F.col("text"))).alias("hs")
    )
    sql = docs.select(
        "doc_id",
        F.sort_array(F.expr(shingle_hashes_sql("`text`"))).alias("hs"),
    )
    a = {r["doc_id"]: r["hs"] for r in ref.collect()}
    b = {r["doc_id"]: r["hs"] for r in sql.collect()}
    assert a == b and len(a) == docs.count()


def test_sig_sql_matches_column_api(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    base = docs.select("doc_id", _shingle_hashes(F.col("text")).alias("__hs"))
    ref = base.select("doc_id", *minhash_sig_cols(F.col("__hs")))
    sql = base.select("doc_id", *[F.expr(s) for s in minhash_sig_sql()])
    assert ref.columns == sql.columns
    a = {r["doc_id"]: tuple(r[c] for c in ref.columns[1:]) for r in ref.collect()}
    b = {r["doc_id"]: tuple(r[c] for c in sql.columns[1:]) for r in sql.collect()}
    assert a == b


def test_edge_docs(spark):
    rows = [
        (1, ""),                      # empty -> empty shingles, NULL sigs
        (2, "one two"),               # < 3 tokens
        (3, "a b c"),                 # exactly one shingle
        (4, "  padded   whitespace \t tokens here  "),
        (5, "dup dup dup dup"),       # repeated shingles collapse
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = docs.select(
        "doc_id", F.sort_array(_shingle_hashes(F.col("text"))).alias("hs")
    ).collect()
    sql = docs.select(
        "doc_id",
        F.sort_array(F.expr(shingle_hashes_sql("`text`"))).alias("hs"),
    ).collect()
    assert {r["doc_id"]: r["hs"] for r in ref} == {r["doc_id"]: r["hs"] for r in sql}


def test_ngrams_sql_matches_column_api(spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.functions import ngrams, tokens
    from opentelemetry_iceberg_exporter_spark.functions.textfns import (
        ngrams_sql,
        tokens_sql,
    )

    docs = _docs(spark, sf_dir)
    for n in (2, 3, 5):
        ref = docs.select(
            "doc_id", ngrams(tokens(F.col("text")), n).alias("g")
        )
        sql = docs.select(
            "doc_id", F.expr(ngrams_sql(tokens_sql("`text`"), n)).alias("g")
        )
        a = {r["doc_id"]: r["g"] for r in ref.collect()}
        b = {r["doc_id"]: r["g"] for r in sql.collect()}
        assert a == b
