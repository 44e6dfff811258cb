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


def test_simhash_sql_parity(spark, sf_dir):
    """simhash_sql (one parsed string, built in ms) must equal
    simhash_col (the ~320-node Column-API reference, ~1.1s of driver
    time per plan build) on the real documents table and edge docs."""
    from opentelemetry_iceberg_exporter_spark.functions import md5_hash64, tokens
    from opentelemetry_iceberg_exporter_spark.operators.dedup import (
        simhash_col,
        simhash_sql,
    )

    def both(docs):
        th = F.transform(tokens(F.col("text")), md5_hash64)
        base = docs.select(
            "doc_id", th.alias("__th"), F.size(th).alias("__n")
        )
        ref = base.select(
            "doc_id", simhash_col(F.col("__th"), F.col("__n")).alias("s")
        )
        sql = base.select(
            "doc_id", F.expr(simhash_sql("__th", "__n")).alias("s")
        )
        a = {r["doc_id"]: r["s"] for r in ref.collect()}
        b = {r["doc_id"]: r["s"] for r in sql.collect()}
        return a, b

    a, b = both(_docs(spark, sf_dir))
    assert a == b and len(a) > 0

    edge = spark.createDataFrame(
        [
            (1, ""),
            (2, "one"),
            (3, "dup dup dup dup"),
            (4, "  padded   whitespace \t tokens here  "),
            (5, "a b c d e f g h i j k l m n o p"),
        ],
        "doc_id long, text string",
    )
    a, b = both(edge)
    assert a == b and len(a) == 5
