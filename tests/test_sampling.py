"""Sampling/split operator contracts (operators/sampling.py):
determinism across calls, weight adherence, exact stratified counts,
incremental-ingestion stability (new rows never move old assignments),
and cross-engine agreement of the bucket hash with DuckDB."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.sampling import (
    SPLIT_MOD,
    duck_split_bucket,
    hash_fraction_sample,
    hash_split,
    split_bucket,
    stratified_sample,
)


@pytest.fixture()
def docs(spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_split_deterministic_and_total(spark, docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    assert a == b
    assert len(a) == docs.count()
    assert set(a.values()) <= {"train", "val", "test"}


def test_split_weights_roughly_hold(spark, docs):
    out = hash_split(docs, "doc_id").groupBy("split").count().collect()
    n = docs.count()
    frac = {r["split"]: r["count"] / n for r in out}
    assert 0.7 <= frac.get("train", 0) <= 0.9
    assert 0.03 <= frac.get("val", 0) <= 0.2
    assert 0.03 <= frac.get("test", 0) <= 0.2


def test_incremental_stability(spark, docs):
    """Assignments are a pure function of the id: adding rows later (or
    splitting on a subset) cannot move existing rows between splits —
    the no-test-set-contamination property."""
    subset = docs.filter(F.col("doc_id") % 2 == 0)
    full = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    part = {r["doc_id"]: r["split"] for r in hash_split(subset, "doc_id").collect()}
    assert all(full[k] == v for k, v in part.items())


def test_salt_changes_assignment(spark, docs):
    plain = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    salted = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", salt="v2").collect()
    }
    assert plain != salted  # some rows must move under a different salt


def test_bucket_matches_duckdb(spark, docs, sf_dir):
    s = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", split_bucket("doc_id").alias("b")
        ).collect()
    }
    d = dict(
        duckdb.sql(
            f"SELECT doc_id, {duck_split_bucket('doc_id')} AS b"
            f" FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    assert s == d


def test_hash_fraction_sample_subset_and_deterministic(spark, docs):
    s1 = {r["doc_id"] for r in hash_fraction_sample(docs, "doc_id", 0.2).collect()}
    s2 = {r["doc_id"] for r in hash_fraction_sample(docs, "doc_id", 0.2).collect()}
    assert s1 == s2
    n = docs.count()
    assert 0.1 * n <= len(s1) <= 0.3 * n
    bigger = {r["doc_id"] for r in hash_fraction_sample(docs, "doc_id", 0.5).collect()}
    assert s1 <= bigger  # threshold sampling is monotone in the fraction


def test_stratified_exact_counts(spark):
    rows = [(i, "a" if i <= 100 else "b") for i in range(1, 161)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    out = stratified_sample(df, ["stratum"], 0.25, "id")
    got = {r["stratum"]: r["count"] for r in out.groupBy("stratum").count().collect()}
    assert got == {"a": 25, "b": 15}  # ceil(100*.25), ceil(60*.25)
    # deterministic membership
    again = stratified_sample(df, ["stratum"], 0.25, "id")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
