"""Multi-probe LSH contracts.

The defining invariant of multi-probe (probe own bucket + all Hamming-1
buckets) is that its candidate set is a strict superset of single-probe's
— so for every query the k-th best cosine it finds is >= single-probe's,
and candidate volume grows but stays an equi-join (never O(N x Q)).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.similarity import (
    QUERY_STRIDE,
    ann_lsh,
)
from opentelemetry_iceberg_exporter_spark.plans.inspect import join_strategies
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)


def test_multiprobe_never_worse_per_rank(spark, emb, queries):
    single = {
        (r.q_id, r.rk): r.cos_sim
        for r in ann_lsh(emb, queries, "vec_id", "embedding").collect()
    }
    multi = {
        (r.q_id, r.rk): r.cos_sim
        for r in ann_lsh(
            emb, queries, "vec_id", "embedding", multiprobe=True
        ).collect()
    }
    assert single, "expected single-probe results"
    for key, sim in single.items():
        assert key in multi, f"multi-probe lost rank {key}"
        assert multi[key] >= sim, (key, multi[key], sim)


def test_multiprobe_expands_candidates(emb, queries):
    """Probing 1+N_PLANES buckets must surface strictly more candidate
    pairs pre-top-k (Hamming-1 buckets are non-empty on this corpus)."""

    def n_candidates(multiprobe: bool) -> int:
        return ann_lsh(
            emb, queries, "vec_id", "embedding", k=10**9, multiprobe=multiprobe
        ).count()

    assert n_candidates(True) > n_candidates(False)


def test_multiprobe_stays_equijoin(emb, queries):
    df = ann_lsh(emb, queries, "vec_id", "embedding", multiprobe=True)
    js = join_strategies(df)
    assert "CartesianProduct" not in js
    assert "BroadcastNestedLoopJoin" not in js
