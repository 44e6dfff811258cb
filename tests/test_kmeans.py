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


# cluster bases: separated in BOTH L2 (for k-means) and angle (for the
# cosine-based ivf_assign) — constant all-positive vectors at different
# magnitudes would be L2-far but angularly identical. No zero vectors:
# norm 0 makes the cosine divide by zero under ANSI mode (real corpora
# filter empty documents upstream for the same reason).
BASES = [
    [10.0, 10.0, 0.0, 0.0],
    [0.0, 0.0, 10.0, 10.0],
    [-10.0, -10.0, 0.0, 0.0],
]


def _synthetic(spark):
    """Three clusters of 5 points each around the BASES anchors, with a
    small dim-0 perturbation; k-means must recover them exactly."""
    rows = []
    vid = 0
    for base in BASES:
        for j in range(5):
            vec = list(base)
            vec[0] += 0.1 * j
            rows.append((vid, vec))
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
    # centroid of each recovered cell equals the cluster mean
    # (base + 0.2 on dim 0, base elsewhere)
    for base, g in zip(BASES, groups):
        cell = next(iter(g))
        expected = [base[0] + 0.2] + base[1:]
        for got, want in zip(cents[cell], expected):
            assert got == pytest.approx(want, abs=1e-9)


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


def test_assignments_consistent_with_final_centroids_at_max_iter(spark, sf_dir):
    """When max_iter exhausts before convergence, the returned
    assignments must be computed against the RETURNED centroids (not one
    update step behind) — otherwise ivf_assign cells diverge from the
    centroid table."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    cents, assign = kmeans_fit(emb, "vec_id", "embedding", k=10, max_iter=1)
    cells = {r["vec_id"]: r["cell"] for r in assign.collect()}
    c = np.array(cents)
    for r in emb.collect():
        v = np.array([float(x) for x in r["embedding"]])
        d = ((c - v) ** 2).sum(axis=1)
        best = int(np.flatnonzero(d == d.min())[0])  # tie -> lower cell
        assert cells[r["vec_id"]] == best, r["vec_id"]


def test_trained_centroids_feed_ivf(spark):
    df = _synthetic(spark)
    cents, _ = kmeans_fit(df, "vec_id", "embedding", k=3, max_iter=10)
    cdf = centroids_df(spark, cents)
    assert {r["cell"] for r in cdf.collect()} == {0, 1, 2}
    assert set(cdf.columns) == {"cell", "c", "c_norm"}


def test_trained_ivf_search_end_to_end(spark):
    """A trained index must answer ANN queries correctly: with perfectly
    separated clusters, nprobe=1 search over trained cells returns
    neighbors exclusively from the query's own cluster."""
    from pyspark.sql import functions as F

    from opentelemetry_iceberg_exporter_spark.operators.similarity import (
        _spark_dot,
        ivf_assign,
    )

    df = _synthetic(spark)
    cents, _ = kmeans_fit(df, "vec_id", "embedding", k=3, max_iter=10)
    cdf = centroids_df(spark, cents)

    def prep(d, idc):
        return d.select(
            F.col("vec_id").alias(idc),
            F.col("embedding").alias("v"),
            F.sqrt(_spark_dot("embedding", "embedding")).alias("v_norm"),
        )

    corpus = ivf_assign(prep(df, "vec_id"), cdf, "vec_id", nprobe=1)
    queries = ivf_assign(prep(df.filter("vec_id IN (0, 5, 10)"), "q_id"),
                         cdf, "q_id", nprobe=1).select(
        "q_id", F.col("v").alias("q"), "cell"
    )
    hits = corpus.join(queries, "cell").filter(F.col("vec_id") != F.col("q_id"))
    got = {(r["q_id"], r["vec_id"]) for r in hits.collect()}
    # query 0 (cluster 0-4) must see exactly its 4 cluster-mates, etc.
    expect = {
        (q, v)
        for q, lo in [(0, 0), (5, 5), (10, 10)]
        for v in range(lo, lo + 5)
        if v != q
    }
    assert got == expect


def test_nonzero_vectors_precleaner(spark):
    from opentelemetry_iceberg_exporter_spark.operators.similarity import (
        nonzero_vectors,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, None), (4, [0.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    kept = {r["vec_id"] for r in nonzero_vectors(df, "embedding").collect()}
    assert kept == {1, 4}


def test_null_embeddings_null_propagate(spark):
    """Advisor finding (r11): null embeddings are normal in real
    corpora — the vectorized nearest-centroid kernel must
    null-propagate them to a null cell (the behavior of the plan-level
    expression it replaced), not TypeError in np.stack, and a null
    vector must never seed an initial centroid."""
    df = _synthetic(spark)
    nulls = spark.createDataFrame(
        [(1000, None), (1001, None)], "vec_id long, embedding array<double>"
    )
    cents, assign = kmeans_fit(
        df.unionByName(nulls), "vec_id", "embedding", k=3, max_iter=5
    )
    cells = {r["vec_id"]: r["cell"] for r in assign.collect()}
    assert cells[1000] is None and cells[1001] is None
    assert all(
        cells[v] is not None for v in range(15)
    ), "non-null rows still assign"
    assert all(all(x is not None for x in c) for c in cents)
