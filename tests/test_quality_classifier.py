"""Trainable hashed-ngram quality classifier
(operators/quality_classifier.py): separability, convergence,
bit-exact partitioning invariance, model round-trip, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.quality_classifier import (
    DEFAULT_DIM,
    fit_linear_classifier,
    hashed_features,
    model_from_rows,
    model_to_rows,
    score_documents,
)

GOOD = [
    "the committee published a detailed report on regional water quality",
    "researchers measured seasonal variation in alpine snow accumulation",
    "the library catalog indexes manuscripts by author title and subject",
    "engineers documented the bridge inspection procedure step by step",
    "students analyzed historical census records for the port city",
    "the observatory recorded precise transit times for both moons",
]
JUNK = [
    "click here click here free free free winner winner",
    "buy now buy now limited offer offer offer act now now",
    "wow wow wow amazing deal deal deal click click subscribe",
    "free money free money click subscribe subscribe winner now",
    "offer offer winner click now free deal subscribe wow buy",
    "subscribe now winner free click deal wow offer buy now",
]


def _corpus(spark, repartition=None):
    rows = [(f"g{i}", t, 1) for i, t in enumerate(GOOD)] + [
        (f"j{i}", t, 0) for i, t in enumerate(JUNK)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    return df.repartition(repartition) if repartition else df


DIM = 1 << 12  # small dim keeps the test fast; collisions are fine


@pytest.fixture(scope="module")
def model(spark):
    return fit_linear_classifier(
        spark, _corpus(spark), "doc_id", "text", "label", dim=DIM, iters=12
    )


class TestTraining:
    def test_separates_training_corpus(self, spark, model):
        scored = score_documents(
            spark, _corpus(spark), model, "doc_id", "text"
        ).collect()
        by_id = {r["doc_id"]: r for r in scored}
        assert all(by_id[f"g{i}"]["quality_keep"] for i in range(len(GOOD)))
        assert all(not by_id[f"j{i}"]["quality_keep"] for i in range(len(JUNK)))
        # scores are honest probabilities
        assert all(0.0 < r["quality_score"] < 1.0 for r in scored)

    def test_loss_decreases(self, model):
        hist = model.loss_history
        assert len(hist) == 12
        assert hist[-1] < hist[0] / 2
        # monotone for full-batch GD at this lr on separable data
        assert all(b <= a + 1e-12 for a, b in zip(hist, hist[1:]))

    def test_generalizes_to_unseen_docs(self, spark, model):
        unseen = spark.createDataFrame(
            [
                ("u_good", "the report documented seasonal water records"),
                ("u_junk", "free winner click subscribe now offer deal"),
            ],
            ["doc_id", "text"],
        )
        s = {r["doc_id"]: r["quality_score"]
             for r in score_documents(spark, unseen, model, "doc_id", "text").collect()}
        assert s["u_good"] > s["u_junk"]

    @pytest.mark.slow
    def test_partitioning_invariance_bit_exact(self, spark):
        """Decimal accumulation makes training identical under any
        physical partitioning — the whole point of the _DEC casts."""
        m1 = fit_linear_classifier(
            spark, _corpus(spark, repartition=1), "doc_id", "text", "label",
            dim=DIM, iters=4,
        )
        m7 = fit_linear_classifier(
            spark, _corpus(spark, repartition=7), "doc_id", "text", "label",
            dim=DIM, iters=4,
        )
        assert m1.bias == m7.bias
        assert np.array_equal(m1.weights, m7.weights)
        assert m1.loss_history == m7.loss_history

    def test_empty_training_set_raises(self, spark):
        empty = spark.createDataFrame([], "doc_id string, text string, label int")
        with pytest.raises(ValueError, match="empty training set"):
            fit_linear_classifier(spark, empty, "doc_id", "text", "label", dim=DIM)


class TestFeaturesAndModel:
    def test_hashed_features_multiset_and_range(self, spark):
        df = spark.createDataFrame([("d", "a b a")], ["doc_id", "text"])
        rows = hashed_features(df, "doc_id", "text", dim=64).collect()
        # 3 unigrams (multiset: 'a' twice) + 2 bigrams
        assert len(rows) == 5
        assert all(0 <= r["bucket"] < 64 for r in rows)
        assert all(r["n_feats"] == 5 for r in rows)

    def test_model_roundtrip(self, spark, model):
        rebuilt = model_from_rows(model_to_rows(model), dim=DIM)
        assert rebuilt.bias == model.bias
        assert np.array_equal(rebuilt.weights, model.weights)
        df = _corpus(spark)
        a = score_documents(spark, df, model, "doc_id", "text").collect()
        b = score_documents(spark, df, rebuilt, "doc_id", "text").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_default_dim_sane(self):
        assert DEFAULT_DIM == 32768


class TestPlanShape:
    def test_scoring_broadcasts_the_weight_table(self, spark, model):
        plan = score_documents(
            spark, _corpus(spark), model, "doc_id", "text"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the corpus side must NOT shuffle for the join itself: the only
        # exchange is the per-doc re-aggregation
        assert plan.count("Exchange hashpartitioning") <= 1
