"""Bigram-LM perplexity scoring (operators/lm.py): hand-computed
probabilities, in-domain vs gibberish separation, bit-exact
partitioning invariance, empty-doc semantics, plan contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.lm import (
    BOS,
    score_perplexity,
    train_bigram_lm,
)

CORPUS = [
    ("c1", "the cat sat on the mat"),
    ("c2", "the dog sat on the rug"),
    ("c3", "the cat ate the fish"),
]


@pytest.fixture(scope="module")
def model(spark):
    return train_bigram_lm(
        spark, spark.createDataFrame(CORPUS, ["doc_id", "text"]), "text"
    )


class TestTraining:
    def test_counts_are_exact(self, model):
        c12 = {
            (r["w1"], r["w2"]): r["c12"] for r in model.bigrams.collect()
        }
        assert c12[(BOS, "the")] == 3
        assert c12[("the", "cat")] == 2
        assert c12[("sat", "on")] == 2
        assert c12[("ate", "the")] == 1
        c1 = {r["w1"]: r["c1"] for r in model.contexts.collect()}
        assert c1["the"] == 6  # 'the' appears 6 times as a context
        assert c1[BOS] == 3
        # vocab = distinct w2 = distinct tokens (BOS never a w2)
        assert model.vocab_size == 9

    def test_training_partition_invariant(self, spark):
        df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        a = train_bigram_lm(spark, df.repartition(1), "text")
        b = train_bigram_lm(spark, df.repartition(7), "text")
        assert sorted(map(tuple, a.bigrams.collect())) == sorted(
            map(tuple, b.bigrams.collect())
        )
        assert a.vocab_size == b.vocab_size


class TestScoring:
    def test_hand_computed_perplexity(self, spark, model):
        """Single-bigram doc 'the cat': p(the|<s>) = (3+0.5)/(3+0.5*9),
        p(cat|the) = (2+0.5)/(6+0.5*9)."""
        doc = spark.createDataFrame([("d", "the cat")], ["doc_id", "text"])
        r = score_perplexity(doc, model, "doc_id", "text").collect()[0]
        p1 = (3 + 0.5) / (3 + 0.5 * 9)
        p2 = (2 + 0.5) / (6 + 0.5 * 9)
        expected = math.exp(-(math.log(p1) + math.log(p2)) / 2)
        assert r["n_bigrams"] == 2
        assert abs(r["perplexity"] - expected) < 1e-9

    def test_in_domain_beats_gibberish(self, spark, model):
        docs = spark.createDataFrame(
            [
                ("good", "the cat sat on the mat"),
                ("gibberish", "zq xv bnm qqq wyx plk"),
            ],
            ["doc_id", "text"],
        )
        s = {r["doc_id"]: r["perplexity"]
             for r in score_perplexity(docs, model, "doc_id", "text").collect()}
        assert s["good"] * 2 < s["gibberish"]

    def test_empty_doc_null_metrics(self, spark, model):
        docs = spark.createDataFrame(
            [("e", ""), ("w", "   "), ("n", None)], ["doc_id", "text"]
        )
        rows = {r["doc_id"]: r
                for r in score_perplexity(docs, model, "doc_id", "text").collect()}
        for d in ("e", "w", "n"):
            assert rows[d]["n_bigrams"] == 0
            assert rows[d]["perplexity"] is None

    def test_scoring_partition_invariant_bit_exact(self, spark, model):
        docs = spark.createDataFrame(
            [(f"d{i}", CORPUS[i % 3][1] + " extra words here") for i in range(20)],
            ["doc_id", "text"],
        )
        a = score_perplexity(docs.repartition(1), model, "doc_id", "text").collect()
        b = score_perplexity(docs.repartition(9), model, "doc_id", "text").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_save_load_roundtrip(self, spark, model, tmp_path):
        from opentelemetry_iceberg_exporter_spark.operators.lm import BigramLM

        path = str(tmp_path / "lm")
        model.save(path)
        loaded = BigramLM.load(spark, path)
        assert loaded.vocab_size == model.vocab_size
        assert loaded.add_k == model.add_k
        doc = spark.createDataFrame([("d", "the cat sat")], ["doc_id", "text"])
        a = score_perplexity(doc, model, "doc_id", "text").collect()
        b = score_perplexity(doc, loaded, "doc_id", "text").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_model_tables_broadcast(self, spark, model):
        docs = spark.createDataFrame([("d", "the cat")], ["doc_id", "text"])
        plan = (
            score_perplexity(docs, model, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("BroadcastHashJoin") >= 2
        assert "CartesianProduct" not in plan
