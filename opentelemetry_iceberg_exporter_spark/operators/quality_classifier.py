"""Trainable quality classifier: fastText-style hashed bag-of-ngrams
logistic regression, trained AND applied as distributed Spark jobs.

The standard LLM-corpus quality gate (CCNet / LLaMA-style filtering)
is a linear classifier over hashed unigram+bigram features — cheap
enough to score every document of a 100 TB corpus, expressive enough to
separate reference-quality text from boilerplate/spam. This module
implements both halves without any ML library:

* features: whitespace unigrams + adjacent bigrams, hashed into ``dim``
  buckets with the repo's md5-derived 60-bit hash (deterministic,
  cross-engine) — one map-side explode, the multiset kept (fastText
  averages WITH repeats);
* training: full-batch logistic regression, the kmeans_fit execution
  shape — the MODEL lives on the driver (dim doubles; 256 KB at the
  2**15 default), each iteration broadcasts it into two distributed
  passes (forward margins per doc, error-weighted gradient per bucket)
  and only a dim-row gradient returns to the driver. Corpus size never
  touches driver memory; iteration cost is two equi-join + aggregate
  jobs over the checkpointed feature explode.
* inference: one broadcast join of the weight table against the feature
  explode + one aggregate back to docs.

Determinism: every floating-point reduction (margins, gradients, loss)
accumulates in DECIMAL(38,18) — per-row contributions are doubles
(deterministic given the row), and decimal addition is exact and
associative, so training is BIT-IDENTICAL under any partitioning or
execution order (pinned by test_quality_classifier.py). There is no
DuckDB oracle entry: the sigmoid/log calls make cross-engine hashes
ulp-fragile (same reason tfidf_top_terms keeps transcendentals out of
its ORDER BY), so the operator is pinned by pytest instead —
train-accuracy on separable corpora, monotone loss, partitioning
invariance, and plan contracts.

No reference counterpart (LLM-pipeline extension surface).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import md5_hash64, ngrams, tokens

DEFAULT_DIM = 1 << 15

# exact decimal accumulator for per-row double contributions
_DEC = "decimal(38,18)"


def hashed_features(
    df: DataFrame, id_col: str, text_col: str, dim: int = DEFAULT_DIM
) -> DataFrame:
    """(id, bucket, n_feats): one row per feature OCCURRENCE (unigrams +
    adjacent bigrams, multiset semantics), with the doc's total feature
    count on every row — the exploded form both training passes and
    inference consume. Map-side only; no shuffle."""
    toks = tokens(F.col(text_col))
    feats = F.concat(toks, ngrams(toks, 2))
    exploded = df.select(
        F.col(id_col),
        F.size(feats).alias("n_feats"),
        F.explode(feats).alias("feat"),
    )
    return exploded.select(
        id_col,
        (md5_hash64(F.col("feat")) % F.lit(dim)).cast("int").alias("bucket"),
        "n_feats",
    )


@dataclass
class LinearModel:
    """Driver-held model state: ``weights[bucket]`` + bias."""

    weights: np.ndarray  # float64, shape (dim,)
    bias: float
    dim: int
    loss_history: list = field(default_factory=list)

    def weights_df(self, spark: SparkSession) -> DataFrame:
        """The non-zero weights as a (bucket, weight) table — the
        broadcastable form the distributed passes join against."""
        nz = np.flatnonzero(self.weights)
        rows = [(int(b), float(self.weights[b])) for b in nz]
        return spark.createDataFrame(rows or [(0, 0.0)], "bucket int, weight double")


def _forward(
    feats: DataFrame, id_col: str, weights_df: DataFrame, bias: float
) -> DataFrame:
    """(id, p): sigmoid of the mean feature weight + bias, decimal-exact
    accumulation. Docs whose features all hash to zero-weight buckets
    still score (left join -> weight 0)."""
    joined = feats.join(F.broadcast(weights_df), "bucket", "left").select(
        id_col,
        "n_feats",
        F.coalesce("weight", F.lit(0.0)).cast(_DEC).alias("w"),
    )
    margins = joined.groupBy(id_col).agg(
        (
            (F.sum("w") / F.max("n_feats")).cast("double") + F.lit(float(bias))
        ).alias("margin")
    )
    return margins.select(
        id_col, (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("p")
    )


def fit_linear_classifier(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    dim: int = DEFAULT_DIM,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
) -> LinearModel:
    """Full-batch AdaGrad on the logistic loss. ``label_col`` is 0/1
    (1 = keep-quality). Plain gradient descent is badly conditioned
    here — high-df buckets ('the') see gradients orders of magnitude
    larger than rare ones — so each coordinate is scaled by the root of
    its accumulated squared gradient (driver-side numpy; still fully
    deterministic). Returns the trained driver-side model;
    per-iteration loss (decimal-exact mean log-loss) is recorded in
    ``loss_history`` so convergence is observable."""
    feats = hashed_features(df, id_col, text_col, dim).localCheckpoint()
    labels = df.select(id_col, F.col(label_col).cast("double").alias("y"))
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("empty training set")

    w = np.zeros(dim, dtype=np.float64)
    bias = 0.0
    g2 = np.zeros(dim, dtype=np.float64)  # AdaGrad accumulators
    g2_bias = 0.0
    eps = 1e-8
    model = LinearModel(weights=w, bias=bias, dim=dim)
    for _ in range(iters):
        probs = _forward(feats, id_col, model.weights_df(spark), bias)
        err = (
            probs.join(labels, id_col)
            .select(
                id_col,
                (F.col("p") - F.col("y")).alias("err"),
                # clamped decimal-exact log-loss contribution
                (
                    -(
                        F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                        + (1 - F.col("y"))
                        * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                    )
                ).cast(_DEC).alias("ll"),
            )
            .localCheckpoint()
        )
        # per-bucket gradient: sum over docs of err * (occurrences/n)
        grad_rows = (
            feats.join(err.select(id_col, "err"), id_col)
            .select(
                "bucket",
                (F.col("err") / F.col("n_feats")).cast(_DEC).alias("g"),
            )
            .groupBy("bucket")
            .agg(F.sum("g").cast("double").alias("g"))
            .collect()
        )
        agg = err.agg(
            F.sum(F.col("err").cast(_DEC)).cast("double").alias("se"),
            F.sum("ll").cast("double").alias("sll"),
        ).collect()[0]
        grad = np.zeros(dim, dtype=np.float64)
        for r in grad_rows:
            grad[r["bucket"]] = r["g"]
        grad = grad / n_docs + l2 * w
        g2 += grad * grad
        w = w - lr * grad / np.sqrt(g2 + eps)
        gb = float(agg["se"]) / n_docs
        g2_bias += gb * gb
        bias -= lr * gb / math.sqrt(g2_bias + eps)
        model = LinearModel(
            weights=w, bias=bias, dim=dim, loss_history=model.loss_history
        )
        model.loss_history.append(float(agg["sll"]) / n_docs)
    return model


def score_documents(
    spark: SparkSession,
    df: DataFrame,
    model: LinearModel,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """(id, quality_score, quality_keep): the corpus-scale scoring pass —
    map-side feature explode, ONE broadcast join against the weight
    table, one aggregate back to documents. At 100 TB this is the only
    shape that works: the model broadcasts (dim doubles), the corpus
    never shuffles except the per-doc re-aggregation."""
    probs = _forward(
        hashed_features(df, id_col, text_col, model.dim),
        id_col,
        model.weights_df(spark),
        model.bias,
    )
    return probs.select(
        id_col,
        F.col("p").alias("quality_score"),
        (F.col("p") >= F.lit(float(threshold))).alias("quality_keep"),
    )


def model_to_rows(model: LinearModel) -> list[tuple[int, float]]:
    """Serializable form: non-zero (bucket, weight) pairs + the bias
    under bucket -1 — write it to a table, reload with model_from_rows."""
    nz = np.flatnonzero(model.weights)
    return [(-1, float(model.bias))] + [
        (int(b), float(model.weights[b])) for b in nz
    ]


def model_from_rows(rows, dim: int = DEFAULT_DIM) -> LinearModel:
    w = np.zeros(dim, dtype=np.float64)
    bias = 0.0
    for b, v in rows:
        if b == -1:
            bias = v
        else:
            w[int(b)] = v
    return LinearModel(weights=w, bias=bias, dim=dim)


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
