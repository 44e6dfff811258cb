"""N-gram language-model perplexity scoring — the CCNet-style quality
signal: documents whose text is improbable under a reference corpus LM
(gibberish, boilerplate soup, wrong-language) score high perplexity and
get filtered.

Both halves are distributed Spark jobs with the engine's determinism
rules:

* training (`train_bigram_lm`): two hash aggregates over the exploded
  token stream (bigram counts, unigram context counts) + the vocab
  size — model state is two DataFrames whose values are exact int64
  counts, so training is trivially partition-invariant. At 100 TB the
  model is O(distinct bigrams), orders of magnitude smaller than the
  corpus, and both aggregates get map-side partial combining for free.
* scoring (`score_perplexity`): explode the document's bigrams, ONE
  broadcast (or shuffle, if the model outgrows broadcast) join against
  the bigram table + one against the context table, then a per-doc
  aggregate. Add-k smoothing handles unseen bigrams/contexts:
  p(w2|w1) = (c12 + k) / (c1 + k*V). The per-row log is computed from
  exact integer counts (deterministic given the row); the per-doc mean
  accumulates the doubles in DECIMAL(38,18), so scores are BIT-IDENTICAL
  under any partitioning — same policy as the quality classifier.

No DuckDB oracle by design: ln() is ulp-fragile across engines (the
same reason tfidf keeps transcendentals out of its ORDER BY); pinned by
pytest instead (hand-computed perplexities, invariance, plan contract).

No reference counterpart (LLM-pipeline extension surface).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import tokens

_DEC = "decimal(38,18)"

BOS = "<s>"  # sentence/document start context


@dataclass
class BigramLM:
    """Model state: exact counts, never probabilities (probabilities
    are derived at scoring time so smoothing stays a parameter)."""

    bigrams: DataFrame  # (w1, w2, c12)
    contexts: DataFrame  # (w1, c1)
    vocab_size: int
    add_k: float = 0.5

    def save(self, path: str) -> None:
        """Persist as parquet count tables + a meta JSON — train once on
        the reference corpus, score any number of batches later."""
        import json
        import os

        self.bigrams.write.mode("overwrite").parquet(os.path.join(path, "bigrams"))
        self.contexts.write.mode("overwrite").parquet(os.path.join(path, "contexts"))
        with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
            json.dump({"vocab_size": self.vocab_size, "add_k": self.add_k}, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BigramLM":
        import json
        import os

        with open(os.path.join(path, "meta.json"), encoding="utf-8") as f:
            meta = json.load(f)
        return cls(
            bigrams=spark.read.parquet(os.path.join(path, "bigrams")),
            contexts=spark.read.parquet(os.path.join(path, "contexts")),
            vocab_size=int(meta["vocab_size"]),
            add_k=float(meta["add_k"]),
        )


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair, with a BOS context
    before the first token — every document contributes exactly
    `n_tokens` bigrams, so empty docs contribute none."""
    toks = F.filter(tokens(F.col(text_col)), lambda x: x != "")
    with_bos = F.concat(F.array(F.lit(BOS)), toks)
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.slice(with_bos, 1, F.size(with_bos) - 1),
                    toks,
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select(id_col, "bg.w1", "bg.w2")
    )


def train_bigram_lm(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    add_k: float = 0.5,
) -> BigramLM:
    """Training needs only the text column; any id/metadata columns in
    `df` are ignored."""
    bigrams = _doc_bigrams(
        df.select(F.lit(0).alias("__id"), F.col(text_col)), "__id", text_col
    )
    c12 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12")).localCheckpoint()
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1")).localCheckpoint()
    vocab = c12.select("w2").distinct().count()
    return BigramLM(
        bigrams=c12, contexts=c1, vocab_size=int(vocab), add_k=float(add_k)
    )


def score_perplexity(
    docs: DataFrame, model: BigramLM, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_bigrams, avg_neg_logprob, perplexity); documents with no
    tokens get NULL scores. perplexity = exp(mean -ln p)."""
    k = float(model.add_k)
    v = int(model.vocab_size)
    bg = _doc_bigrams(docs, id_col, text_col)
    joined = (
        bg.join(F.broadcast(model.bigrams), ["w1", "w2"], "left")
        .join(F.broadcast(model.contexts), ["w1"], "left")
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce("c12", F.lit(0)) + F.lit(k))
                    / (F.coalesce("c1", F.lit(0)) + F.lit(k * v))
                )
            ).cast(_DEC).alias("nll"),
        )
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (F.sum("nll") / F.count("*")).cast("double").alias("avg_neg_logprob"),
    )
    scored = per_doc.select(
        id_col,
        "n_bigrams",
        "avg_neg_logprob",
        F.exp("avg_neg_logprob").alias("perplexity"),
    )
    # empty docs: no bigrams -> NULL metrics, kept for completeness
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_neg_logprob",
            "perplexity",
        )
    )
