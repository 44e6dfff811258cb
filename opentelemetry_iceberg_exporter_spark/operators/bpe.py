"""Byte-Pair-Encoding tokenizer: TRAINED as distributed Spark jobs over
the corpus, applied as an Arrow-batched encoder — the "train a
tokenizer on your own 100 TB corpus" piece of a pretraining pipeline
(Sennrich et al. 2016; the GPT-2 tokenizer is this algorithm over
bytes).

Distributed-training shape (the part that must scale):

* the corpus collapses to a WORD-FREQUENCY table first — one explode +
  hash aggregate; every later iteration runs over distinct words only,
  which is orders of magnitude smaller than the corpus and independent
  of corpus size once saturated;
* each merge iteration is ONE adjacent-pair explode weighted by word
  frequency + ONE hash aggregate; only the single best pair (one row)
  ever reaches the driver, chosen with a total order (count desc, then
  lexicographic) so training is deterministic under any partitioning;
* the chosen merge applies map-side via an array fold (replace-last
  semantics = greedy left-to-right, matching the reference algorithm);
  state is localCheckpoint'ed per iteration — the same
  lineage-truncation pattern as kmeans_fit / dedup_groups.

Encoding applies the learned merges SEQUENTIALLY in training order per
word (bit-identical to the training segmentation by construction)
inside one mapInPandas pass, memoized per distinct word per batch —
tokenization is the canonical python-edge workload, Arrow-batched.

Word boundary: tokens are whitespace words with an end-of-word marker
symbol appended, so merges never cross word boundaries and the marker
distinguishes "est</w>" from "est".

No reference counterpart (LLM-pipeline extension surface).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import tokens

EOW = "</w>"


@dataclass
class BpeModel:
    merges: list  # [(a, b)] in training order
    vocab: list  # final distinct symbols, sorted

    def merged(self, a: str, b: str) -> str:
        return a + b


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    toks = F.filter(tokens(F.col(text_col)), lambda x: x != "")
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols() -> F.Column:
    """word -> [c1, c2, ..., cn, EOW] (character symbols + marker)."""
    return F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))


def _apply_merge(syms: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a+b via a fold:
    if the accumulator's last element is `a` and the next symbol is
    `b`, replace the last element with the merged symbol, else append."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_freq: int = 2,
) -> BpeModel:
    """Learn up to `num_merges` merges; stops early when the best pair's
    weighted frequency drops below `min_freq`."""
    state = (
        _word_freqs(df, text_col)
        .select(_initial_symbols().alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: list = []
    for _ in range(num_merges):
        pairs = (
            state.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(1).collect()
        if not top or top[0]["cnt"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        state = state.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint()
    vocab = sorted(
        r["s"] for r in state.select(F.explode("syms").alias("s")).distinct().collect()
    )
    return BpeModel(merges=merges, vocab=vocab)


def encode_word(word: str, merges: list) -> list:
    """Sequential application of the merges in training order —
    bit-identical to the training segmentation by construction."""
    syms = list(word) + [EOW]
    for a, b in merges:
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, model: BpeModel
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) — one Arrow-batched
    mapInPandas pass, memoized per distinct word within each batch."""
    import pandas as pd

    merges = list(model.merges)

    def batches(it):
        for pdf in it:
            cache: dict = {}
            out_tokens = []
            for text in pdf[text_col]:
                toks: list = []
                for w in (text or "").split():
                    if w not in cache:
                        cache[w] = encode_word(w, merges)
                    toks.extend(cache[w])
                out_tokens.append(toks)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": out_tokens,
                    "n_bpe_tokens": [len(t) for t in out_tokens],
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.mapInPandas(
        batches,
        schema=(
            f"{id_col} {id_type}, bpe_tokens array<string>, n_bpe_tokens long"
        ),
    )
