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
    rounds: int = 0  # driver round-trips training took (<= len(merges))

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


def _select_disjoint_batch(
    rows: list, limit: int, min_freq: int, exhaustive: bool
) -> list:
    """The maximal PROVABLY-SEQUENTIAL-EQUIVALENT batch from one round's
    ranked pair counts: a prefix of the (cnt desc, a, b) order whose
    pairs share no symbol, truncated at the first overlapping pair, with
    every selection after the first required to count STRICTLY above the
    truncation bound.

    Why this is exactly the sequential merge list: a merge (a, b) only
    changes counts of pairs touching a or b — existing such pairs can
    only lose occurrences, and every NEW pair it creates ((x, ab),
    (ab, y), cross-merge adjacencies) inherits each occurrence from some
    old pair touching a or b, so its count is bounded by the largest old
    count among overlapping pairs. Selected pairs rank above every
    overlapping pair (the scan stops at the first one), so at each
    simulated sequential round the chosen pair still outranks all
    decreased pairs (comparator order is preserved on ties) and, by the
    strict bound, all newly-created pairs (whose tie-break order would
    be unknowable). `exhaustive`=False means the ranked list was
    truncated at collection: unseen pairs may count up to the last
    collected row, so that cutoff joins the bound.

    "Shares no symbol" includes COMPOSITION through the merged symbol:
    symbols are concatenation-named, so a selected merge can create
    occurrences of a DIFFERENT candidate that mentions the selected
    pair's concatenation as one of its symbols (select ('a','bc') and a
    coexisting ('abc','d') grows mid-batch — 'abc' collides), or a
    candidate's own concatenation can match a symbol an earlier
    selection operates on. Any candidate touching a selected
    concatenation — or whose concatenation matches a used or produced
    symbol — is treated as overlapping and becomes the truncation
    bound."""
    first = rows[0]
    sel = [first]
    used = {first["a"], first["b"]}
    made = {first["a"] + first["b"]}  # symbols the batch's merges create
    bound = None if exhaustive else rows[-1]["cnt"]
    selecting = True
    for r in rows[1:]:
        composed = r["a"] + r["b"]
        if (
            r["a"] in used
            or r["b"] in used
            or r["a"] in made
            or r["b"] in made
            or composed in used
            or composed in made
        ):
            # desc order: the first overlap is the largest competitor.
            # This scan must NOT stop at the selection limit — a tied
            # overlapping pair below the limit still bounds the counts
            # newly-created pairs can reach, and ignoring it would let
            # an equal-count selection beat a new pair the sequential
            # algorithm prefers on tie-break.
            bound = r["cnt"] if bound is None else max(bound, r["cnt"])
            break
        if selecting and (len(sel) >= limit or r["cnt"] < min_freq):
            selecting = False  # keep scanning for the bound only
        if selecting:
            sel.append(r)
            used.add(r["a"])
            used.add(r["b"])
            made.add(composed)
    if bound is not None:
        sel = [sel[0]] + [r for r in sel[1:] if r["cnt"] > bound]
    return [(r["a"], r["b"]) for r in sel]


def train_bpe(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_freq: int = 2,
    max_batch: int = 8,
) -> BpeModel:
    """Learn up to `num_merges` merges; stops early when the best pair's
    weighted frequency drops below `min_freq`.

    Driver rounds are BATCHED: each round collects the top-K pair counts
    once and applies every merge in the maximal disjoint prefix (see
    _select_disjoint_batch — provably the same merge list the
    one-merge-per-round algorithm produces), so a 32k-vocab training is
    ~max_batch× fewer sequential Spark jobs. The batch's merges chain
    map-side in ONE projection with ONE lineage checkpoint."""
    state = (
        _word_freqs(df, text_col)
        .select(_initial_symbols().alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: list = []
    rounds = 0
    while len(merges) < num_merges:
        remaining = num_merges - len(merges)
        batch_limit = min(max_batch, remaining)
        k = max(32, 4 * batch_limit)
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
        ).limit(k).collect()
        rounds += 1
        if not top or top[0]["cnt"] < min_freq:
            break
        batch = _select_disjoint_batch(
            top, batch_limit, min_freq, exhaustive=len(top) < k
        )
        merges.extend(batch)
        col = F.col("syms")
        for a, b in batch:
            col = _apply_merge(col, a, b)
        state = state.select(col.alias("syms"), "freq").localCheckpoint()
    vocab = sorted(
        r["s"] for r in state.select(F.explode("syms").alias("s")).distinct().collect()
    )
    return BpeModel(merges=merges, vocab=vocab, rounds=rounds)


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
