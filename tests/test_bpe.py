"""Distributed BPE training (operators/bpe.py), cross-checked against
an INDEPENDENT in-test reference implementation of the published
algorithm (Sennrich et al. 2016, adjacent-pair counting over a word
frequency table, greedy left-to-right merge application) sharing
nothing with the operator."""

from __future__ import annotations

from collections import Counter

import pytest

from opentelemetry_iceberg_exporter_spark.operators.bpe import (
    EOW,
    bpe_encode,
    encode_word,
    train_bpe,
)

CORPUS = [
    ("d1", "low low low low low"),
    ("d2", "lower lower newest newest"),
    ("d3", "newest newest newest newest widest"),
    ("d4", "widest widest low lower"),
]


# ---------------------------------------------------------- reference
def ref_train(texts, num_merges, min_freq=2):
    """The paper's algorithm, straight from its pseudocode."""
    freqs = Counter()
    for t in texts:
        for w in t.split():
            freqs[tuple(list(w) + [EOW])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, f in freqs.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append((a, b))
        new = Counter()
        for syms, f in freqs.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new[tuple(out)] += f
        freqs = new
    return merges, freqs


def _df(spark, repartition=None):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    return df.repartition(repartition) if repartition else df


class TestTraining:
    def test_merges_match_reference(self, spark):
        model = train_bpe(spark, _df(spark), "text", num_merges=8)
        ref_merges, _ = ref_train([t for _, t in CORPUS], 8)
        assert model.merges == ref_merges

    def test_vocab_matches_reference_state(self, spark):
        model = train_bpe(spark, _df(spark), "text", num_merges=8)
        _, ref_freqs = ref_train([t for _, t in CORPUS], 8)
        ref_vocab = sorted({s for syms in ref_freqs for s in syms})
        assert model.vocab == ref_vocab

    def test_partition_invariant(self, spark):
        m1 = train_bpe(spark, _df(spark, 1), "text", num_merges=6)
        m7 = train_bpe(spark, _df(spark, 7), "text", num_merges=6)
        assert m1.merges == m7.merges and m1.vocab == m7.vocab

    def test_min_freq_stops_early(self, spark):
        model = train_bpe(spark, _df(spark), "text", num_merges=100, min_freq=4)
        ref_merges, _ = ref_train([t for _, t in CORPUS], 100, min_freq=4)
        assert model.merges == ref_merges
        assert len(model.merges) < 100

    def test_learns_meaningful_units(self, spark):
        """'est</w>' dominates this corpus (newest x6, widest x3) — the
        trained merges must assemble it on the way to larger units."""
        model = train_bpe(spark, _df(spark), "text", num_merges=10)
        built = {a + b for a, b in model.merges}
        assert "est" + EOW in built


@pytest.mark.slow
class TestBatchedRounds:
    def test_driver_rounds_below_merge_count(self, spark):
        """Disjoint batching: several merges land per driver round when
        the top pairs share no symbols (chain-heavy corpus), with the
        merge list still byte-identical to the sequential reference."""
        docs = [("x", "abab abab ababab cdcd cdcdcd efef")]
        model = train_bpe(
            spark, spark.createDataFrame(docs, ["doc_id", "text"]), "text", 6
        )
        ref_merges, _ = ref_train([t for _, t in docs], 6)
        assert model.merges == ref_merges
        assert model.rounds < len(model.merges)  # batching actually batched

    def test_overlap_truncation_keeps_equivalence(self, spark):
        """Adversarial overlap/tie corpora: a merge creates new pairs
        ((ab, ab), (x, ab)) that can outrank lower-ranked disjoint pairs
        — the batch must truncate rather than commit them out of order."""
        corpora = [
            "ababababab ababab zz zz zz yy yy",  # (a,b) spawns (ab,ab) ties
            "aaaa aaaa bbbb cccc",  # self-pair chains
            "ab ab ab ba ba ba cd cd dc dc",  # symmetric overlap ties
            "the the then then than xylo xylo",
            # the overlap that bounds the batch sits BELOW the batch
            # limit in rank order: (a,x),(p,q) tie at 10 with (q,</w>)
            # also at 10 — merging (a,x) creates (ax,y)=10 which beats
            # (p,q) on tie-break, so (p,q) must NOT batch with (a,x)
            " ".join(["axy"] * 10 + ["pq"] * 10),
        ]
        for text in corpora:
            docs = [("d", text)]
            for n in (3, 6, 10):
                model = train_bpe(
                    spark,
                    spark.createDataFrame(docs, ["doc_id", "text"]),
                    "text",
                    n,
                )
                ref_merges, _ = ref_train([text], n)
                assert model.merges == ref_merges, (text, n)


@pytest.mark.slow
class TestCompositionExclusion:
    """Symbols are concatenation-named, so two candidates can interact
    WITHOUT sharing a symbol: selecting ('a','bc') creates 'abc'
    occurrences that grow a coexisting ('abc','d') mid-batch, silently
    diverging from the sequential merge order. Such candidates must be
    treated as overlapping (truncation bound), not batched."""

    def _rows(self, *triples):
        return [{"a": a, "b": b, "cnt": c} for a, b, c in triples]

    def test_candidate_consuming_selected_concatenation_bounds(self):
        from opentelemetry_iceberg_exporter_spark.operators.bpe import (
            _select_disjoint_batch,
        )

        rows = self._rows(("a", "bc", 100), ("abc", "d", 90), ("x", "y", 80))
        # ('abc','d') composes with ('a','bc') — it is the bound (90),
        # and ('x','y') at 80 must not slip in below it
        assert _select_disjoint_batch(rows, 8, 1, exhaustive=True) == [("a", "bc")]

    def test_candidate_producing_used_symbol_bounds(self):
        from opentelemetry_iceberg_exporter_spark.operators.bpe import (
            _select_disjoint_batch,
        )

        # ('a','b') would CREATE new 'ab' symbols that the already
        # selected ('ab','c') merge (applied first in the batch chain)
        # never sees — sequential order would merge them
        rows = self._rows(("ab", "c", 100), ("a", "b", 90), ("x", "y", 80))
        assert _select_disjoint_batch(rows, 8, 1, exhaustive=True) == [("ab", "c")]

    def test_two_candidates_producing_same_symbol_bound(self):
        from opentelemetry_iceberg_exporter_spark.operators.bpe import (
            _select_disjoint_batch,
        )

        # ('a','bc') and ('ab','c') both produce 'abc': batching them
        # makes later 'abc'-pair counts order-dependent
        rows = self._rows(("a", "bc", 100), ("ab", "c", 90), ("x", "y", 80))
        assert _select_disjoint_batch(rows, 8, 1, exhaustive=True) == [("a", "bc")]

    def test_truly_disjoint_pairs_still_batch(self):
        from opentelemetry_iceberg_exporter_spark.operators.bpe import (
            _select_disjoint_batch,
        )

        rows = self._rows(("a", "b", 100), ("c", "d", 90), ("e", "f", 80))
        assert _select_disjoint_batch(rows, 8, 1, exhaustive=True) == [
            ("a", "b"),
            ("c", "d"),
            ("e", "f"),
        ]

    def test_composition_heavy_corpora_match_reference(self, spark):
        """End-to-end: collision-prone corpora (words built from a, ab,
        abc, bc, c, d chains so concatenation collisions arise across
        rounds) must reproduce the strict sequential merge list."""
        import random

        rng = random.Random(41)
        vocab = ["aabc", "abcd", "abc", "ab", "bc", "cd", "abab", "bcbc", "d"]
        for trial in range(5):
            docs = [
                (
                    f"d{i}",
                    " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 14))),
                )
                for i in range(5)
            ]
            n_merges = rng.randint(4, 12)
            model = train_bpe(
                spark,
                spark.createDataFrame(docs, ["doc_id", "text"]),
                "text",
                num_merges=n_merges,
                min_freq=1,
            )
            ref_merges, _ = ref_train([t for _, t in docs], n_merges, min_freq=1)
            assert model.merges == ref_merges, f"trial {trial}: {docs}"


@pytest.mark.slow
class TestPropertyVsReference:
    def test_random_corpora_match_reference(self, spark):
        """Randomized corpora (repeated words from a tiny alphabet so
        merges are dense and ties are frequent) must produce the exact
        reference merge sequence — the tie-break rule is where a
        distributed reimplementation would silently drift."""
        import random

        rng = random.Random(17)
        vocab = ["ab", "abc", "bca", "cab", "aab", "bc", "ca"]
        for trial in range(5):
            docs = [
                (
                    f"d{i}",
                    " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))),
                )
                for i in range(6)
            ]
            n_merges = rng.randint(2, 10)
            model = train_bpe(
                spark,
                spark.createDataFrame(docs, ["doc_id", "text"]),
                "text",
                num_merges=n_merges,
                min_freq=2,
            )
            ref_merges, _ = ref_train([t for _, t in docs], n_merges, min_freq=2)
            assert model.merges == ref_merges, f"trial {trial}: {docs}"


class TestEncoding:
    def test_encode_word_matches_training_segmentation(self, spark):
        model = train_bpe(spark, _df(spark), "text", num_merges=8)
        _, ref_freqs = ref_train([t for _, t in CORPUS], 8)
        ref_seg = {"".join(s for s in syms if s != EOW).replace(EOW, ""): list(syms)
                   for syms in ref_freqs}
        for word in ("low", "lower", "newest", "widest"):
            assert encode_word(word, model.merges) == ref_seg[word]

    def test_unseen_word_falls_back_gracefully(self, spark):
        model = train_bpe(spark, _df(spark), "text", num_merges=8)
        syms = encode_word("lowest", model.merges)
        assert "".join(syms) == "lowest" + EOW  # lossless
        assert len(syms) < len("lowest") + 1  # shares learned units

    def test_bpe_encode_dataframe(self, spark):
        model = train_bpe(spark, _df(spark), "text", num_merges=8)
        docs = spark.createDataFrame(
            [("a", "low newest"), ("b", ""), ("c", None)], ["doc_id", "text"]
        )
        rows = {r["doc_id"]: r for r in
                bpe_encode(docs, "doc_id", "text", model).collect()}
        expected = encode_word("low", model.merges) + encode_word(
            "newest", model.merges
        )
        assert rows["a"]["bpe_tokens"] == expected
        assert rows["a"]["n_bpe_tokens"] == len(expected)
        assert rows["b"]["bpe_tokens"] == [] and rows["b"]["n_bpe_tokens"] == 0
        assert rows["c"]["bpe_tokens"] == []
