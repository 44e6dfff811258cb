"""Behavior test for the d04 stop-shingle skew guard: a shingle shared
by more documents than the df cap is join-skew without near-dup signal
and must be dropped from candidate generation (operators/dedup.py
DEFAULT_DF_CAP — the oracle applies the same cap, so this test pins the
operator's own semantics with a synthetic hot shingle)."""

from __future__ import annotations

import pytest

from opentelemetry_iceberg_exporter_spark.operators.dedup import (
    DEFAULT_DF_CAP,
    ngram_jaccard_pairs,
)


def _docs(spark):
    rows = [
        # d1/d2: true near-dups through their full text
        (1, "the cat sat quick brown fox jumps over lazy dog again"),
        (2, "the cat sat quick brown fox jumps over lazy dog again"),
    ]
    # d3..d12: share ONLY the hot prefix "the cat sat" (+ unique tails)
    for i in range(3, 13):
        rows.append((i, f"the cat sat u{i} v{i} w{i} x{i} y{i} z{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_default_cap_is_enabled():
    assert DEFAULT_DF_CAP is not None and DEFAULT_DF_CAP > 0


def test_hot_shingle_dropped_by_cap(spark):
    df = _docs(spark)
    # "the cat sat" appears in 12 docs; cap=5 drops it
    capped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.01, df_cap=5)
    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.01, df_cap=None)

    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    uncapped_pairs = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}

    # without the cap, the hot shingle manufactures candidate pairs
    # between docs that share nothing else
    assert (3, 4) in uncapped_pairs
    # with the cap those hot-shingle-only pairs vanish...
    assert (3, 4) not in capped_pairs
    # ...but genuine near-dups (shared low-frequency shingles) survive
    assert (1, 2) in capped_pairs

    # the surviving pair keeps exact jaccard over the CAPPED shingle set
    r12 = [r for r in capped.collect() if (r["id_a"], r["id_b"]) == (1, 2)][0]
    assert r12["jaccard"] == 1.0


@pytest.mark.slow
def test_hot_gram_exactsubstr_stays_linear(spark):
    """r11 verdict ask #5: the window-form ExactSubstr claims O(df) per
    hot gram — pin it with an adversarial skew corpus. One document of
    100_050 identical characters puts ~1e5 occurrences of a SINGLE
    k-gram on one reducer: the count+min window costs one pass over
    the partition, where the old aggregate+join-back (or any
    occurrences-to-occurrences shape) would manufacture ~1e10 rows and
    never finish. Bounded wall-time + the exact expected span IS the
    claim as a test."""
    import time

    from opentelemetry_iceberg_exporter_spark.operators.substring_dedup import (
        duplicated_spans,
    )
    from opentelemetry_iceberg_exporter_spark.plans.inspect import (
        join_strategies,
        num_shuffles,
    )

    k = 50
    n_occ = 100_000
    n_chars = n_occ + k - 1
    doc = spark.range(1).selectExpr(
        "1 as doc_id", f"repeat('A', {n_chars}) as text"
    )
    spans_df = duplicated_spans(doc, "doc_id", "text", k=k)
    # plan shape: no join at all in the window form (the hot gram can
    # only cost a partition pass), and a bounded shuffle budget —
    # one exchange of the gram set + the per-doc island window/agg
    assert join_strategies(spans_df) == []
    assert num_shuffles(spans_df) <= 4
    t0 = time.perf_counter()
    spans = [(r["doc_id"], r["span_start"], r["span_end"]) for r in spans_df.collect()]
    elapsed = time.perf_counter() - t0
    # every occurrence except the pos-0 canonical merges to ONE span
    assert spans == [(1, 1, n_chars)]
    assert elapsed < 60, f"hot-gram span detection took {elapsed:.1f}s"
