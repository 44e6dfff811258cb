"""Exact substring deduplication (the ExactSubstr recipe of Lee et
al. 2022, "Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): find character substrings of length >= k that occur
more than once ACROSS the corpus and excise every occurrence except a
canonical one — the long-verbatim-overlap complement to document-level
MinHash (d03) and paragraph boilerplate removal (cleaning.py), catching
licenses, templates, and quoted passages embedded mid-document.

Spark-first shape (the paper builds a monolithic suffix array; that is
a single-machine construction — the DISTRIBUTED equivalent is k-gram
anchoring):

* every document explodes into its char k-grams — one plan-level
  `transform(sequence(...))`, no Python. stride=1 is exact for spans
  >= k; stride s > 1 is the scale knob: grams are CONTENT-sampled
  (kept when their hash ≡ 0 mod s — positional sampling would miss
  copies whose offsets differ mod s, content sampling anchors
  identically in every copy), shrinking rows ~s× at the cost of a
  probabilistic guarantee — a duplicated region of length L anchors
  with probability 1 - (1 - 1/s)^(L-k+1), e.g. >= 99.8% for L = 2k,
  k = 50, s = 16.
* a k-gram is DUPLICATED when it occurs >= 2 times corpus-wide, and
  the CANONICAL occurrence is min (doc_id, pos): both ride ONE window
  over the gram hash (count + min per hash partition), so the dominant
  exploded gram set shuffles exactly once — deterministically, on any
  cluster layout. Non-canonical occurrences filter out map-side after
  the window and merge into MAXIMAL spans per document —
  gaps-and-islands over one window per doc.
* excision is a single JVM-side `aggregate()` fold that stitches the
  kept slices — no UDF, no Python in the hot path.

At 100 TB: the explode is the dominant cost (O(total chars / stride)
rows, exactly the paper's suffix-array size), the aggregate and join
shuffle on uniformly distributed hashes (no skew — identical grams ARE
the duplicates and cap at the duplication factor), the window
partitions by document. Everything else is map-side.

Known limitation (canonical/excised-span overlap): the canonical
occurrence of gram A is exempt from excision for A, but its k-char
window may overlap a span excised because of a DIFFERENT gram B whose
canonical lives elsewhere — in that case part of A's canonical text is
removed and the corpus does not retain a fully intact copy of A's
region (the paper's single-pass excision has the same artifact). The
overall excision is still deterministic and never cascades: spans are
computed once against the ORIGINAL texts. The incremental sibling
(incremental_substr.py) must not let such anchors become corpus state
and therefore exempts them from index insertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_K = 50  # the paper's span threshold


def kgram_occurrences(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K, stride: int = 1
) -> DataFrame:
    """(doc_id, pos, h): the document's char k-grams, hashed. stride=1
    keeps every gram; stride s > 1 keeps the CONTENT-sampled anchors
    (md5 low bits ≡ 0 mod s) — identical substrings anchor at identical
    relative positions in every copy, so sampling never desynchronizes
    across documents. Documents shorter than k contribute nothing (they
    cannot hold a >= k duplicated span)."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    if stride < 1:
        raise ValueError(f"stride must be >= 1 (got {stride})")
    grams = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
        .filter(F.length("__t") >= k)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, length(__t) - {k}), "
                    f"p -> named_struct('pos', p, 'h', "
                    f"md5(substring(__t, p + 1, {k}))))"
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )
    if stride > 1:
        grams = grams.filter(
            F.expr(f"conv(substring(h, 1, 8), 16, 10) % {stride} = 0")
        )
    return grams


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_K,
    stride: int = 1,
    keep_canonical: bool = True,
) -> DataFrame:
    """Maximal duplicated character spans per document:
    (doc_id, span_start, span_end) — 0-based, end-exclusive — covering
    every k-gram that occurs >= 2 times corpus-wide. With
    `keep_canonical` (default) each duplicated k-gram's min-(doc_id,
    pos) occurrence is EXEMPT, so stripping the returned spans leaves
    exactly one copy of every duplicated region in the corpus;
    keep_canonical=False returns all occurrences (audit mode).

    Duplication count and canonical ride ONE window over the gram hash
    instead of an aggregate + join-back: both shapes shuffle every gram
    on the uniform hash, but the window does it ONCE (the join-back was
    a second full pass over the dominant explode — measured ~40% slower
    end to end), skew behavior is identical (a hot gram lands on one
    reducer either way, O(df) not O(df²)), and an unordered window
    frame needs no more than the partition sort the exchange already
    implies."""
    hits = _duplicated_hits(df, id_col, text_col, k, stride)
    if keep_canonical:
        hits = hits.filter(~_is_canonical())
    return merge_positions_to_spans(hits.select("doc_id", "pos"), k)


def _duplicated_hits(
    df: DataFrame, id_col: str, text_col: str, k: int, stride: int
) -> DataFrame:
    """(doc_id, pos, __canon) for every occurrence of a gram that is
    duplicated corpus-wide — the shared core of duplicated_spans and
    canonical_overlap_report (one window over the gram hash)."""
    grams = kgram_occurrences(df, id_col, text_col, k, stride)
    w = Window.partitionBy("h")
    return grams.select(
        "doc_id",
        "pos",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.min(F.struct("doc_id", "pos")).over(w).alias("__canon"),
    ).filter(F.col("__n") >= 2)


def _is_canonical():
    return (F.col("doc_id") == F.col("__canon.doc_id")) & (
        F.col("pos") == F.col("__canon.pos")
    )


def canonical_overlap_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_K,
    stride: int = 1,
) -> DataFrame:
    """Audit surface for the documented canonical/excised-span overlap
    artifact (module docstring "Known limitation"): one row per
    CANONICAL anchor whose k-char window overlaps a span excised from
    its OWN document — i.e. duplicated regions whose surviving copy is
    itself partially removed, so the corpus retains no fully intact
    occurrence. `count()` of the result is the content-loss rate
    corpus owners watch; the incremental ingester exempts exactly
    these anchors from index insertion for the same reason
    (incremental_substr.py).

    Columns: (doc_id, pos, span_start, span_end) — the anchor and the
    overlapping excised span (an anchor overlapping several spans
    reports each overlap; `dropDuplicates(["doc_id", "pos"])` for the
    per-anchor count). Cost is one extra run of the gram pipeline —
    an audit pass, deliberately not fused into the strip plan (the
    spans pipeline dominates; see apply_span_strip's with_stats note
    on why referencing it twice recomputes). The hits frame feeds BOTH
    sides of the self-join, so it is pinned with a lazy checkpoint —
    without it the dominant count+min window over every gram runs
    twice (HOF lambdas defeat exchange-reuse canonicalization, the
    same reason incremental_substr pins its shared frames)."""
    hits = _duplicated_hits(df, id_col, text_col, k, stride).localCheckpoint(
        eager=False
    )
    canon = hits.filter(_is_canonical()).select("doc_id", "pos")
    spans = merge_positions_to_spans(
        hits.filter(~_is_canonical()).select("doc_id", "pos"), k
    ).select(
        F.col("doc_id").alias("__sp_doc"),
        "span_start",
        "span_end",
    )
    return canon.join(
        spans,
        (canon["doc_id"] == spans["__sp_doc"])
        & (canon["pos"] < spans["span_end"])
        & (canon["pos"] + F.lit(k) > spans["span_start"]),
    ).select("doc_id", "pos", "span_start", "span_end")


def merge_positions_to_spans(hits: DataFrame, k: int) -> DataFrame:
    """Merge (doc_id, pos) k-gram hit positions into maximal
    (doc_id, span_start, span_end) intervals — gaps-and-islands over
    one per-doc window: a hit starts a new span when no earlier hit in
    the doc reaches it ([pos, pos+k) intervals, sorted by pos). Shared
    by the one-shot operator and the incremental ingester."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_reach = F.max(F.col("pos") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "__new",
        F.when(prev_reach.isNull() | (prev_reach < F.col("pos")), 1).otherwise(0),
    ).withColumn("__island", F.sum("__new").over(w))
    return (
        islands.groupBy("doc_id", "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k)).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def strip_duplicated_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_K,
    stride: int = 1,
    out_col: str = "text_deduped",
) -> DataFrame:
    """The full ExactSubstr pass: the input with `out_col` holding the
    text minus every non-canonical duplicated span (one copy of each
    duplicated region survives, in the min-(doc_id, pos) document).
    Documents without duplicated spans pass through untouched. The
    stitching is one JVM-side aggregate() fold over the doc's sorted
    span list — no Python in the row path."""
    spans = duplicated_spans(df, id_col, text_col, k, stride)
    return apply_span_strip(df, id_col, text_col, spans, out_col)


def apply_span_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    spans: DataFrame,
    out_col: str = "text_deduped",
    with_stats: bool = False,
) -> DataFrame:
    """Excise (doc_id, span_start, span_end) intervals from each doc's
    text into `out_col` — one JVM-side aggregate() stitching fold over
    the doc's sorted span list; span-free docs pass through untouched.
    Shared by the one-shot operator and the incremental ingester.

    `with_stats` also emits `spans_removed` / `chars_removed` derived
    from the SAME collected span array — callers that need both the
    trimmed text and the per-doc stats must use this instead of a
    second aggregation over `spans`: the spans pipeline (gram explode +
    dup aggregate + join-back) is the dominant cost, and referencing
    `spans` twice recomputes it (HOF lambdas defeat exchange-reuse
    canonicalization, and materializing the intermediate costs more
    than one recompute at any scale where it fits)."""
    per_doc = spans.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("span_start", "span_end"))).alias(
            "__spans"
        )
    ).withColumnRenamed("doc_id", "__sd_doc")
    joined = df.join(
        per_doc, df[id_col] == per_doc["__sd_doc"], "left"
    ).drop("__sd_doc")
    stitched = (
        "aggregate(__spans, "
        "named_struct('cur', 0, 'out', ''), "
        f"(acc, s) -> named_struct("
        f"'cur', s.span_end, "
        f"'out', concat(acc.out, "
        f"substring({text_col}, acc.cur + 1, s.span_start - acc.cur))), "
        f"acc -> concat(acc.out, "
        f"substring({text_col}, acc.cur + 1, length({text_col}) - acc.cur)))"
    )
    out = joined.withColumn(
        out_col,
        F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
            F.expr(stitched)
        ),
    )
    if with_stats:
        out = out.withColumn(
            "spans_removed",
            F.when(F.col("__spans").isNull(), F.lit(0)).otherwise(
                F.size("__spans")
            ).cast("long"),
        ).withColumn(
            "chars_removed",
            F.when(F.col("__spans").isNull(), F.lit(0)).otherwise(
                F.expr(
                    "aggregate(__spans, 0L, "
                    "(a, s) -> a + (s.span_end - s.span_start))"
                )
            ).cast("long"),
        )
    return out.drop("__spans")
