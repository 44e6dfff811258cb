"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hashing derives from md5 (bit-identical in DuckDB) so every operator
is oracle-checkable. All per-document signature computation is expressed
as Catalyst array expressions over the token array — zero shuffles until
the candidate-pair join, which is the unavoidable one (and is an equi-join
on band/bucket keys, so it scales: shuffle size is O(docs × bands), not
O(docs²)).

Scale design (100 TB):
* exact dedup: single hash-aggregate shuffle on the content hash;
* MinHash LSH: signatures map-side; candidate generation = explode bands
  -> equi-join on (band_idx, band_hash) -> distinct pairs; only
  candidates get the exact-Jaccard verification;
* SimHash: 32-bit signature map-side; near-dup = band the signature into
  4 bytes and equi-join on any matching byte (Hamming<=k candidates);
* n-gram Jaccard: shingle-explode + equi-join on shingle; skew guard =
  drop shingles whose document frequency exceeds a cap (stop-shingles
  contribute nothing to near-dup detection but dominate the join).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import md5_hash64, ngrams, tokens
from ..functions.textfns import HASH_MOD
from ..sources.tables import _FAN_OUT_TASK_BYTES, fan_out, load_table
from ..queries import register

# ---------------------------------------------------------------------------
# shared: deterministic minhash permutation constants (seed fixed so the
# DuckDB oracle embeds the same literals)

NUM_HASHES = 16
BAND_SIZE = 4  # 4 bands of 4 -> near-dup threshold ~ (1/4)^(1/4) ≈ 0.71
SIMHASH_BITS = 32

_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, HASH_MOD) for _ in range(NUM_HASHES)]
MINHASH_B = [_rng.randrange(0, HASH_MOD) for _ in range(NUM_HASHES)]


# DuckDB SQL fragments mirroring functions/textfns.py exactly
_DUCK_TOKENS = r"regexp_split_to_array(trim(text), '\s+')"
_DUCK_HASH64 = "(('0x' || substring(md5({x}), 1, 15))::BIGINT)"


def _duck_shingles(n: int = 3) -> str:
    terms = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len(t) - {n - 1}, 0) + 1), i -> {terms})"
    )


# ---------------------------------------------------------------------------
# Exact deduplication


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct normalized content.

    One hash-aggregate shuffle on the 128-bit content hash; at 100 TB the
    hash (not the content) is the shuffle key, so shuffle volume is
    O(rows × ~50B).
    """
    norm = F.md5(F.regexp_replace(F.trim(F.lower(F.col(content_col))), r"\s+", " "))
    return (
        df.withColumn("__h", norm)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__h")
    )


_SUBSTR_K = 25  # spans-row gram width: ~45% of docs carry a duplicated
# >= 25-char substring in the synthetic corpus — a dense, non-trivial
# cross-engine signal (the paper's k=50 finds almost nothing at ~300
# chars/doc)


@register(
    "d08_substr_spans",
    f"""
    WITH gp AS (
      SELECT doc_id, text,
             unnest(range(0, greatest(length(text) - {_SUBSTR_K} + 1, 0)))
               AS pos
      FROM documents
    ),
    g AS (
      SELECT doc_id, pos,
             substring(text, pos::INT + 1, {_SUBSTR_K}) AS gram
      FROM gp
    ),
    ranked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY gram) AS n,
             row_number() OVER (PARTITION BY gram
                                ORDER BY doc_id, pos) AS rk
      FROM g
    ),
    hits AS (SELECT doc_id, pos FROM ranked WHERE n >= 2 AND rk > 1),
    marked AS (
      SELECT doc_id, pos,
             CASE WHEN coalesce(max(pos + {_SUBSTR_K}) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) < pos THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    isl AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM marked
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + {_SUBSTR_K} AS e
      FROM isl GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS spans_removed,
             sum(e - s) AS chars_removed
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.spans_removed, 0) AS BIGINT) AS spans_removed,
           CAST(coalesce(p.chars_removed, 0) AS BIGINT) AS chars_removed,
           CAST(length(d.text) - coalesce(p.chars_removed, 0) AS BIGINT)
             AS deduped_len
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="Exact substring dedup (ExactSubstr, Lee et al. 2022) graded "
    "CROSS-ENGINE: per doc, the count of maximal duplicated >= k-char "
    "spans, the characters they cover, and the length of the stitched "
    "excised text. Pins all three semantic pieces against an "
    "independent DuckDB rendering — canonical exemption (each "
    "duplicated gram's min-(doc_id,pos) occurrence survives: "
    "row_number()=1 in the mirror), maximal-span merge (gaps-and-"
    "islands: new span when no earlier hit reaches pos), and the "
    "JVM aggregate() stitch (deduped_len must equal length(text) - "
    "chars_removed). Slot from d01_exact_dedup, whose exact-dup "
    "md5-canary signal moved INTO d07 (n_exact_copies).",
)
def d08_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .substring_dedup import apply_span_strip, duplicated_spans

    tbl = load_table(spark, sf_dir, "documents")
    docs = fan_out(
        tbl.select("doc_id", "text"),
        spark,
        src_bytes=getattr(tbl, "_graft_src_bytes", None),
    )
    spans = duplicated_spans(docs, "doc_id", "text", k=_SUBSTR_K)
    # with_stats derives the per-doc counters from the strip's own
    # collected span array — ONE use of the spans pipeline (a second
    # aggregation over `spans` would recompute the dominant gram
    # explode: HOF lambdas defeat exchange reuse)
    stripped = apply_span_strip(
        docs, "doc_id", "text", spans, with_stats=True
    )
    return stripped.select(
        "doc_id",
        "spans_removed",
        "chars_removed",
        F.length("text_deduped").cast("long").alias("deduped_len"),
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH candidate pairs


def _shingle_hashes(text_col: Column) -> Column:
    """Distinct-shingle md5 array — the base every minhash permutation
    folds over (one md5 per distinct shingle). Column-API reference
    implementation; the query path uses the SQL-text twin below
    (plan-BUILD is ~6x faster without per-node py4j round trips —
    the same fix as the OTLP flatten's *_sql encoders), with
    test_minhash_sql_parity pinning the two identical."""
    return F.transform(
        F.array_distinct(ngrams(tokens(text_col), 3)),
        lambda s: md5_hash64(s) % HASH_MOD,
    )


def shingle_hashes_sql(text_sql: str, n: int = 3) -> str:
    """SQL-text twin of _shingle_hashes over a column/expression string:
    whitespace tokens -> word n-grams (short docs -> empty) ->
    distinct -> md5-based 60-bit hash mod HASH_MOD."""
    from ..functions.textfns import ngrams_sql, tokens_sql

    return (
        f"transform(array_distinct({ngrams_sql(tokens_sql(text_sql), n)}), "
        f"s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % {HASH_MOD}L)"
    )


def minhash_sig_cols(hs: Column) -> list[Column]:
    """sig0..sigN-1 as array folds over a shingle-hash array column:
    array_min(transform(hs, h -> (a*h+b) % MOD)) per permutation —
    pure per-row math, entirely inside codegen. Column-API reference;
    the query path uses minhash_sig_sql (parity-pinned)."""
    return [
        F.array_min(
            F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % HASH_MOD)
        ).alias(f"sig{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def minhash_sig_sql(hs_sql: str = "__hs") -> list[str]:
    """SQL-text twin of minhash_sig_cols (each entry is a full
    `expr AS sigN` string)."""
    return [
        f"array_min(transform({hs_sql}, h -> ({a}L * h + {b}L) % {HASH_MOD}L))"
        f" AS sig{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """NUM_HASHES minhash values per document — ONE map-side projection,
    zero shuffle.

    Shape: a first select materializes the distinct-shingle md5 array
    (one md5 per shingle; runtime subexpression elimination keeps it
    single-evaluation under project collapse), a second folds it with 16
    array_min(transform(...)) permutations. This replaces the round-2
    explode → 16-way min-agg shape, which shuffled one 16-value row per
    doc per partition: the array formulation moves the same math into
    the scan stage (~3.5x faster at sf0.1, and at 100 TB the signature
    stage adds ZERO network). Empty shingle sets (short docs) yield NULL
    signatures — array_min over an empty array — matching the oracle's
    min-over-empty-list semantics."""
    step = df.select(
        F.col(id_col),
        F.expr(shingle_hashes_sql(f"`{text_col}`")).alias("__hs"),
    )
    return step.select(F.col(id_col), *[F.expr(s) for s in minhash_sig_sql()])


def band_keys_col() -> Column:
    """Array of LSH band keys (md5 over each band's signature slice) —
    the column form shared by the batch self-join (d03) and the
    incremental corpus index (operators/incremental_dedup.py). NULL
    signatures (empty shingle sets — short docs) produce the same
    md5(\"\") key in every band because concat_ws skips NULLs."""
    n_bands = NUM_HASHES // BAND_SIZE
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"sig{b * BAND_SIZE + j}") for j in range(BAND_SIZE)]
                )
            )
            for b in range(n_bands)
        ]
    )


def band_rows(sigs: DataFrame, id_col: str) -> DataFrame:
    """(id, band_idx, band_key) — one row per (doc, band). The exploded
    form both d03's self-join and the incremental index store consume."""
    return sigs.select(
        F.col(id_col), F.posexplode(band_keys_col()).alias("band_idx", "band_key")
    )


def band_pairs(rows: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs from exploded band rows —
    the self-join shared by the batch LSH operator and the incremental
    index's within-batch pass (one skew/shape tweak serves both)."""
    a = rows.alias("a")
    b = rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_lsh_pairs(sigs: DataFrame, id_col: str) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band.

    Explode to one row per band (docs × n_bands), equi-join on
    (band_idx, band_key) — scales linearly, never O(n²).

    The signature input is localCheckpoint'ed (lazily) first: the
    self-join consumes it on BOTH sides, and Spark's exchange reuse
    cannot canonicalize the higher-order-function lambdas inside the
    map-side signature math — without the checkpoint the whole
    signature projection would execute twice. One materialization of
    the (doc × 17-column) signature matrix is tiny relative to the
    corpus and is the same lineage-truncation pattern the d07
    connected-components loop uses."""
    sigs = sigs.localCheckpoint(eager=False)
    return band_pairs(band_rows(sigs, id_col), id_col)


def _signatures_oracle() -> str:
    base = _DUCK_HASH64.format(x="s") + f" % {HASH_MOD}"
    sig_exprs = ",\n      ".join(
        f"list_aggregate(list_transform(hs, h -> ({a} * h + {b}) % {HASH_MOD}), 'min')"
        f" AS sig{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    h = _DUCK_HASH64.format(x="x")
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(th, h -> (h >> {b}) & 1 = 1)) > len(th) "
        f"THEN {1 << b}::BIGINT ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(list_distinct({_duck_shingles(3)}), s -> {base}) AS hs,
             list_transform(t, x -> {h}) AS th
      FROM tok
    )
    SELECT doc_id,
      {sig_exprs},
      ({bit_terms}) AS simhash
    FROM sh
    """


@register(
    "d02_signatures",
    _signatures_oracle(),
    doc="Per-document near-dup signatures (merged d02+d05): the 16-hash "
    "MinHash signature and the 32-bit SimHash (majority-bit of token "
    "hashes), both map-side array math joined on doc_id.",
)
def d02_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FUSED single projection: minhash + simhash from one scan, no join
    # (both are per-row array folds; the former join on doc_id was the
    # query's only shuffle). fan_out parallelizes the per-row hashing
    # when the scan arrives as a single split (no-op at scale).
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    th = F.transform(tokens(F.col("text")), md5_hash64)
    step = docs.select(
        "doc_id",
        F.expr(shingle_hashes_sql("`text`")).alias("__hs"),
        th.alias("__th"),
        F.size(th).alias("__n"),
    )
    return step.select(
        "doc_id",
        *[F.expr(s) for s in minhash_sig_sql()],
        F.expr(simhash_sql("__th", "__n")).alias("simhash"),
    )


def _lsh_pairs_oracle() -> str:
    n_bands = NUM_HASHES // BAND_SIZE
    base = _DUCK_HASH64.format(x="s") + f" % {HASH_MOD}"
    sig_exprs = ",\n      ".join(
        f"list_aggregate(list_transform(hs, h -> ({a} * h + {b}) % {HASH_MOD}), 'min')"
        f" AS sig{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_rows = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band_idx, md5("
        + " || ',' || ".join(f"sig{b * BAND_SIZE + j}::VARCHAR" for j in range(BAND_SIZE))
        + ") AS band_key FROM sigs"
        for b in range(n_bands)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(list_distinct({_duck_shingles(3)}), s -> {base}) AS hs
      FROM tok
    ), sigs AS (
      SELECT doc_id, {sig_exprs} FROM sh
    ), bands AS (
      {band_rows}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """


@register(
    "d03_minhash_lsh_pairs",
    _lsh_pairs_oracle(),
    doc="MinHash-LSH candidate pairs (4 bands × 4 rows).",
)
def d03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return minhash_lsh_pairs(minhash_signatures(docs, "doc_id", "text"), "doc_id")


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity (exact, shuffle-based)

JACCARD_THRESHOLD = 0.2
# Stop-shingle cap, ON by default: shingles whose document frequency
# exceeds this are join-skew without near-dup signal (a shingle shared by
# >1000 docs contributes ~500k candidate pairs on its own). The DuckDB
# oracle applies the SAME cap, so correctness holds at any scale factor
# whether or not the cap fires. Tune per corpus; None disables.
DEFAULT_DF_CAP: int | None = 1000


def _pair_shuffle_width(df: DataFrame) -> int | None:
    """Explicit width for the shingle-group shuffle, or None to leave it
    to the configured shuffle partitioning + AQE. Derived from the same
    source-bytes rule as fan_out (one slice per ~48 KB, floor 2) so the
    pinned width is data-derived; inputs big enough that the estimate
    leaves the cluster's few-waves range (4x parallelism) return None —
    at production scale the configured partitioning governs, unchanged."""
    src_bytes = getattr(df, "_graft_src_bytes", None)
    if src_bytes is None:
        return None
    target = df.sparkSession.sparkContext.defaultParallelism
    est = max(2, int(src_bytes // _FAN_OUT_TASK_BYTES))
    return est if est <= 4 * target else None


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    df_cap: int | None = DEFAULT_DF_CAP,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs above threshold.

    shingle-explode -> per-shingle sorted doc list (ONE shuffle; the
    df cap is a size filter on the list, no separate frequency join) ->
    ordered pairs generated IN-PARTITION with higher-order functions ->
    per-pair shared count. The old shape self-joined the exploded
    relation (two sort-merge sorts of the biggest intermediate); the
    grouped form never materializes the exploded relation twice and
    generates exactly the same pairs map-side. Integer arithmetic until
    the final division => deterministic.
    """
    from ..functions.textfns import ngrams_sql, tokens_sql

    sh = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"array_distinct({ngrams_sql(tokens_sql(f'`{text_col}`'), n)})"
            )
        ).alias("sh"),
    )
    # explode fans ~50x out of a narrow scan: redistribute by the group
    # key so the per-shingle grouping runs partition-local and parallel
    # even when the source parquet is a single split (also the
    # co-location strategy at scale: one shuffle feeds pair generation
    # and, via the exploded lists, the per-doc counts).
    #
    # Width: the post-shuffle pair generation is compute-bound, not
    # byte-bound (~150ms of CPU per shuffled MB measured at sf0.1), so
    # AQE's byte-based partition coalescing under-parallelizes it —
    # measured 4 post-coalesce tasks where ~12 run 1.5x faster end to
    # end. When the source is small enough that the byte rule would
    # collapse it (width within a few waves of the cluster), pin the
    # exchange to the same data-derived width fan_out uses (one slice
    # per ~48 KB of source, floor 2); at production scale the width
    # estimate exceeds that bound and the configured shuffle
    # partitioning + AQE governs exactly as before.
    width = _pair_shuffle_width(df)
    sh = sh.repartition(width, F.col("sh")) if width else sh.repartition(F.col("sh"))
    groups = sh.groupBy("sh").agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
    if df_cap is not None:
        # stop-shingle cap == list-size filter (memory per group is
        # bounded by the cap for exactly the same reason)
        groups = groups.filter(F.size("ids") <= df_cap)
    # three consumers (pair generation + both per-doc count branches) and
    # exchange reuse cannot canonicalize through the HOF lambdas below —
    # one lazy materialization of the (shingle -> ≤cap ids) table keeps
    # the tokenize/explode/group lineage from running 3x (same pattern
    # as d03's signature matrix)
    groups = groups.localCheckpoint(eager=False)
    counts = (
        groups.select(F.explode("ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    # all ordered (i < j) pairs of each shingle's sorted doc list,
    # generated inside whole-stage codegen (no self-join, no resort)
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    shared = (
        groups.filter(F.size("ids") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "shared", "jaccard")
    )


@register(
    "d04_ngram_jaccard_pairs",
    f"""
    WITH tok AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
    ), sh_raw AS (
      SELECT doc_id, unnest(list_distinct({_duck_shingles(3)})) AS sh FROM tok
    ), freq AS (
      SELECT sh, COUNT(*) AS df_ FROM sh_raw GROUP BY sh
    ), sh AS (
      -- same stop-shingle document-frequency cap as the Spark side
      SELECT sh_raw.doc_id, sh_raw.sh
      FROM sh_raw JOIN freq USING (sh) WHERE df_ <= {DEFAULT_DF_CAP}
    ), cnt AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, shared,
           ROUND(shared * 1.0 / (ca.n_sh + cb.n_sh - shared), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON pairs.id_a = ca.doc_id
    JOIN cnt cb ON pairs.id_b = cb.doc_id
    WHERE ROUND(shared * 1.0 / (ca.n_sh + cb.n_sh - shared), 6) >= {JACCARD_THRESHOLD}
    """,
    doc="Exact 3-gram Jaccard near-dup pairs above 0.2, with the "
    "stop-shingle skew guard active (df cap mirrored in the oracle).",
)
def d04_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return ngram_jaccard_pairs(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Near-dup group resolution: connected components over the candidate graph


def dedup_groups(
    docs: DataFrame, pairs: DataFrame, id_col: str, max_iter: int = 50
) -> DataFrame:
    """Resolve near-dup candidate PAIRS into dedup GROUPS: each document
    gets the component id (min doc id reachable through the pair graph),
    the component size, and a canonical flag — the piece that turns LSH
    output into an actual keep/drop decision for a training corpus.

    Algorithm: iterative min-label propagation (hash-min connected
    components) run ONLY over nodes that appear in at least one pair —
    at a realistic near-dup rate the candidate graph is orders of
    magnitude smaller than the corpus, so the loop never touches the
    full 100 TB table; singleton docs join back in one final left join.
    Each iteration is one equi-join + min-aggregate (both shuffle on the
    node id, so AQE can reuse the exchange), and labels are
    localCheckpoint'ed to truncate lineage — the standard Spark shape
    for iterative graph algorithms (GraphFrames CC does the same).
    Each round combines neighbor-min propagation with POINTER DOUBLING
    (label <- min(label, label(label)), one extra self-join): chain
    depth halves every round, so convergence is O(log diameter) rounds
    rather than O(diameter) — on a 64-node path graph that is ~7 Spark
    jobs instead of 64. Near-dup components are usually tiny dense
    cliques (1-2 rounds); the doubling step is what keeps adversarial
    chain-shaped corpora (serial edits, boilerplate families) from
    turning the loop into a scheduler bender.

    The reference has no counterpart (closest analog: the recovery
    reconciler's set algebra, internal/recovery/reconciler.go); this is
    part of the LLM-pipeline extension surface.
    """
    # one lazy materialization: the pair plan feeds BOTH edge directions
    # (so it would otherwise run twice), and truncating its lineage here
    # also keeps union-shaped pair producers (banded_hamming_pairs'
    # banded ∪ degenerate-star output) out of the iterative loop's
    # constraint propagation, which Spark's UnionBase.rewriteConstraints
    # mishandles for nested unions sharing attribute ids
    e = pairs.select("id_a", "id_b").localCheckpoint(eager=False)
    edges = e.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(e.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = edges.join(labels, edges["dst"] == labels["node"]).select(
            edges["src"].alias("node"), labels["label"]
        )
        merged = labels.union(prop).groupBy("node").agg(F.min("label").alias("label"))
        # pointer doubling: every label value is itself a node id in the
        # same component, so label(label) is defined; taking the min
        # against it halves the remaining chain depth each round
        hop = merged.select(
            F.col("node").alias("label"), F.col("label").alias("label2")
        )
        # carry the PREVIOUS label through the materialization so the
        # convergence check is a filter-count over the checkpointed
        # blocks instead of a second join job per round — the old-label
        # join costs the same shuffle either way, but fused here it
        # rides the round's one materializing job (iterative loops are
        # driver-latency bound: 2 jobs/round -> 1 job + a cheap scan)
        doubled = (
            merged.join(hop, "label", "left")
            .join(
                labels.select(
                    "node", F.col("label").alias("__old_label")
                ),
                "node",
                "left",
            )
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("label2", "label")).alias("label"),
                "__old_label",
            )
            .localCheckpoint()
        )
        changed = doubled.filter(
            F.col("label") != F.col("__old_label")
        ).count()
        labels = doubled.select("node", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_groups did not converge within {max_iter} rounds; "
            "the candidate graph is deeper than expected — raise max_iter"
        )
    out = (
        docs.select(F.col(id_col))
        .join(labels.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("group_id", F.coalesce(F.col("label"), F.col(id_col)))
        .drop("label")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("group_id")
    return out.select(
        F.col(id_col),
        F.col("group_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col(id_col) == F.col("group_id")).alias("is_canonical"),
    )


def _dedup_groups_oracle() -> str:
    n_bands = NUM_HASHES // BAND_SIZE
    base = _DUCK_HASH64.format(x="s") + f" % {HASH_MOD}"
    sig_exprs = ",\n      ".join(
        f"list_aggregate(list_transform(hs, h -> ({a} * h + {b}) % {HASH_MOD}), 'min')"
        f" AS sig{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_rows = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band_idx, md5("
        + " || ',' || ".join(f"sig{b * BAND_SIZE + j}::VARCHAR" for j in range(BAND_SIZE))
        + ") AS band_key FROM sigs"
        for b in range(n_bands)
    )
    return f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(list_distinct({_duck_shingles(3)}), s -> {base}) AS hs
      FROM tok
    ), sigs AS (
      SELECT doc_id, {sig_exprs} FROM sh
    ), bands AS (
      {band_rows}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ), reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
    ), comp AS (
      SELECT node AS doc_id, MIN(label) AS group_id FROM reach GROUP BY node
    )
    SELECT c.doc_id, c.group_id,
           COUNT(*) OVER (PARTITION BY c.group_id) AS group_size,
           (c.doc_id = c.group_id) AS is_canonical,
           x.n_exact_copies
    FROM comp c JOIN (
      SELECT doc_id,
             COUNT(*) OVER (PARTITION BY
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
             ) AS n_exact_copies
      FROM documents
    ) x ON c.doc_id = x.doc_id
    """


@register(
    "d07_dedup_groups",
    _dedup_groups_oracle(),
    doc="MinHash-LSH pairs resolved to dedup groups via distributed "
    "connected components (hash-min label propagation over the candidate "
    "graph only); every doc gets (group_id, group_size, is_canonical) "
    "PLUS n_exact_copies — the normalized-content-md5 group size that "
    "was d01's whole signal (folded here per-doc, which is strictly "
    "stronger: the md5 canary now grades every row, freeing d01's slot "
    "for d08_substr_spans). Oracle: recursive-CTE transitive closure "
    "over the same pair graph + an independent md5 window count.",
)
def d07_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    sigs = minhash_signatures(docs, "doc_id", "text")
    from pyspark.sql.window import Window

    groups = dedup_groups(docs, minhash_lsh_pairs(sigs, "doc_id"), "doc_id")
    norm = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    exact = (
        docs.select("doc_id", norm.alias("__h"))
        .withColumn(
            "n_exact_copies",
            F.count(F.lit(1)).over(Window.partitionBy("__h")),
        )
        .select("doc_id", "n_exact_copies")
    )
    return groups.join(exact, "doc_id")


# ---------------------------------------------------------------------------
# SimHash


def simhash_sql(th_sql: str = "__th", n_sql: str = "__n") -> str:
    """SQL-text twin of simhash_col over (token-hash array, size)
    expression strings. The Column form builds ~320 py4j-backed nodes
    (32 bits x filter-lambda/when/shift each) — measured ~1.1s of
    driver time PER PLAN BUILD, 4x the query's whole execution at
    sf0.1; one parsed string costs milliseconds (the same plan-build
    fix as minhash_sig_sql / the OTLP anyvalue encoders).
    test_simhash_sql_parity pins the two value-identical."""
    bits = " + ".join(
        f"(case when size(filter({th_sql}, h -> (shiftright(h, {b}) & 1) = 1)) * 2"
        f" > {n_sql} then {1 << b}L else 0L end)"
        for b in range(SIMHASH_BITS)
    )
    return f"({bits})"


def simhash_col(th: Column, n: Column) -> Column:
    """32-bit SimHash from a token-hash array column and its size:
    bit b of the signature = majority of (bit b of token-hash) over
    token occurrences — 32 array-filter counts, all codegen.
    Column-API reference implementation; query paths use simhash_sql
    (plan-build speed; parity-pinned)."""

    def bit_test(b: int):
        def f(h: Column) -> Column:
            return F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1

        return f

    sig = F.lit(0).cast("bigint")
    for b in range(SIMHASH_BITS):
        ones = F.size(F.filter(th, bit_test(b)))
        sig = sig + F.when(ones * 2 > n, F.lit(1 << b)).otherwise(0)
    return sig


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash per document, map-side.

    bit b of the signature = sign of sum over token occurrences of
    (bit b of token-hash ? +1 : -1).  Expressed as 32 array-filter
    counts over the token-hash array — all codegen, no shuffle.
    """
    th = F.transform(tokens(F.col(text_col)), md5_hash64)
    out = df.withColumn("__th", th).withColumn("__n", F.size(F.col("__th")))
    return out.select(
        F.col(id_col), simhash_col(F.col("__th"), F.col("__n")).alias("simhash")
    )


# NOTE: the former d05 standalone SimHash query merged into
# d02_signatures (same per-doc map-side signature family) — round-2
# 50-slot consolidation. The simhash() operator above is unchanged.
