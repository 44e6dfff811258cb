"""Sampling and dataset-split operators for training-data pipelines:
deterministic train/val/test assignment and exact stratified sampling.

Scale design (100 TB):

* hash split: pure map-side projection — each row's destination is a
  function of md5(id, salt) alone, so assignment is reproducible across
  runs/engines/cluster sizes, needs no coordination, and survives
  incremental ingestion (new rows never reshuffle old ones — the
  property that matters for not contaminating a held-out set).
* stratified sample: exact per-stratum counts need a per-stratum total;
  that is ONE window/aggregate shuffle on the stratum key, then rank by
  the same deterministic hash and keep rank <= ceil(frac * n). For
  approximate fractions at petabyte scale, skip the count and keep rows
  with hash-bucket < frac * MOD — zero shuffles (`hash_fraction_sample`).

The reference has no sampling surface (it's an exporter); these belong
to the LLM-pipeline extension mandated by BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import md5_hash64
from ..queries import register
from ..sources.tables import load_table

# split-bucket resolution: md5-derived bucket in [0, SPLIT_MOD)
SPLIT_MOD = 10_000

DEFAULT_WEIGHTS: dict[str, float] = {"train": 0.8, "val": 0.1, "test": 0.1}


def split_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, SPLIT_MOD) from the row id.

    Spark:  conv(substr(md5(concat(id, salt)),1,15),16,10) % SPLIT_MOD
    DuckDB: ('0x'||substring(md5(id::VARCHAR || salt),1,15))::BIGINT % 10000
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_hash64(F.concat(c.cast("string"), F.lit(salt))) % SPLIT_MOD


def duck_split_bucket(id_expr: str, salt: str = "") -> str:
    """The DuckDB rendering of split_bucket, for oracle SQL."""
    return (
        f"(('0x' || substring(md5({id_expr}::VARCHAR || '{salt}'), 1, 15))::BIGINT)"
        f" % {SPLIT_MOD}"
    )


def split_assignment(
    id_col: Column | str,
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> Column:
    """Split label ('train'/'val'/'test'/...) from cumulative weight
    thresholds over the deterministic bucket — a single map-side CASE."""
    weights = weights or DEFAULT_WEIGHTS
    bucket = split_bucket(id_col, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < F.lit(int(round(acc * SPLIT_MOD)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return (expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)).alias(
        "split"
    )


def duck_split_assignment(
    id_expr: str, weights: dict[str, float] | None = None, salt: str = ""
) -> str:
    """DuckDB CASE expression mirroring split_assignment."""
    weights = weights or DEFAULT_WEIGHTS
    bucket = duck_split_bucket(id_expr, salt)
    items = list(weights.items())
    acc = 0.0
    branches = []
    for name, w in items[:-1]:
        acc += w
        branches.append(f"WHEN {bucket} < {int(round(acc * SPLIT_MOD))} THEN '{name}'")
    if not branches:
        return f"'{items[-1][0]}'"
    return "CASE " + " ".join(branches) + f" ELSE '{items[-1][0]}' END"


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Attach a deterministic 'split' column; no shuffle, no state."""
    return df.withColumn("split", split_assignment(id_col, weights, salt))


def hash_fraction_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Approximate-but-deterministic fraction sample: keep rows whose
    bucket falls below fraction*SPLIT_MOD. Map-side only — the scale
    path when exact per-stratum counts aren't required."""
    return df.filter(split_bucket(id_col, salt) < F.lit(int(round(fraction * SPLIT_MOD))))


# shuffle order must not share the hash domain of the split/sample
# coins (same composition rule as SCORE_SALT_TAG)
SHUFFLE_SALT_TAG = "shuffle-order:"


def shuffle_corpus(
    df: DataFrame,
    id_col: str,
    seed: str = "",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: rows sort by the
    md5 of (salted seed || id) — the same order every run, every
    engine, every cluster size; a DIFFERENT order per `seed`, so epoch
    reshuffles are a seed change, not a data rewrite. The standard
    prep step before sequence packing (pack_concat_chunks preserves
    the order it receives through its range shuffle, so whatever order
    reaches it IS the training order).

    Plan shape: ONE range exchange — the cost of any global sort; the
    hash domain is salted apart from hash_split / score_weighted
    coins so shuffling composes with them bias-free. `partitions`
    pins the slice count explicitly (an explicit numPartitions also
    opts out of AQE coalescing) for a stable output-shard layout; the
    RAW id column breaks hash ties (the 60-bit key collides at
    ~2^30-doc scale) so the order is a total function of (seed, ids)
    — raw, not stringified, so it matches pack_concat_chunks' tie
    rule exactly and build_corpus(shuffle_seed=...) packs THIS order.

    DuckDB mirror for tests/oracles (id compared at its own type in
    both engines):
    ORDER BY ('0x'||substring(md5('<tag><seed>'||id::VARCHAR),1,15))::BIGINT, id
    """
    key = md5_hash64(
        F.concat(
            F.lit(SHUFFLE_SALT_TAG + seed), F.col(id_col).cast("string")
        )
    )
    tie = F.col(id_col)
    if partitions is not None:
        return df.repartitionByRange(
            int(partitions), key.asc(), tie.asc()
        ).sortWithinPartitions(key.asc(), tie.asc())
    return df.orderBy(key.asc(), tie.asc())


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """EXACT stratified sample: ceil(fraction * n) rows per stratum,
    chosen by ranking the deterministic hash within each stratum — the
    same rows every run, every engine, every cluster size.

    One shuffle (the window partition on the strata); the rank and the
    per-stratum count ride the same window, so there is no second pass.
    """
    w = Window.partitionBy(*strata_cols)
    order = w.orderBy(split_bucket(id_col, salt).asc(), F.col(id_col).asc())
    ranked = df.withColumn("__rk", F.row_number().over(order)).withColumn(
        "__n", F.count(F.lit(1)).over(w)
    )
    return (
        ranked.filter(F.col("__rk") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rk", "__n")
    )


# score_weighted_sample's coin must not share the hash domain of
# hash_split / hash_fraction_sample (composition bias — see docstring)
SCORE_SALT_TAG = "score-weight:"


def score_weighted_sample(
    df: DataFrame, id_col: str, score_col: str, salt: str = ""
) -> DataFrame:
    """Quality-weighted downsampling: keep each row with probability
    equal to its `score_col` (clamped to [0, 1]) — the standard move
    for turning a quality classifier's output into a soft corpus
    filter (a hard threshold throws away every mid-quality document;
    probability-proportional keeping preserves distributional
    coverage, cf. the CCNet/Gopher quality-sampling setups).

    Deterministic and map-side like the other samplers: the coin is
    the row's md5 bucket, so the same (id, salt) decides the same way
    on every engine/run/cluster size, re-runs are reproducible, and
    raising a row's score can only ADD it (monotone — re-scoring a
    corpus upward is an incremental append, never a swap).

    The coin lives in its OWN hash domain (a fixed operator tag
    prefixes the salt): with a shared domain, a score-s pass deletes
    every row with bucket >= floor(s*10000) — exactly where a later
    hash_split with the same salt puts val/test, so a 0.75-scored
    corpus would split into EMPTY held-out sets. The tag makes the
    score coin and the split coin independent by construction.

    DuckDB mirror: bucket < CAST(floor(score * SPLIT_MOD) AS BIGINT)
    with duck_split_bucket(id, SCORE_SALT_TAG + salt).
    """
    score = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), F.col(score_col).cast("double"))
    )
    return df.filter(
        split_bucket(id_col, SCORE_SALT_TAG + salt)
        < F.floor(score * F.lit(SPLIT_MOD)).cast("long")
    )


SPLIT_STRAT_FRACTION = 0.1


@register(
    "d05_deterministic_splits",
    f"""
WITH b AS (
  SELECT doc_id, lang, {duck_split_bucket('doc_id')} AS bucket
  FROM documents
),
splits AS (
  SELECT {duck_split_assignment('doc_id')} AS split, doc_id FROM documents
),
strat AS (
  SELECT lang, doc_id FROM (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang
                              ORDER BY bucket ASC, doc_id ASC) AS rk,
           count(*) OVER (PARTITION BY lang) AS n
    FROM b
  ) WHERE rk <= ceil({SPLIT_STRAT_FRACTION} * n)
)
SELECT 'split:' || split AS grp, COUNT(*) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM splits GROUP BY 1
UNION ALL
SELECT 'strat:' || lang AS grp, COUNT(*) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM strat GROUP BY 1
""",
    doc="Deterministic train/val/test splits + exact stratified "
    "sampling, graded CROSS-ENGINE — the property that makes these "
    "operators usable at all (assignment is a pure function of the row "
    "id, identical on every engine/run/cluster size, so held-out sets "
    "never leak under re-runs or incremental ingestion). The id_sum per "
    "group catches any single-row misassignment; the strat arm pins the "
    "EXACT per-stratum keep set (rank by md5 bucket within lang, keep "
    "ceil(0.1*n)). DuckDB mirrors via duck_split_bucket/"
    "duck_split_assignment — independent SQL renderings of the same "
    "published recipe, not shared code. Replaces d06 (its LSH signal "
    "duplicates s02's).",
)
def d05_deterministic_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    splits = (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("doc_id").alias("id_sum"))
        .select(
            F.concat(F.lit("split:"), F.col("split")).alias("grp"),
            "n_rows",
            "id_sum",
        )
    )
    strat = (
        stratified_sample(docs, ["lang"], SPLIT_STRAT_FRACTION, "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("doc_id").alias("id_sum"))
        .select(
            F.concat(F.lit("strat:"), F.col("lang")).alias("grp"),
            "n_rows",
            "id_sum",
        )
    )
    return splits.unionByName(strat)


def mix_corpora(
    sources: dict[str, DataFrame],
    id_col: str,
    weights: dict[str, float] | None = None,
    alpha: float = 1.0,
    salt: str = "mix",
    sizes: dict[str, int] | None = None,
) -> tuple[DataFrame, dict[str, dict]]:
    """Temperature-weighted corpus MIXING — the published multilingual-
    pretraining recipe (XLM-R / mT5: sample source i with probability
    q_i ∝ p_i^alpha; alpha < 1 flattens the mix toward low-resource
    sources, alpha = 1 is natural sampling) realized as a DETERMINISTIC
    without-replacement downsample:

    * base shares p_i default to the source SIZES (natural mix) or the
      caller's `weights`;
    * q_i ∝ p_i^alpha, normalized;
    * the largest output that honors composition q without replacement
      is T = min_i n_i / q_i documents — the binding source keeps
      everything, every other source keeps fraction
      f_i = q_i * T / n_i;
    * each keep set is `hash_fraction_sample` — map-side, zero
      shuffles, reproducible under any partitioning, and MONOTONE in
      the fraction (raising a source's share only ADDS documents,
      never swaps them — so re-mixing after an upweight is an
      incremental append, not a corpus rewrite).

    `sizes` skips the counting jobs when the caller already knows them
    (Iceberg snapshot summaries make corpus size O(1) metadata).
    Returns (union of the samples tagged with a `source` column, and a
    per-source report {source: {n, share, fraction, target}} —
    `target` is the EXPECTED take; hash sampling realizes it to within
    the usual binomial wobble, exact composition needs
    stratified_sample's window at one shuffle).
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (got {alpha})")
    if weights is not None:
        unknown = set(weights) - set(sources)
        if unknown:
            raise ValueError(f"weights name unknown sources: {sorted(unknown)}")
        missing = set(sources) - set(weights)
        if missing:
            raise ValueError(
                f"weights must cover every source; missing: {sorted(missing)}"
            )
        if any(w <= 0 for w in weights.values()):
            raise ValueError("weights must be strictly positive")
    n = dict(sizes or {})
    for name, df in sources.items():
        if name not in n:
            n[name] = df.count()
        if n[name] <= 0:
            raise ValueError(f"source {name!r} is empty")
    p = {s: float(weights[s]) if weights else float(n[s]) for s in sources}
    q_raw = {s: v**alpha for s, v in p.items()}
    z = sum(q_raw.values())
    q = {s: v / z for s, v in q_raw.items()}
    total = min(n[s] / q[s] for s in sources)
    report: dict[str, dict] = {}
    parts = []
    for name, df in sources.items():
        frac = min(1.0, q[name] * total / n[name])
        report[name] = {
            "n": n[name],
            "share": round(q[name], 6),
            "fraction": round(frac, 6),
            "target": int(round(q[name] * total)),
        }
        sample = (
            df
            if frac >= 1.0
            else hash_fraction_sample(df, id_col, frac, salt=salt)
        )
        parts.append(sample.withColumn("source", F.lit(name)))
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out, report
