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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import md5_hash64

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
