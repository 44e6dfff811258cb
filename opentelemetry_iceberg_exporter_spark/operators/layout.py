"""Z-order data-layout clustering (engine extension).

Hive/Iceberg hidden partitioning prunes on ONE time dimension; real
observability scans also filter on service, trace id, duration, etc.
Z-ordering interleaves the bits of several columns into one key and
range-partitions on it, so each output file covers a small hyper-rect
of the value space — per-file min/max stats get tight on EVERY
clustered column and Parquet row-group / file skipping works for
predicates on any of them, not just the sort-leading one.

This is the layout step Delta's `OPTIMIZE ZORDER BY` and Iceberg's
sort-order rewrite perform; here it is a plain DataFrame -> DataFrame
operator usable before any sink (raw Hive writer, fs-catalog append,
compaction rewrite).

Scale shape: one tiny min/max aggregation (2 numbers per column to the
driver), then a single `repartitionByRange` shuffle on the computed
key — the same shuffle a plain sorted write would need. All bit
interleaving is Catalyst integer arithmetic inside whole-stage codegen;
no UDFs, no extra pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16  # per-column resolution; 2 cols x 16 bits = 32-bit key


def _scale_to_int(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Normalize a numeric column to [0, 2^bits) with uniform min/max
    scaling. Constant columns (hi == lo) map to 0."""
    span = hi.cast("double") - lo.cast("double")
    unit = (col.cast("double") - lo.cast("double")) / F.when(span == 0, 1.0).otherwise(span)
    max_code = F.lit((1 << bits) - 1)
    code = F.floor(unit * max_code.cast("double")).cast("bigint")
    return F.greatest(F.lit(0).cast("bigint"), F.least(code, max_code.cast("bigint")))


def zorder_key(codes: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the bit planes of pre-scaled integer codes
    (Morton/Z-curve): output bit (i*n + j) = bit i of column j."""
    n = len(codes)
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, code in enumerate(codes):
            bit = F.shiftright(code, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + j)
    return key


def _zkey(df: DataFrame, cols: list[str], bits: int) -> Column:
    """The Z-curve key for `df`'s value ranges: one tiny min/max
    aggregation (a single row to the driver), then pure codegen."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs).first()
    codes = [
        _scale_to_int(
            F.col(c),
            F.lit(bounds[f"__lo_{c}"]),
            F.lit(bounds[f"__hi_{c}"]),
            bits,
        )
        for c in cols
    ]
    return zorder_key(codes, bits)


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_files: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Return `df` range-partitioned into `num_files` partitions along
    the Z-curve of `cols` (numeric or timestamp). Writing the result
    with one file per partition yields the clustered layout.

    The only driver-side step is a single min/max aggregation over the
    clustered columns (one row); everything else is a distributed
    range shuffle."""
    return (
        df.withColumn("__zkey", _zkey(df, cols, bits))
        .repartitionByRange(num_files, F.col("__zkey"))
        .drop("__zkey")
    )


def sort_by_zorder(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> DataFrame:
    """Sort rows WITHIN each partition along the Z-curve (no shuffle).
    For a single-file write this tightens Parquet row-group min/max on
    every listed column — the intra-file complement of
    cluster_by_zorder's file-level clustering."""
    return (
        df.withColumn("__zkey", _zkey(df, cols, bits))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )


def file_stat_ranges(df: DataFrame, cols: list[str]) -> list[dict]:
    """Per-Spark-partition min/max of `cols` — the locality metric a
    file-level stats index would hold. Used by tests to quantify how
    tight the clustering makes per-file ranges."""
    from pyspark.sql.functions import spark_partition_id

    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return [r.asDict() for r in df.withColumn("__pid", spark_partition_id()).groupBy("__pid").agg(*aggs).collect()]
