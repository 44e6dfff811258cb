"""Raw-Parquet sink (catalog: none mode) — K2.

Reference parity (writer.go:174-253, internal/iceberg/partition.go:139-185,
internal/arrow/parquet.go:140-199):
* Hive-style partition paths `{base}/{table}/data/year=YYYY/month=MM
  [/day=DD[/hour=HH]]/...` — granularity controls depth, timezone applied
  before deriving partition values (partition.go:155-185).
* Codec selection snappy/gzip/zstd/none (parquet.go:144-156); dictionary
  encoding is Spark's parquet default (parquet.go:159-163).
* Rows with NULL partition timestamp are DROPPED, matching the
  reference's no-catalog semantics (partition.go:87-90, F4 — documented
  data loss).
* The epoch-hour SplitByPartition shuffle (R1, partition.go:48-148)
  dissolves into `repartition(partition_cols)` + `partitionBy` write:
  Catalyst moves the rows, the committer creates the Hive directories.

Scale notes (100 TB): repartitioning by the partition columns gives one
task per (hour) group so each partition directory receives few, large
files instead of one file per input task per hour — the reference's
small-files anti-pattern (one file per 512-row batch per hour) is NOT
reproduced. AQE coalesces the post-shuffle partitions when hours are
small; skewed hours split via AQE skew handling. For extreme fan-out a
`max_files_per_partition` knob can salt the repartition key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schemas as S
from ..config import ExporterConfig

_GRANULARITY_DEPTH = {"monthly": 2, "daily": 3, "hourly": 4}
_PART_FIELDS = ("year", "month", "day", "hour")
_PART_FORMATS = ("yyyy", "MM", "dd", "HH")


def partition_value_columns(
    ts: Column, granularity: str = "hourly", timezone: str = "UTC"
) -> list[tuple[str, Column]]:
    """Derive the Hive partition-value columns from the signal timestamp.

    Timezone is applied before formatting (partition.go:160-163 uses
    time.In(loc)); values are zero-padded strings, matching the
    reference's %04d/%02d path rendering (partition.go:169-180).

    `ts` must be an instant (TIMESTAMP_LTZ, what load_table/flatten
    produce). The instant is lowered to epoch micros (unix_micros is
    session-tz-independent), rebuilt as the UTC wall clock on a
    TIMESTAMP_NTZ epoch, then converted UTC->target zone; date_format on
    NTZ renders that wall clock verbatim. This avoids
    convert_timezone(None, tz, ltz), whose implicit LTZ->NTZ cast
    round-trips through the SESSION zone's wall clock and picks one
    offset in a DST fall-back fold — partition values here never depend
    on spark.sql.session.timeZone, fold instants included.
    """
    depth = _GRANULARITY_DEPTH[granularity]
    utc_wall = F.timestamp_add(
        "MICROSECOND", F.unix_micros(ts), F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    )
    local = F.convert_timezone(F.lit("UTC"), F.lit(timezone), utc_wall)
    return [
        (name, F.date_format(local, fmt))
        for name, fmt in zip(_PART_FIELDS[:depth], _PART_FORMATS[:depth])
    ]


@dataclass
class WriteResult:
    table: str
    path: str
    partition_fields: list[str]


def write_raw_parquet(
    df: DataFrame,
    signal: str,
    config: ExporterConfig,
    *,
    coalesce_output: bool = True,
) -> WriteResult:
    """Append a flattened signal DataFrame to the Hive-partitioned
    Parquet layout (writer.go:174-253).

    Returns the write target; the write itself is eager (Spark action).
    """
    table = S.table_name(
        signal,
        prefix=config.catalog.table_prefix,
        overrides=config.catalog.table_overrides,
    )
    ts_name = S.partition_column(signal)
    path = f"{config.storage.base_uri}/{table}/data"

    parts = partition_value_columns(
        F.col(f"`{ts_name}`"),
        config.partition.granularity,
        config.partition.timezone,
    )
    part_names = [n for n, _ in parts]

    out = df.filter(F.col(f"`{ts_name}`").isNotNull())  # F4: NULL ts dropped
    for name, col in parts:
        out = out.withColumn(name, col)
    if coalesce_output:
        # co-locate each partition's rows -> few large files per hour dir
        out = out.repartition(*[F.col(n) for n in part_names])

    (
        out.write.mode("append")
        .option("compression", _spark_codec(config.storage.compression))
        .partitionBy(*part_names)
        .parquet(path)
    )
    return WriteResult(table=table, path=path, partition_fields=part_names)


def _spark_codec(name: str) -> str:
    # fileio.go:194-201 validates the same set; Spark names match directly
    return {"none": "none", "snappy": "snappy", "gzip": "gzip", "zstd": "zstd"}[name]


def read_raw_table(spark, config: ExporterConfig, signal: str) -> DataFrame:
    """Read back a Hive-partitioned signal table (partition columns appear
    as year/month/day/hour string columns; predicate on them prunes
    directories)."""
    table = S.table_name(
        signal,
        prefix=config.catalog.table_prefix,
        overrides=config.catalog.table_overrides,
    )
    return spark.read.option("basePath", f"{config.storage.base_uri}/{table}/data").parquet(
        f"{config.storage.base_uri}/{table}/data"
    )
