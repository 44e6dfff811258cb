"""Recovery scanner: storage listing -> partition-parsed file DataFrame.

Reference parity (internal/recovery/scanner.go):
* ScanPrefix/ScanAll: list objects, keep `*.parquet` (scanner.go:47-95,
  suffix filter :66-68 = F2; directory-entry skip fileio_s3.go:106-109 =
  F5)
* partition-values extraction from `key=value` path segments
  (scanner.go:111-155 = R5) — here `regexp_extract` columns
* partitionToTime + matchesTimeFilter (scanner.go:161-226 = F3):
  `after <= partition_time < before`, files with unparseable partitions
  conservatively INCLUDED

The listing itself is driver-side (os.walk / Hadoop FS): file listings
are metadata-scale, not data-scale — the reference pages S3 listings on
one goroutine the same way (fileio_s3.go:87-126). At 100 TB the listing
source should be an S3 Inventory manifest or the Iceberg `all_files`
metadata table read as a DataFrame; everything downstream of
`listing_to_df` is already distributed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

LISTING_SCHEMA = StructType(
    [
        StructField("uri", StringType(), False),
        StructField("size", LongType(), False),
    ]
)


@dataclass(frozen=True)
class FileInfo:
    uri: str
    size: int


def list_local_files(root: str) -> list[FileInfo]:
    """Local-FS walk (fileio_local.go:54-98): every regular file under
    root, as absolute URIs."""
    out: list[FileInfo] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in sorted(filenames):
            p = os.path.join(dirpath, fn)
            out.append(FileInfo(uri=p, size=os.path.getsize(p)))
    return out


def listing_to_df(spark: SparkSession, files: list[FileInfo]) -> DataFrame:
    return spark.createDataFrame(
        [(f.uri, f.size) for f in files], LISTING_SCHEMA
    )


def scan_files(spark: SparkSession, root: str) -> DataFrame:
    """ScanAll analog: list + `*.parquet` suffix filter (F2) + partition
    parse (R5). Hidden/metadata files (`_SUCCESS`, `.crc`) fail the
    suffix filter naturally."""
    df = listing_to_df(spark, list_local_files(root))
    df = df.filter(F.col("uri").endswith(".parquet"))  # F2
    return parse_partitions(df, root)


def parse_partitions(df: DataFrame, root: str) -> DataFrame:
    """R5 (scanner.go:111-155): extract table name and year/month/day/hour
    from Hive path segments; missing segments -> NULL.

    Layout: {root}/{table}/data/year=YYYY[/month=MM[/day=DD[/hour=HH]]]/f.parquet
    """
    # Strip the root as a PLAIN prefix, not a regex (a root containing
    # regex metacharacters — '+', '(', '[' — would break the extraction),
    # and run the key=value parse on the ROOT-RELATIVE path only (a root
    # path containing 'year=...'-style segments must not leak into the
    # partition values). scanner.go:111-155 operates on the relative key.
    prefix = root.rstrip("/") + "/"
    rel = F.when(
        F.col("uri").startswith(prefix),
        F.col("uri").substr(F.lit(len(prefix) + 1), F.length("uri")),
    ).otherwise(F.col("uri"))
    seg = F.split(rel, "/")

    def part(key: str) -> F.Column:
        v = F.regexp_extract(rel, rf"(?:^|/){key}=(\d+)(?:/|$)", 1)
        return F.when(v == "", F.lit(None).cast("int")).otherwise(v.cast("int"))

    out = df.withColumns(
        {
            "table": F.element_at(seg, 1),
            "year": part("year"),
            "month": part("month"),
            "day": part("day"),
            "hour": part("hour"),
        }
    )
    # partitionToTime (scanner.go:161-195): year required; finer fields
    # default to the period start (month/day -> 1, hour -> 0)
    return out.withColumn(
        "partition_time",
        F.when(
            F.col("year").isNotNull(),
            F.make_timestamp(
                F.col("year"),
                F.coalesce(F.col("month"), F.lit(1)),
                F.coalesce(F.col("day"), F.lit(1)),
                F.coalesce(F.col("hour"), F.lit(0)),
                F.lit(0),
                F.lit(0),
            ),
        ),
    )


def apply_time_filter(
    df: DataFrame,
    after: datetime | None = None,
    before: datetime | None = None,
) -> DataFrame:
    """F3 (scanner.go:197-226): after <= partition_time < before, with
    unparseable-partition files conservatively INCLUDED (NULL keeps)."""
    cond = F.lit(True)
    if after is not None:
        cond = cond & (F.col("partition_time") >= F.lit(after))
    if before is not None:
        cond = cond & (F.col("partition_time") < F.lit(before))
    return df.filter(F.col("partition_time").isNull() | cond)
