"""Bucketed-table support: shuffle-free co-located joins at scale.

The reference executes one stream at a time and never joins two large
tables, so it has no bucketing concept. This engine's query surface does
(orders x lineitem, customer x orders, repeated per pipeline run), and at
100 TB the dominant cost of every such join is the shuffle of both fact
tables onto the join key. Spark's answer is bucketing: write each table
pre-hash-partitioned (and optionally sorted) on the join key; a
SortMergeJoin between two tables bucketed the same way then reads
bucket i against bucket i directly -- zero Exchange in the plan, on every
query, forever after the one-time write.

Design notes for the 1000-executor case:
- Bucket counts must MATCH (or one divide the other with
  spark.sql.bucketing.coalesceBucketsInJoin.enabled) for the co-located
  path to kick in. Pick a count sized so one bucket of the LARGEST
  bucketed table fits an executor core's working memory (e.g. 100 TB
  lineitem / 8192 buckets ~ 12 GB per bucket pre-pruning -- combine with
  partitionBy(date) so a day's bucket is ~35 GB/day/8192 ~ MBs).
- sortBy on the join key makes the merge phase sort-free too: Spark
  reads each bucket pre-sorted and skips the per-task Sort.
- Bucket pruning: equality filters on the bucket column prune to a
  single bucket per scan (1/N of the IO) -- free secondary index.
- bucketBy requires saveAsTable (the bucket metadata lives in the
  catalog, not the files); plain .parquet(path) writes cannot carry it.

Reference provenance: no counterpart (the closest is the fixed
hash-by-partition fan-out in internal/processor/partition.go, which
splits one batch, not a persistent table layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = DEFAULT_BUCKETS,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed parquet table.

    One-time shuffle now; every future join/aggregation on bucket_cols is
    Exchange-free. sort_cols defaults to bucket_cols so merge joins skip
    their Sort as well.
    """
    sort_cols = sort_cols or bucket_cols
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def bucketed_join_session_confs(spark: SparkSession) -> None:
    """Confs that keep the co-located path reachable.

    - disable broadcast-over-bucketed preference is NOT needed: broadcast
      still wins for small sides, which is correct;
    - coalesceBucketsInJoin lets a 4096-bucket table join a 8192-bucket
      table without a shuffle (reads 2 buckets per task on the smaller).

    Caveat: autoBucketedScan=true also DISABLES bucketed reading (and
    with it bucket pruning) for scans where no operator exploits the
    distribution — a filter-only point lookup reads all buckets. Flip it
    to false for point-lookup-heavy workloads to keep the
    SelectedBucketsCount pruning (pinned by
    test_bucket_pruning_on_equality_filter).
    """
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | list[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    `on` is either common column names or (left_name, right_name) pairs
    for differently-named keys. With matching bucket specs the physical
    plan is SortMergeJoin with NO Exchange on either side (and no Sort
    when both are sortBy'd on the key) -- the plan contract
    test_bucketed_join_has_no_shuffle pins exactly this shape.
    """
    bucketed_join_session_confs(spark)
    left = spark.table(left_table)
    right = spark.table(right_table)
    if on and isinstance(on[0], tuple):
        cond = None
        for lname, rname in on:  # type: ignore[misc]
            c = left[lname] == right[rname]
            cond = c if cond is None else cond & c
        return left.join(right, on=cond, how=how)
    return left.join(right, on=list(on), how=how)  # type: ignore[arg-type]
