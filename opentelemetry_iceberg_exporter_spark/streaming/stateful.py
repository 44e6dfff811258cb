"""Stateful streaming operators over signal streams.

The reference needs NO stateful operators: every row lands in the
partition of its own event timestamp, so late data just lands in old
partitions (partition.go:84-98; SURVEY §2.10 'streaming watermarks'
row). These operators are the aggregating extensions our engine adds on
top — watermarked tumbling-window rollups and stateful dedup — for
pipelines that want derived streams, not just raw landing.

Scale notes: watermark bounds state size (old windows evict); dedup
state is keyed by (key, event-time window) so it evicts too. Both
shuffle on the grouping key only — state lives in the state store
(RocksDB on a real cluster via spark.sql.streaming.stateStore.
providerClass), not executor heap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts with late-data tolerance `watermark`.

    Output columns: window_start, window_end, <group_cols...>, n_rows.
    """
    g = group_cols or []
    win = F.window(F.col(ts_col), window)
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(win, *[F.col(c) for c in g])
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(c) for c in g],
        "n_rows",
    )


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful exactly-one-per-key dedup within the watermark horizon
    (dropDuplicatesWithinWatermark): duplicates arriving within
    `watermark` of the first occurrence are suppressed; state evicts
    beyond it. The batch analog is dropDuplicates(key_cols)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
