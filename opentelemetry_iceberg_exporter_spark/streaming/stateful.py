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


def session_window_counts(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) per key — the streaming counterpart of
    the batch gaps-and-islands sessionizer (queries e09). Built-in
    F.session_window: state merges adjacent events within `gap`, evicts
    when the watermark passes session end."""
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        key_col,
        "n_events",
        "first_ts",
        "last_ts",
    )


def running_event_counts(df: DataFrame, key_col: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    running event count that survives micro-batch (and restart)
    boundaries through the state store.

    This is the (c)-tier custom-operator path from the build doctrine:
    used only because 'total-so-far per key, emitted every batch' is not
    expressible as a windowed aggregate. Arrow-batched; state is one
    int64 per key.
    """
    import pandas as pd  # noqa: PLC0415 — imported lazily for executors
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
