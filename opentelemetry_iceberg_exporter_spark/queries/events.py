"""Telemetry-style queries over the `events` stream table.

These mirror the reference's dataflow semantics on the driver's star
schema: epoch-hour partitioning (R1, partition.go:48-148), time-range
filters with conservative null handling (F3, scanner.go:197-226), JSON
attribute extraction (P4/P7), plus the stream-analytics operators the
reference lacks (windows, lag, as-of joins — SURVEY §2.10).

`ts_ns` is exact epoch-nanoseconds (see sources/tables.py); all time
bucketing is integer math on it, which is bit-identical in DuckDB via
epoch_ns(ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import epoch_micros_sql, load_table
from . import register

NS_PER_HOUR = 3_600_000_000_000


@register(
    "e01_epoch_hour_partition",
    f"""
    SELECT
      epoch_ns(ts) // {NS_PER_HOUR} AS epoch_hour,
      strftime(ts, '%Y') AS year, strftime(ts, '%m') AS month,
      strftime(ts, '%d') AS day, strftime(ts, '%H') AS hour,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="The reference's SplitByPartition (R1, partition.go:48-148) plus "
    "its Hive partition-value derivation (R3, partition.go:155-185, "
    "merged from the former o06): group rows by epoch-hour of their "
    "event timestamp and emit the zero-padded year/month/day/hour path "
    "segments the write side uses. In Spark this is a declarative "
    "groupBy — the write path gets it via partitionBy/Iceberg hours() "
    "transform.",
)
def e01_epoch_hour_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks.parquet_sink import partition_value_columns

    ev = load_table(spark, sf_dir, "events")
    # integer div — double division at epoch-ns magnitude flips hour
    # boundaries (256ns ulp at 1.7e18)
    for name, col in partition_value_columns(F.col("ts"), "hourly", "UTC"):
        ev = ev.withColumn(name, col)
    return ev.groupBy(
        F.expr(f"ts_ns div {NS_PER_HOUR}").alias("epoch_hour"),
        "year",
        "month",
        "day",
        "hour",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


# NOTE: the former e02 time-range-filter row folded into o05 (round-8
# 50-slot consolidation): apply_time_filter now runs there with REAL
# after/before bounds, observable in the orphan set — F2/F3/F5 keep a
# hard oracle signal while freeing a slot for the v3 read surfaces.


@register(
    "e03_tumbling_window",
    f"""
    SELECT
      event_type,
      (epoch_ns(ts) // {NS_PER_HOUR}) * 3600 AS window_start_epoch,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour window aggregation (F.window) — the aggregating "
    "counterpart of the reference's hour partitioner.",
)
def e03_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "n",
            "sum_value",
        )
    )


@register(
    "e04_json_props_extract",
    """
    SELECT
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON attribute extraction (reference P4/P7: attributes stored as "
    "JSON strings, queried via get_json_object).",
)
def e04_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "e05_window_frames",
    """
    SELECT event_id, user_id,
           epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
           ) AS delta_ns,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
    doc="Per-row window surface (merged e05+e06): LAG inter-event gap "
    "and frame-bounded running sum over the same per-user window spec — "
    "Spark evaluates both in a single Window operator (one shuffle, one "
    "sort). Exact decimal accumulation keeps the running sum "
    "order-deterministic.",
)
def e05_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_ns") - F.lag("ts_ns").over(w)).alias("delta_ns"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(wf).cast("double").alias("running_value"),
    )


@register(
    "e07_asof_join_last_order",
    """
    SELECT event_id, last_orderkey FROM (
      SELECT e.event_id, o.o_orderkey AS last_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY epoch_ms(o.o_orderdate) DESC, o.o_orderkey DESC
             ) AS rk
      FROM events e
      JOIN orders o
        ON o.o_custkey = e.user_id
       AND epoch_ms(o.o_orderdate) * 1000000 <= epoch_ns(e.ts)
    ) WHERE rk = 1
    """,
    doc="As-of join: for each event, the most recent order at or before "
    "the event time for that user (latest orderdate, orderkey as "
    "tiebreak). Spark composes join + ranked-window dedup; DuckDB oracle "
    "uses max_by over the same inequality join.",
)
def e07_asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    o_raw = load_table(spark, sf_dir, "orders")
    # ms-truncated epoch-ns, matching the oracle's epoch_ms(...)*1000000;
    # epoch_micros_sql keeps it session-tz-independent for NTZ orderdates
    od_ns = F.expr(
        f"(({epoch_micros_sql(o_raw, 'o_orderdate')} div 1000) * 1000000)"
    ).alias("od_ns")
    o = o_raw.select("o_custkey", "o_orderkey", od_ns)
    joined = ev.join(
        o, (o.o_custkey == ev.user_id) & (o.od_ns <= ev.ts_ns), "inner"
    )
    # argmax as max(struct(...)): lexicographic struct max == row_number
    # over (od_ns DESC, orderkey DESC) rk=1, but a groupBy aggregate gets
    # map-side partial aggregation — the join fan-out (every prior order
    # per event) collapses before the shuffle, where a ranked window
    # would shuffle the whole fan-out.
    best = F.max(F.struct(F.col("od_ns"), F.col("o_orderkey"))).alias("best")
    return (
        joined.groupBy("event_id")
        .agg(best)
        .select("event_id", F.col("best.o_orderkey").alias("last_orderkey"))
    )


@register(
    "e08_range_join_clicks_before_error",
    """
    SELECT e.event_id,
           COUNT(c.event_id) AS n_clicks_before
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id
     AND c.event_type = 'click'
     AND epoch_ns(c.ts) >= epoch_ns(e.ts) - 3600000000000
     AND epoch_ns(c.ts) <  epoch_ns(e.ts)
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
    doc="Range (interval) join: clicks by the same user in the hour "
    "preceding each error event — equi-key on user, range residual on "
    "time; Spark plans a hash join with the range as a post-filter.",
)
def e08_range_join_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts_ns").alias("e_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_ns").alias("c_ts"),
    )
    hour_ns = 3_600_000_000_000
    joined = errors.join(
        clicks,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("c_ts") >= F.col("e_ts") - F.lit(hour_ns))
        & (F.col("c_ts") < F.col("e_ts")),
        "left",
    )
    return joined.groupBy(F.col("e_id").alias("event_id")).agg(
        F.count(F.col("c_id")).alias("n_clicks_before")
    )


@register(
    "e09_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, event_id, epoch_ns(ts) AS t,
             CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 1800000000000
                  OR LAG(epoch_ns(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    ),
    sess AS (
      SELECT user_id,
             -- CAST: DuckDB window-SUM of integers is HUGEINT, which the
             -- driver's pandas path renders as float ("2.0" vs Spark "2")
             CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY t, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Sessionization (30-min inactivity gap) via gaps-and-islands — "
    "the batch equivalent of a session window; streaming variant uses "
    "F.session_window.",
)
def e09_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap_ns = 1800 * 1_000_000_000
    prev = F.lag("ts_ns").over(w)
    is_start = F.when(
        prev.isNull() | ((F.col("ts_ns") - prev) > gap_ns), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("is_start", is_start)
        .withColumn("session_id", F.sum("is_start").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "e10_salted_event_counts",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="Skew-safe two-stage aggregation: event_type has a handful of "
    "very hot keys, so stage 1 aggregates on (key, salt) — salt derived "
    "deterministically from event_id — spreading each hot key over 16 "
    "reducers; stage 2 combines the 16 partials per key. Result is "
    "identical to the direct groupBy (counts and decimal sums are "
    "associative); at 100 TB this is the salting pattern for keys too "
    "hot for AQE skew handling alone.",
)
def e10_salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n_salts = 16
    stage1 = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(n_salts)))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pc"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )
    )
    return stage1.groupBy("event_type").agg(
        F.sum("pc").alias("n_events"),
        F.sum("pv").cast("double").alias("total_value"),
    )
