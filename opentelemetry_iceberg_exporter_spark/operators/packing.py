"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget training sequences.

Two packers, matching the two shapes real pipelines use:

* `pack_concat_chunks` — the GPT-style "concatenate the corpus in a
  deterministic order, then cut every `budget` tokens" packing.
  Documents may SPAN chunk boundaries; the operator computes each
  document's global token offset and the chunk range it lands in.
  Scale shape: one range shuffle to impose the global order, then a
  PARTITION-LOCAL window cumsum + a driver-side prefix-offset table
  (one row per partition) broadcast back — the classic two-pass
  distributed prefix sum. No global single-partition window anywhere,
  so the plan survives a corpus of any size.

* `pack_first_fit` — bin packing proper (documents never split):
  first-fit-decreasing inside deterministic hash shards via ONE
  applyInPandas. Shard-local FFD is the scale-correct choice — global
  first-fit is inherently sequential — and makes the result invariant
  to cluster partitioning (shards are VALUES, not partitions). FFD
  guarantees ≤ 11/9·OPT + 1 bins per shard, so the fill ratio stays
  within ~22% of optimal at any scale.

No reference counterpart (the reference is an OTLP exporter); this is
part of the LLM-pipeline extension surface (BASELINE.json north star).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import md5_hash64

# local bin ids pack into (shard << _BIN_BITS) | local_bin; 2^34 bins
# per shard is unreachable (a shard would need > 2^34 documents)
_BIN_BITS = 34


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: order documents deterministically
    (by `order_col`, or by md5-hash of the id — a stable corpus
    shuffle), lay them end to end, and cut sequences every `budget`
    tokens. Returns one row per document:

      (id, n_tokens, start_offset, first_seq, last_seq)

    where `first_seq`/`last_seq` are the chunk indices the document's
    first/last token fall in (equal unless the document spans a cut).
    Zero-token documents sit at their offset's chunk.

    Distributed shape: repartitionByRange on the order key (one
    shuffle), partition-local running sums (window partitioned by the
    physical partition id — never a global window), and a one-row-per-
    partition offset table computed driver-side and joined back as a
    broadcast. Deterministic for a fixed `num_partitions` (defaults to
    the session shuffle parallelism): range boundaries move with the
    partition count, but the GLOBAL offsets they produce do not —
    output is partitioning-invariant.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    key: Column = (
        F.col(order_col)
        if order_col is not None
        else md5_hash64(F.col(id_col).cast("string"))
    )
    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ordered = (
        df.select(
            F.col(id_col),
            F.col(tokens_col).cast("long").alias("n_tokens"),
            key.alias("__k"),
        )
        .repartitionByRange(int(n_parts), F.col("__k"), F.col(id_col))
        .sortWithinPartitions("__k", id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("__k", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ordered.withColumn("__cum", F.sum("n_tokens").over(w)).localCheckpoint()
    # one row per partition -> prefix offsets on the driver (bounded by
    # the partition count, never by data size)
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.max("__cum").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_col = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
            ),
            F.col("__pid"),
        )
        if offsets
        else F.lit(0),
        F.lit(0),
    )
    start = (offset_col + F.col("__cum") - F.col("n_tokens")).alias("start_offset")
    out = local.select(
        F.col(id_col),
        F.col("n_tokens"),
        start,
    )
    last_tok = F.col("start_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    return out.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {budget}").alias("first_seq"),
        last_tok.cast("long").alias("__last")
        ,
    ).select(
        id_col,
        "n_tokens",
        "start_offset",
        "first_seq",
        F.expr(f"__last div {budget}").alias("last_seq"),
    )


def duck_concat_chunks_sql(
    table: str, id_col: str, tokens_col: str, budget: int
) -> str:
    """DuckDB mirror of pack_concat_chunks (hash order): a GLOBAL
    window cumsum — fine for an oracle, the thing the distributed
    version deliberately avoids."""
    return f"""
        WITH ordered AS (
          SELECT {id_col},
                 CAST({tokens_col} AS BIGINT) AS n_tokens,
                 ('0x' || substring(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT AS k
          FROM {table}
        ),
        c AS (
          SELECT {id_col}, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   ORDER BY k, {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS start_offset
          FROM ordered
        )
        SELECT {id_col}, n_tokens, start_offset,
               start_offset // {budget} AS first_seq,
               (start_offset + GREATEST(n_tokens - 1, 0)) // {budget} AS last_seq
        FROM c
    """


def pack_first_fit(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_shards: int = 64,
) -> DataFrame:
    """First-fit-decreasing bin packing (documents never split):

      (id, n_tokens, bin_id, overflow)

    Documents hash-shard by id (`num_shards` VALUES — invariant to
    cluster partitioning), each shard packs independently with FFD
    (sort by tokens desc, id; place each doc in the first bin it
    fits). A document larger than the budget gets a bin of its own
    with overflow=true (callers truncate or split upstream). bin_id =
    shard * 2^34 + shard-local bin — globally unique, deterministic.

    One shuffle (the applyInPandas grouping); shard state is O(bins in
    the shard). FFD's 11/9·OPT + 1 bound holds per shard, so total
    bins stay within ~22% + num_shards of optimal."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not 1 <= num_shards <= 1 << 20:
        raise ValueError(f"num_shards out of range: {num_shards}")

    shard = F.pmod(
        md5_hash64(F.col(id_col).cast("string")), F.lit(num_shards)
    ).alias("__shard")
    src = df.select(F.col(id_col), F.col(tokens_col).cast("long").alias("n_tokens"), shard)
    id_type = src.schema[id_col].dataType.simpleString()
    budget_ = int(budget)

    def pack(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            s = int(pdf["__shard"].iloc[0])
            pdf = pdf.sort_values(
                ["n_tokens", id_col], ascending=[False, True]
            ).reset_index(drop=True)
            bin_loads: list[int] = []
            assigned: list[int] = []
            overflow: list[bool] = []
            for t in pdf["n_tokens"]:
                t = int(t)
                if t > budget_:
                    assigned.append(len(bin_loads))
                    bin_loads.append(t)
                    overflow.append(True)
                    continue
                for b, load in enumerate(bin_loads):
                    if load + t <= budget_:
                        assigned.append(b)
                        bin_loads[b] = load + t
                        break
                else:
                    assigned.append(len(bin_loads))
                    bin_loads.append(t)
                overflow.append(False)
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": pdf["n_tokens"],
                    "bin_id": [(s << _BIN_BITS) | b for b in assigned],
                    "overflow": overflow,
                }
            )
            yield out

    return src.groupBy("__shard").applyInPandas(
        pack,
        schema=f"{id_col} {id_type}, n_tokens long, bin_id long, overflow boolean",
    )
