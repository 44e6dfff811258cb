"""Incremental exact-substring deduplication: excise every >= k-char
substring of a NEW batch that already exists in the ingested corpus —
without re-reading corpus text — plus the within-batch ExactSubstr
pass, keeping one canonical copy of every duplicated region across the
corpus's whole history.

The incremental sibling of operators/substring_dedup.py, built the way
incremental_dedup.py builds on dedup.py: an Iceberg table (either
catalog transport) persists the corpus's K-GRAM ANCHOR INDEX — one row
per distinct (content-sampled) k-gram hash with its canonical
occurrence (doc_id, pos). Per ingested batch the cost is

  * O(batch chars / stride) map-side gram math (the one-shot
    operator's plan, batch-only),
  * ONE equi-join of the batch's grams against the index on the gram
    hash — uniform md5 keys, no skew, output LINEAR in batch grams
    (grams join the index's one-row-per-hash side, never each other),
  * the within-batch duplicate aggregate over index-miss grams only,
  * one O(new grams) atomic index append.

State is the honest price of incremental exact-substring memory: any
scheme that can answer "has this substring appeared before?" must
remember O(corpus content / stride) anchors — `stride` is the
storage/recall knob (content-sampled like the one-shot operator, so
copies anchor identically; at stride 64 a petabyte-scale corpus keeps
~chars/64 index rows). The index inherits the commit protocol:
appends are atomic snapshots, a crashed ingest REPLAYED later finds
its canonical grams already indexed under its own (doc_id, pos) and
re-emits byte-identical output while appending nothing (exactly-once
effect), and `read_index(snapshot_id)` reproduces any historical
excision decision. Single-writer per corpus is assumed (same as the
LSH index); a racing double-insert of one hash is tolerated on read
(min-canonical per hash) but wastes index rows.

The reference has no incremental counterpart; this is LLM-pipeline
extension surface (Lee et al. 2022, arXiv:2107.06499 — ExactSubstr).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .substring_dedup import (
    DEFAULT_K,
    apply_span_strip,
    kgram_occurrences,
    merge_positions_to_spans,
)

# one row per distinct (content-sampled) k-gram: its canonical owner
INDEX_SCHEMA = StructType(
    [
        StructField("h", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("pos", LongType(), False),
    ]
)

# bucket the index on the hash: bounded write fan-out per append and
# point-lookup debuggability; the ingest join is a full shuffle
# equi-join — correct at scale because md5 keys are uniform
INDEX_PARTITION_BY = [("h", "bucket[8]")]


def create_substr_index_table(catalog, namespace: str, name: str):
    """Create-if-absent the k-gram anchor index on either transport."""
    if hasattr(catalog, "ensure_table"):  # REST client
        catalog.ensure_namespace(namespace)
        return catalog.ensure_table(
            namespace, name, INDEX_SCHEMA, partition_by=INDEX_PARTITION_BY
        )
    return catalog.create_table(
        namespace, name, INDEX_SCHEMA, partition_by=INDEX_PARTITION_BY
    )


@dataclass
class SubstrIngestResult:
    """Outcome of one batch ingest."""

    output: DataFrame  # batch + text_deduped, spans_removed, chars_removed
    snapshot_id: int | None  # index snapshot committed (None: no new grams)
    docs: int
    trimmed_docs: int  # docs that lost at least one span
    new_grams: int  # index rows appended


class IncrementalSubstrDeduper:
    """Stateful exact-substring filter over a catalog-backed k-gram
    anchor index. ``table`` is an FsTable or RestTable with
    INDEX_SCHEMA (see create_substr_index_table). All state lives in
    the table; instances are disposable."""

    def __init__(
        self,
        table,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = DEFAULT_K,
        stride: int = 1,
    ):
        self.table = table
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.stride = stride

    def read_index(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        """The anchor index (time-travelable — reproduce a historical
        excision decision by pinning the snapshot)."""
        return self.table.read(spark, snapshot_id=snapshot_id)

    def ingest(
        self,
        spark: SparkSession,
        batch: DataFrame,
        snapshot_properties: dict[str, str] | None = None,
    ) -> SubstrIngestResult:
        """One batch: excise corpus-known substrings (canonical owner
        elsewhere), run within-batch ExactSubstr on the rest, append
        the batch's new canonical grams atomically, return the batch
        with `text_deduped` + per-doc trim stats. ``batch`` must carry
        unique ids — CAST TO STRING on output (the index schema
        type, same contract as IncrementalDeduper). Replays are
        byte-identical no-ops on the index."""
        id_col, text_col = self.id_col, self.text_col
        batch = batch.withColumn(id_col, F.col(id_col).cast("string"))
        grams = kgram_occurrences(
            batch, id_col, text_col, self.k, self.stride
        ).localCheckpoint(eager=False)

        # min-canonical per hash tolerates racing double-inserts
        idx = (
            self.read_index(spark)
            .groupBy("h")
            .agg(F.min(F.struct("doc_id", "pos")).alias("__canon"))
        )
        g = grams.join(idx, "h", "left").localCheckpoint(eager=False)

        # corpus-known grams whose canonical is NOT this occurrence:
        # excise (a replayed doc hits its OWN canonical -> untouched)
        excise_corpus = g.filter(
            F.col("__canon").isNotNull()
            & ~(
                (F.col("__canon.doc_id") == F.col("doc_id"))
                & (F.col("__canon.pos") == F.col("pos"))
            )
        ).select("doc_id", "pos")

        # index-miss grams: the within-batch ExactSubstr aggregate
        fresh = g.filter(F.col("__canon").isNull()).select("doc_id", "pos", "h")
        batch_canon = fresh.groupBy("h").agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct("doc_id", "pos")).alias("__bc"),
        ).localCheckpoint(eager=False)
        excise_batch = (
            fresh.join(batch_canon.filter(F.col("__n") >= 2), "h")
            .filter(
                ~(
                    (F.col("__bc.doc_id") == F.col("doc_id"))
                    & (F.col("__bc.pos") == F.col("pos"))
                )
            )
            .select("doc_id", "pos")
        )

        spans = merge_positions_to_spans(
            excise_corpus.unionByName(excise_batch), self.k
        ).localCheckpoint(eager=False)
        stripped = apply_span_strip(batch, id_col, text_col, spans, "text_deduped")
        stats = spans.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("spans_removed"),
            F.sum(F.col("span_end") - F.col("span_start")).alias("chars_removed"),
        ).withColumnRenamed("doc_id", "__st_doc")
        output = (
            stripped.join(stats, stripped[id_col] == stats["__st_doc"], "left")
            .drop("__st_doc")
            .withColumn("spans_removed", F.coalesce("spans_removed", F.lit(0)))
            .withColumn("chars_removed", F.coalesce("chars_removed", F.lit(0)))
        )

        # every index-miss gram enters the index under its BATCH
        # canonical (new docs own their regions; replays miss nothing)
        new_rows = batch_canon.select(
            "h",
            F.col("__bc.doc_id").alias("doc_id"),
            F.col("__bc.pos").alias("pos"),
        )
        props = {"operation-detail": "substr-index-ingest"}
        props.update(snapshot_properties or {})
        snapshot_id = self.table.append_dataframe(new_rows, props)
        new_grams = (
            0
            if snapshot_id is None
            else int(
                next(
                    s
                    for s in self.table.metadata()["snapshots"]
                    if s["snapshot-id"] == snapshot_id
                )["summary"]["added-records"]
            )
        )
        return SubstrIngestResult(
            output=output,
            snapshot_id=snapshot_id,
            docs=batch.count(),
            trimmed_docs=stats.count(),
            new_grams=new_grams,
        )


def substr_tail(
    spark: SparkSession,
    source_table,
    deduper: IncrementalSubstrDeduper,
    checkpoint_path: str,
    on_batch=None,
    max_files_per_batch: int | None = None,
) -> list[SubstrIngestResult]:
    """Continuous exact-substring dedup: drain everything currently
    committed to ``source_table`` (a documents table other writers
    append to) through the ingester, one ingest per tailed micro-batch
    — the substring sibling of incremental_dedup.dedup_tail.

    Exactly-once composition: the tailer commits its cursor only AFTER
    ingest returns; a replayed ingest (crash between index append and
    cursor commit) finds its anchors already indexed and re-emits
    byte-identical output while appending nothing. ``on_batch(df,
    result)`` (optional) receives each batch's rows + trimmed output,
    e.g. to append the cleaned text to a curated-corpus table.
    """
    from ..streaming.iceberg_tail import IcebergTailer

    tailer = IcebergTailer(
        source_table, checkpoint_path, max_files_per_batch=max_files_per_batch
    )
    results: list[SubstrIngestResult] = []

    def handle(df: DataFrame, batch) -> None:
        res = deduper.ingest(
            spark,
            df,
            snapshot_properties={
                "substr-source-snapshot": str(batch.end_snapshot_id)
            },
        )
        results.append(res)
        if on_batch is not None:
            on_batch(df, res)

    tailer.process_available(spark, handle)
    return results
