"""PySpark-native analytics/ingest engine with the query and data-processing
capabilities of terakoya76/opentelemetry-iceberg-exporter.

Built Spark-first: DataFrame/SQL declarative plans, Catalyst optimization,
Structured Streaming for ingest, Iceberg (when jars present) or Hive-style
partitioned Parquet for storage. NOT a port of the reference Go code — the
reference defines WHAT is computed (schemas, null rules, partitioning,
recovery reconciliation semantics); the HOW is idiomatic PySpark.

Layout:
    schemas     — the 7 fixed OTel table schemas + name/partition resolution
    config      — engine configuration model (reference config.go surface)
    session     — SparkSession builder tuned for large-scale execution
    otlp        — flatten/projection transforms (OTLP nested -> 7 flat tables)
    sinks       — Iceberg catalog sink + raw-Parquet Hive-partitioned sink
    sources     — OTLP-JSON batch/stream sources, storage listing source
    recovery    — storage<->catalog reconciliation (scan, anti-join, register)
    streaming   — Structured Streaming pipeline wiring (foreachBatch demux)
    operators   — scale-out data-pipeline operators (dedup, similarity,
                  text analysis, multimodal, as-of joins)
    queries     — curated relational query surface over the exported tables
                  and the TPC-H-ish star schema used by the test harness
"""

__version__ = "0.1.0"
