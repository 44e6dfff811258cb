"""End-to-end dedup CLI (python -m ... dedup): pairs -> groups ->
parquet output, and the --keep-only canonical projection."""

from __future__ import annotations

import json

import duckdb

from opentelemetry_iceberg_exporter_spark.__main__ import main


def test_dedup_groups_output(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "groups")
    rc = main(
        [
            "dedup",
            "--input",
            f"{sf_dir}/documents.parquet",
            "--output",
            out,
            "--method",
            "minhash",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == 500
    res = duckdb.sql(
        f"SELECT COUNT(*) AS n, SUM(is_canonical::INT) AS kept,"
        f" COUNT(DISTINCT group_id) AS groups FROM '{out}/*.parquet'"
    ).fetchone()
    n, kept, groups = res
    assert n == 500
    assert kept == groups  # exactly one canonical per group
    assert kept < n  # testdata contains near-dups


def test_dedup_keep_only_preserves_schema(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "kept")
    rc = main(
        [
            "dedup",
            "--input",
            f"{sf_dir}/documents.parquet",
            "--output",
            out,
            "--method",
            "exact",
            "--keep-only",
        ]
    )
    assert rc == 0
    cols = {
        r[0]
        for r in duckdb.sql(
            f"DESCRIBE SELECT * FROM '{out}/*.parquet'"
        ).fetchall()
    }
    # keep-only emits original document rows, not the group map
    assert {"doc_id", "text", "lang", "source", "n_chars"} <= cols


def test_changes_prints_scan_end_as_checkpoint(spark, tmp_path, capsys):
    """The printed checkpoint must be the LAST snapshot the scan
    covered — with --to-snapshot it is exactly that id, and an append
    landing after the scan window must not advance it (a consumer
    checkpointing a newer id would skip the gap on its next poll)."""
    from pyspark.sql import functions as F

    from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

    df = spark.range(8).withColumn(
        "ts", F.to_timestamp(F.lit("2024-03-01 00:00:00"))
    )
    cat = FsCatalog(str(tmp_path / "wh"))
    t = cat.create_table("otel", "ev", df.schema, partition_source="ts")
    s1 = t.append_dataframe(df)
    s2 = t.append_dataframe(df)
    s3 = t.append_dataframe(df)  # newer than the requested window

    out = str(tmp_path / "changes")
    rc = main(
        [
            "changes",
            "--warehouse",
            str(tmp_path / "wh"),
            "--table",
            "ev",
            "--from-snapshot",
            str(s1),
            "--to-snapshot",
            str(s2),
            "--output",
            out,
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == 8  # only the s2 window
    assert stats["checkpoint_snapshot"] == s2  # NOT s3
