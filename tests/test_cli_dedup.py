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
