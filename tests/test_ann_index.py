"""Catalog-backed incremental IVF index (operators/ann_index.py):
build/ingest/search semantics, partition-level pruning, CDC upsert
refresh, cross-session open, REST parity."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.ann_index import AnnIndex
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

DIM = 8
N_CLUSTERS = 4


def _clustered(spark, n_per=12, offset=0, spread=0.05, seed=3):
    """Well-separated clusters on coordinate axes: nearest neighbors of
    a vector are provably its own cluster's members."""
    rng = np.random.RandomState(seed)
    rows = []
    for c in range(N_CLUSTERS):
        center = np.zeros(DIM)
        center[c] = 10.0
        for i in range(n_per):
            v = center + rng.uniform(-spread, spread, DIM)
            rows.append((f"v{c}_{i + offset}", [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id string, embedding array<double>")


@pytest.fixture()
def index(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    return AnnIndex.build(
        spark, cat, "ann", "docs", _clustered(spark), k=N_CLUSTERS, max_iter=10
    ), cat


class TestBuildAndSearch:
    def test_neighbors_come_from_own_cluster(self, spark, index):
        idx, _ = index
        queries = _clustered(spark, n_per=1, offset=900, seed=9)
        res = idx.search(spark, queries, id_col="vec_id", k=5, nprobe=1)
        rows = res.collect()
        assert len(rows) == N_CLUSTERS * 5
        for r in rows:
            # query vq{c}_900 must match only v{c}_* vectors
            assert r["vec_id"].split("_")[0] == r["q_id"].split("_")[0]
            assert r["cos_sim"] > 0.99

    def test_partition_pruning_is_real(self, spark, index):
        idx, _ = index
        cells = [r["cell"] for r in
                 idx.vectors_table.read(spark).select("cell").distinct().collect()]
        assert len(cells) == N_CLUSTERS  # separated data -> one cell per cluster
        in_cell, total = idx.pruned_file_count(cells[0])
        assert 0 < in_cell < total

    def test_search_reads_only_probed_cells(self, spark, index):
        """With nprobe=1 the scan unions exactly the distinct probed
        cells' partitions — here a single cell's files."""
        idx, _ = index
        one = _clustered(spark, n_per=1, offset=901, seed=11).limit(1)
        res = idx.search(spark, one, id_col="vec_id", k=3, nprobe=1)
        assert res.count() == 3


class TestIncrementalMaintenance:
    def test_ingest_new_batch_searchable(self, spark, index):
        idx, _ = index
        idx.ingest(spark, _clustered(spark, n_per=3, offset=500, seed=21))
        queries = _clustered(spark, n_per=1, offset=902, seed=33)
        res = idx.search(spark, queries, id_col="vec_id", k=15, nprobe=1)
        found = {r["vec_id"] for r in res.collect()}
        assert any("_50" in v for v in found)  # new vectors rank in

    def test_reingest_replaces_not_duplicates(self, spark, index):
        idx, _ = index
        before = idx.vectors_table.read(spark).count()
        batch = _clustered(spark)  # same ids as the build batch
        idx.ingest(spark, batch)
        assert idx.vectors_table.read(spark).count() == before
        # and it was a single CDC snapshot, not a rewrite
        ops = [s["summary"]["operation"]
               for s in idx.vectors_table.metadata()["snapshots"]]
        assert ops.count("overwrite") >= 2  # build upsert + this one

    def test_zero_vectors_rejected(self, spark, index):
        idx, _ = index
        z = spark.createDataFrame(
            [("zero", [0.0] * DIM)], "vec_id string, embedding array<double>"
        )
        before = idx.vectors_table.read(spark).count()
        idx.ingest(spark, z)
        assert idx.vectors_table.read(spark).count() == before

    def test_build_twice_refuses(self, spark, index):
        """A second build under the same name would append a duplicate
        codebook (same cell ids twice) — it must refuse instead."""
        idx, cat = index
        with pytest.raises(ValueError, match="already exists"):
            AnnIndex.build(
                spark, cat, "ann", "docs", _clustered(spark, n_per=2),
                k=N_CLUSTERS,
            )
        assert idx.centroids_table.read(spark).count() == N_CLUSTERS

    def test_open_from_catalog(self, spark, index):
        idx, cat = index
        reopened = AnnIndex.open(cat, "ann", "docs")
        q = _clustered(spark, n_per=1, offset=903, seed=44)
        assert reopened.search(spark, q, id_col="vec_id", k=2).count() == (
            N_CLUSTERS * 2
        )

    def test_empty_query_batch(self, spark, index):
        idx, _ = index
        empty = spark.createDataFrame(
            [], "vec_id string, embedding array<double>"
        )
        assert idx.search(spark, empty, id_col="vec_id").count() == 0


@pytest.mark.slow
class TestCli:
    def test_build_ingest_search_cli(self, spark, tmp_path, capsys):
        import duckdb
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        wh = str(tmp_path / "wh")
        base = str(tmp_path / "base")
        _clustered(spark).write.parquet(base)
        rc = main(
            ["ann-build", "--warehouse", wh, "--input", base,
             "--k", str(N_CLUSTERS)]
        )
        assert rc == 0
        b = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert b["vectors"] == N_CLUSTERS * 12

        newb = str(tmp_path / "new")
        _clustered(spark, n_per=2, offset=600, seed=8).write.parquet(newb)
        assert main(["ann-ingest", "--warehouse", wh, "--input", newb]) == 0
        capsys.readouterr()

        qs = str(tmp_path / "q")
        _clustered(spark, n_per=1, offset=905, seed=77).write.parquet(qs)
        out = str(tmp_path / "res")
        rc = main(
            ["ann-search", "--warehouse", wh, "--input", qs,
             "--output", out, "--k", "3", "--nprobe", "1"]
        )
        assert rc == 0
        assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == N_CLUSTERS * 3
        rows = duckdb.sql(f"SELECT q_id, vec_id FROM '{out}/*.parquet'").fetchall()
        assert all(v.split("_")[0] == q.split("_")[0] for q, v in rows)


@pytest.mark.slow
class TestRestParity:
    def test_build_ingest_search_over_rest(self, spark, tmp_path):
        from rest_stub import make_server
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            cat = RestCatalogClient(uri, warehouse=warehouse)
            idx = AnnIndex.build(
                spark, cat, "ann", "docs", _clustered(spark, n_per=6),
                k=N_CLUSTERS, max_iter=8,
            )
            idx.ingest(spark, _clustered(spark, n_per=2, offset=700, seed=5))
            q = _clustered(spark, n_per=1, offset=904, seed=55)
            rows = idx.search(spark, q, id_col="vec_id", k=3, nprobe=1).collect()
            assert len(rows) == N_CLUSTERS * 3
            for r in rows:
                assert r["vec_id"].split("_")[0] == r["q_id"].split("_")[0]
        finally:
            server.shutdown()
