"""SemDeDup semantic deduplication (operators/semdedup.py): correctness
against a hand-checkable clustered corpus and an in-test numpy
reference, threshold semantics, zero-vector tolerance, partitioning
invariance, and the no-product plan contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.semdedup import (
    semdedup,
    semdedup_pairs,
)


def _corpus(spark, partitions=4):
    """Three well-separated direction clusters in R^4. Cluster A holds a
    trio of near-identical vectors (semantic dupes) plus one distinct
    member; B holds a near-identical pair; C is a singleton. Vector 36
    is zero (must be tolerated, never paired).

    The doc ids are CHOSEN for kmeans_fit's deterministic md5-min init:
    among these ids the three smallest hashes are 27 (cluster A),
    63 (B), 60 (C) — one seed per true cluster, so Lloyd's converges to
    the geometric clustering instead of a seed-placement-dependent
    fixpoint (k-means is local; a tiny corpus seeded with two points of
    the same dupe pair would legitimately keep them in separate cells —
    the boundary-loss trade the SemDeDup paper accepts)."""
    rows = [
        (6, [10.0, 0.1, 0.0, 0.0]),    # A dupe group {6, 27, 33}
        (27, [10.1, 0.1, 0.05, 0.0]),
        (33, [9.9, 0.12, 0.0, 0.01]),
        (43, [7.0, 2.5, 0.0, 0.0]),    # A, distinct direction
        (63, [0.0, 10.0, 0.2, 0.0]),   # B dupe group {63, 69}
        (69, [0.0, 9.8, 0.21, 0.0]),
        (60, [0.0, 0.0, 0.0, 12.0]),   # C singleton
        (36, [0.0, 0.0, 0.0, 0.0]),    # zero vector
    ]
    return spark.createDataFrame(rows, "doc_id long, embedding array<double>").repartition(
        partitions
    )


def _numpy_pairs(rows, cells, threshold):
    """In-test reference: exact within-cell cosine pairs."""
    out = set()
    vecs = dict(rows)
    for a in vecs:
        for b in vecs:
            if a < b and cells[a] == cells[b]:
                va, vb = np.array(vecs[a]), np.array(vecs[b])
                cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                if round(cos, 6) >= threshold:
                    out.add((a, b))
    return out


class TestSemDedup:
    def test_groups_on_clustered_corpus(self, spark):
        got = semdedup(_corpus(spark), "doc_id", "embedding", k=3, threshold=0.97)
        by_id = {r["doc_id"]: r for r in got.collect()}
        assert len(by_id) == 8  # every document annotated, zero vector included
        # the trio collapses to one group, canonical = min id
        assert {by_id[i]["group_id"] for i in (6, 27, 33)} == {6}
        assert by_id[6]["is_canonical"] and not by_id[27]["is_canonical"]
        assert by_id[6]["group_size"] == 3
        # the pair
        assert by_id[63]["group_id"] == by_id[69]["group_id"] == 63
        # distinct-direction and singleton and zero-vector docs survive alone
        for i in (43, 60, 36):
            assert by_id[i]["group_id"] == i and by_id[i]["group_size"] == 1
        # keep set = canonical rows only
        keep = {r["doc_id"] for r in got.filter("is_canonical").collect()}
        assert keep == {6, 43, 63, 60, 36}

    def test_pairs_match_numpy_reference(self, spark):
        df = _corpus(spark)
        pairs = semdedup_pairs(df, "doc_id", "embedding", k=3, threshold=0.97)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        # recover the trained cell assignment through the pair graph is
        # circular; instead assert against the GEOMETRY: the three
        # direction clusters are separated far beyond any k=3 k-means
        # ambiguity, so within-cluster is exactly within-direction
        rows = [(r["doc_id"], r["embedding"]) for r in df.collect()]
        cells = {6: 0, 27: 0, 33: 0, 43: 0, 63: 1, 69: 1, 60: 2, 36: -1}
        assert got == _numpy_pairs(rows, cells, 0.97)
        assert got == {(6, 27), (6, 33), (27, 33), (63, 69)}

    def test_threshold_monotone(self, spark):
        df = _corpus(spark)
        loose = semdedup_pairs(df, "doc_id", "embedding", k=3, threshold=0.5)
        tight = semdedup_pairs(df, "doc_id", "embedding", k=3, threshold=0.999990)
        # loose admits the trio (3), the distinct-direction member's
        # pairs (3, cos ~0.945), and the B pair: 7 candidates
        assert loose.count() == 7
        # 0.999990 keeps only the two sharpest near-identicals
        # (6-33 at 0.999997, 63-69 at 0.999999)
        assert {(r["id_a"], r["id_b"]) for r in tight.collect()} == {
            (6, 33),
            (63, 69),
        }

    @pytest.mark.slow
    def test_partitioning_invariance(self, spark):
        a = semdedup(_corpus(spark, partitions=1), "doc_id", "embedding", k=3)
        b = semdedup(_corpus(spark, partitions=7), "doc_id", "embedding", k=3)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_no_product_in_pair_plan(self, spark):
        """The candidate join is an equi-join on the trained cell —
        never a cartesian/nested-loop product (the 100 TB contract)."""
        plan = semdedup_pairs(
            _corpus(spark), "doc_id", "embedding", k=3
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ids_can_be_strings(self, spark):
        # k=1 (one cell = all candidate pairs) so grouping is seed-
        # placement-independent — string ids hash differently, and this
        # test is about the id dtype, not k-means geometry
        df = _corpus(spark).select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
            "embedding",
        )
        got = semdedup(df, "doc_id", "embedding", k=1)
        by_id = {r["doc_id"]: r["group_id"] for r in got.collect()}
        assert by_id["doc-27"] == "doc-27" and by_id["doc-33"] == "doc-27"
        assert by_id["doc-6"] == "doc-27"  # lexicographic min of the trio
        assert by_id["doc-36"] == "doc-36"


class TestSemDedupCli:
    def test_cli_keep_only(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        src = str(tmp_path / "docs")
        _corpus(spark).write.parquet(src)
        out = str(tmp_path / "out")
        rc = main(
            [
                "semdedup",
                "--input", src,
                "--output", out,
                "--id-col", "doc_id",
                "--vec-col", "embedding",
                "--k", "3",
                "--threshold", "0.97",
                "--keep-only",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["rows"] == 5  # 8 docs, trio -> 1, pair -> 1
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept == {6, 43, 63, 60, 36}


class TestSampleFit:
    """fit_fraction: Lloyd's trains on a deterministic hash sample, the
    full corpus is assigned once (r10 verdict ask #4 — the scale knob
    for the full-corpus-per-iteration constant)."""

    @staticmethod
    def _big_corpus(spark, n=360):
        """Three well-separated direction clusters with deterministic
        within-cluster jitter. k-means is LOCAL: equality between the
        full fit and the sample fit holds only when both inits seed one
        point per true cluster, so cluster membership is chosen (same
        trick as _corpus, computed instead of hand-picked) such that
        the 3 smallest md5 init hashes over ALL ids AND over the
        hash-sampled subset each land in three distinct clusters."""
        import hashlib
        from itertools import permutations

        def h(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        ids = list(range(n))
        full3 = sorted(ids, key=lambda i: (h(str(i)), i))[:3]
        sampled = [i for i in ids if h(f"{i}kmeans-fit") % 10_000 < 5_000]
        samp3 = sorted(sampled, key=lambda i: (h(str(i)), i))[:3]
        # one consistent cluster assignment putting each seed triple in
        # three distinct clusters (brute force over 3!x3!)
        cluster_of = None
        for pf in permutations(range(3)):
            for ps in permutations(range(3)):
                m: dict[int, int] = {}
                ok = True
                for i, c in list(zip(full3, pf)) + list(zip(samp3, ps)):
                    if m.setdefault(i, c) != c:
                        ok = False
                        break
                if ok and len(set(m.values())) == 3:
                    cluster_of = m
                    break
            if cluster_of:
                break
        assert cluster_of is not None
        centers = [
            [10.0, 0.1, 0.0, 0.0],
            [0.0, 10.0, 0.2, 0.0],
            [0.0, 0.0, 0.0, 12.0],
        ]
        rows = []
        for i in ids:
            c = cluster_of.get(i, i % 3)
            eps = ((i * 37 + c * 11) % 23) / 1000.0  # deterministic
            vec = [
                x + (eps if d == (i % 4) else 0.0)
                for d, x in enumerate(centers[c])
            ]
            rows.append((i, vec))
        return spark.createDataFrame(
            rows, "doc_id long, embedding array<double>"
        ).repartition(5)

    def test_sample_fit_same_groups_as_full_fit(self, spark):
        df = self._big_corpus(spark)
        full = semdedup(df, "doc_id", "embedding", k=3, threshold=0.99)
        sampled = semdedup(
            df, "doc_id", "embedding", k=3, threshold=0.99, fit_fraction=0.5
        )
        f = {(r["doc_id"], r["group_id"], r["is_canonical"]) for r in full.collect()}
        s = {(r["doc_id"], r["group_id"], r["is_canonical"]) for r in sampled.collect()}
        assert f == s

    def test_tiny_corpus_falls_back_to_full_fit(self, spark):
        """Below 10*k sampled points the sample would under-determine k
        means; kmeans_fit silently trains on everything, so groups on
        the original 8-doc geometry corpus are unchanged."""
        full = semdedup(_corpus(spark), "doc_id", "embedding", k=3, threshold=0.97)
        sampled = semdedup(
            _corpus(spark), "doc_id", "embedding", k=3, threshold=0.97,
            fit_fraction=0.5,
        )
        f = {(r["doc_id"], r["group_id"]) for r in full.collect()}
        s = {(r["doc_id"], r["group_id"]) for r in sampled.collect()}
        assert f == s
