"""Connected-components dedup-group resolution (operators/dedup.py
dedup_groups): pairs -> transitive groups, min-id canonical labels,
singleton passthrough. The synthetic graph includes a 4-node CHAIN so
the min label must propagate across nodes that never share a direct
pair — the case a single join round gets wrong."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.dedup import dedup_groups


def _fixture(spark):
    # docs 1..10; pair graph: chain 1-2, 2-3, 3-4 (one component),
    # clique edge 6-7, and 8-9; 5 and 10 are singletons
    docs = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7), (8, 9)], "id_a long, id_b long"
    )
    return docs, pairs


def test_chain_collapses_to_one_group(spark):
    docs, pairs = _fixture(spark)
    out = {r["doc_id"]: r for r in dedup_groups(docs, pairs, "doc_id").collect()}
    assert {out[i]["group_id"] for i in (1, 2, 3, 4)} == {1}
    assert all(out[i]["group_size"] == 4 for i in (1, 2, 3, 4))
    assert out[1]["is_canonical"] and not out[4]["is_canonical"]


def test_singletons_and_small_groups(spark):
    docs, pairs = _fixture(spark)
    out = {r["doc_id"]: r for r in dedup_groups(docs, pairs, "doc_id").collect()}
    for i in (5, 10):
        assert out[i]["group_id"] == i
        assert out[i]["group_size"] == 1
        assert out[i]["is_canonical"]
    assert out[7]["group_id"] == 6 and out[7]["group_size"] == 2
    assert out[9]["group_id"] == 8


def test_every_doc_appears_exactly_once(spark):
    docs, pairs = _fixture(spark)
    res = dedup_groups(docs, pairs, "doc_id")
    assert res.count() == 10
    assert res.select("doc_id").distinct().count() == 10
    # keep-set = one canonical per group
    keep = res.filter(F.col("is_canonical"))
    assert keep.count() == res.select("group_id").distinct().count()


def test_long_chain_converges_in_log_rounds(spark):
    """A 64-node path graph has diameter 63: plain neighbor-min needs ~63
    rounds, pointer doubling needs ~log2(63)+2. max_iter=10 proves the
    doubling is actually in effect (the run RAISES if it isn't)."""
    n = 64
    docs = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    out = dedup_groups(docs, chain, "doc_id", max_iter=10)
    rows = out.collect()
    assert all(r["group_id"] == 1 for r in rows)
    assert all(r["group_size"] == n for r in rows)


def test_empty_pairs_all_singletons(spark):
    docs, _ = _fixture(spark)
    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup_groups(docs, empty, "doc_id")
    assert out.filter(F.col("group_size") != 1).count() == 0
    assert out.filter(~F.col("is_canonical")).count() == 0
