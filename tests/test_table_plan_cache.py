"""load_table's per-session PLAN cache: repeated loads of the same
parquet path reuse the lazy scan DataFrame (no re-inference, no
re-listing — ~150ms of driver work saved per call), while a rewritten
file is re-listed (mtime/size key) and rows are ALWAYS read from disk
at action time (plan cache, never a result cache)."""

from __future__ import annotations

import shutil

from opentelemetry_iceberg_exporter_spark.sources import tables


def test_repeat_load_returns_cached_plan(spark, sf_dir):
    a = tables.load_table(spark, sf_dir, "nation")
    b = tables.load_table(spark, sf_dir, "nation")
    assert a is b  # same lazy plan object, zero rebuild cost


def test_rewrite_invalidates_and_rows_come_from_disk(spark, tmp_path):
    src = f"{tmp_path}/nation.parquet"
    spark.createDataFrame(
        [(1, "aaa"), (2, "bbb")], "n_nationkey long, n_name string"
    ).coalesce(1).write.parquet(src)
    df1 = tables.load_table(spark, str(tmp_path), "nation")
    assert df1.count() == 2

    shutil.rmtree(src)
    spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "ccc")],
        "n_nationkey long, n_name string",
    ).coalesce(1).write.parquet(src)
    df2 = tables.load_table(spark, str(tmp_path), "nation")
    # new (path, mtime, size) key -> fresh plan, rows reflect the rewrite
    assert df2.count() == 3


def test_doc_feature_columns_cached():
    from opentelemetry_iceberg_exporter_spark.operators.text import (
        _doc_feature_columns,
    )

    _doc_feature_columns.cache_clear()
    a = _doc_feature_columns("doc_id", "text")
    b = _doc_feature_columns("doc_id", "text")
    assert a is b
    assert _doc_feature_columns.cache_info().hits >= 1


def test_fan_out_width_is_data_derived(spark, sf_dir):
    """fan_out sizes its shuffle from SOURCE BYTES (one slice per
    ~48 KB, cap = cluster parallelism); a production-scale byte count
    estimates enough scan splits that fan_out is a no-op (no
    full-corpus shuffle can sneak in at scale)."""
    from opentelemetry_iceberg_exporter_spark.sources.tables import (
        _FAN_OUT_TASK_BYTES,
        fan_out,
        load_table,
    )

    target = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents")
    assert hasattr(docs, "_graft_src_bytes")

    small = fan_out(docs, spark, src_bytes=10 * _FAN_OUT_TASK_BYTES)
    assert small.rdd.getNumPartitions() == min(target, 10)

    # 100 GB "source": estimated scan splits cover the cluster -> no-op
    big = fan_out(docs, spark, src_bytes=100 << 30)
    assert big is docs

    # tiny source still gets the floor of 2 (never single-slice)
    tiny = fan_out(docs, spark, src_bytes=1)
    assert tiny.rdd.getNumPartitions() == 2


def test_fan_out_fallback_without_hint(spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.sources.tables import (
        fan_out,
        load_table,
    )

    target = spark.sparkContext.defaultParallelism
    # a derived frame loses the attribute -> split-count fallback
    derived = load_table(spark, sf_dir, "documents").select("doc_id")
    out = fan_out(derived, spark)
    assert out.rdd.getNumPartitions() >= min(2, target)


def test_fan_out_stamps_hint_on_output(spark, sf_dir):
    """fan_out's repartitioned output carries the source-bytes hint
    forward so downstream width decisions (e.g. the d04 pair shuffle)
    can reuse the same data-derived rule."""
    from opentelemetry_iceberg_exporter_spark.sources.tables import (
        _FAN_OUT_TASK_BYTES,
        fan_out,
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = fan_out(docs, spark, src_bytes=10 * _FAN_OUT_TASK_BYTES)
    assert getattr(out, "_graft_src_bytes", None) == 10 * _FAN_OUT_TASK_BYTES


def test_pair_shuffle_width_is_data_derived(spark, sf_dir):
    """d04's shingle-group exchange width follows the fan_out byte rule
    for small inputs and defers to the configured shuffle partitioning
    (None) at scale or without a hint."""
    from opentelemetry_iceberg_exporter_spark.operators.dedup import (
        _pair_shuffle_width,
    )
    from opentelemetry_iceberg_exporter_spark.sources.tables import (
        _FAN_OUT_TASK_BYTES,
        load_table,
    )

    target = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents")

    small = docs.select("doc_id", "text")
    small._graft_src_bytes = 5 * _FAN_OUT_TASK_BYTES
    assert _pair_shuffle_width(small) == 5

    # production-scale hint: leave the exchange to conf + AQE
    big = docs.select("doc_id", "text")
    big._graft_src_bytes = 100 << 30
    assert _pair_shuffle_width(big) is None

    # no hint: unchanged keyed-repartition path
    assert _pair_shuffle_width(docs.select("doc_id")) is None

    # floor of 2, and the boundary sits at 4x parallelism
    tiny = docs.select("doc_id", "text")
    tiny._graft_src_bytes = 1
    assert _pair_shuffle_width(tiny) == 2
    edge = docs.select("doc_id", "text")
    edge._graft_src_bytes = 4 * target * _FAN_OUT_TASK_BYTES
    assert _pair_shuffle_width(edge) == 4 * target


def test_directory_table_sizes_from_members(spark, tmp_path):
    """A directory-layout parquet table must hint its MEMBER bytes (the
    inode size would collapse fan_out to the floor and repartition an
    arbitrarily large corpus down to 2 slices), and adding a member
    must re-key the plan cache even though the dir inode may not
    change."""
    from opentelemetry_iceberg_exporter_spark.sources import tables

    src = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(1, "aa")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    df1 = tables.load_table(spark, str(tmp_path), "documents")
    real = sum(
        f.stat().st_size for f in __import__("pathlib").Path(src).rglob("*")
        if f.is_file()
    )
    assert df1._graft_src_bytes == real
    assert real > 0

    # append a member file in place (dir mtime alone is not reliable)
    spark.createDataFrame(
        [(2, "bb")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    df2 = tables.load_table(spark, str(tmp_path), "documents")
    assert df2 is not df1  # re-keyed
    assert df2.count() == 2
    assert df2._graft_src_bytes > df1._graft_src_bytes


def test_column_cache_rebuilds_on_gateway_change(monkeypatch):
    """The cached Column tuples hold py4j refs into the live gateway; a
    relaunched gateway must rebuild them instead of handing back dead
    references."""
    from opentelemetry_iceberg_exporter_spark import plancache
    from opentelemetry_iceberg_exporter_spark.operators.text import (
        _doc_feature_columns,
    )

    _doc_feature_columns.cache_clear()
    a = _doc_feature_columns("doc_id", "text")
    assert _doc_feature_columns("doc_id", "text") is a
    monkeypatch.setattr(plancache, "gateway_epoch", lambda: "relaunched")
    b = _doc_feature_columns("doc_id", "text")
    assert b is not a
