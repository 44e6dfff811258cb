"""Sampling/split operator contracts (operators/sampling.py):
determinism across calls, weight adherence, exact stratified counts,
incremental-ingestion stability (new rows never move old assignments),
and cross-engine agreement of the bucket hash with DuckDB."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.sampling import (
    SPLIT_MOD,
    duck_split_bucket,
    hash_fraction_sample,
    hash_split,
    split_bucket,
    stratified_sample,
)


@pytest.fixture()
def docs(spark, sf_dir):
    from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_split_deterministic_and_total(spark, docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    assert a == b
    assert len(a) == docs.count()
    assert set(a.values()) <= {"train", "val", "test"}


def test_split_weights_roughly_hold(spark, docs):
    out = hash_split(docs, "doc_id").groupBy("split").count().collect()
    n = docs.count()
    frac = {r["split"]: r["count"] / n for r in out}
    assert 0.7 <= frac.get("train", 0) <= 0.9
    assert 0.03 <= frac.get("val", 0) <= 0.2
    assert 0.03 <= frac.get("test", 0) <= 0.2


def test_incremental_stability(spark, docs):
    """Assignments are a pure function of the id: adding rows later (or
    splitting on a subset) cannot move existing rows between splits —
    the no-test-set-contamination property."""
    subset = docs.filter(F.col("doc_id") % 2 == 0)
    full = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    part = {r["doc_id"]: r["split"] for r in hash_split(subset, "doc_id").collect()}
    assert all(full[k] == v for k, v in part.items())


def test_salt_changes_assignment(spark, docs):
    plain = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    salted = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", salt="v2").collect()
    }
    assert plain != salted  # some rows must move under a different salt


def test_bucket_matches_duckdb(spark, docs, sf_dir):
    s = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", split_bucket("doc_id").alias("b")
        ).collect()
    }
    d = dict(
        duckdb.sql(
            f"SELECT doc_id, {duck_split_bucket('doc_id')} AS b"
            f" FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    assert s == d


def test_hash_fraction_sample_subset_and_deterministic(spark, docs):
    s1 = {r["doc_id"] for r in hash_fraction_sample(docs, "doc_id", 0.2).collect()}
    s2 = {r["doc_id"] for r in hash_fraction_sample(docs, "doc_id", 0.2).collect()}
    assert s1 == s2
    n = docs.count()
    assert 0.1 * n <= len(s1) <= 0.3 * n
    bigger = {r["doc_id"] for r in hash_fraction_sample(docs, "doc_id", 0.5).collect()}
    assert s1 <= bigger  # threshold sampling is monotone in the fraction


def test_stratified_exact_counts(spark):
    rows = [(i, "a" if i <= 100 else "b") for i in range(1, 161)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    out = stratified_sample(df, ["stratum"], 0.25, "id")
    got = {r["stratum"]: r["count"] for r in out.groupBy("stratum").count().collect()}
    assert got == {"a": 25, "b": 15}  # ceil(100*.25), ceil(60*.25)
    # deterministic membership
    again = stratified_sample(df, ["stratum"], 0.25, "id")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


# --------------------------------------------------------------------------
# temperature-weighted corpus mixing
# --------------------------------------------------------------------------


def _mix_sources(spark):
    big = spark.range(0, 8000).select(F.col("id"), F.lit("en").alias("lang"))
    small = spark.range(100000, 102000).select(F.col("id"), F.lit("sw").alias("lang"))
    return {"big": big, "small": small}


def test_mix_natural_alpha1_keeps_everything(spark):
    from opentelemetry_iceberg_exporter_spark.operators.sampling import mix_corpora

    out, report = mix_corpora(_mix_sources(spark), "id", alpha=1.0)
    # natural shares at alpha=1: every source is exactly at its share,
    # so the without-replacement optimum is the full corpus
    assert out.count() == 10_000
    assert report["big"]["fraction"] == 1.0 and report["small"]["fraction"] == 1.0
    assert report["big"]["share"] == 0.8


def test_mix_temperature_flattens_toward_small_sources(spark):
    from opentelemetry_iceberg_exporter_spark.operators.sampling import mix_corpora

    out, report = mix_corpora(_mix_sources(spark), "id", alpha=0.5)
    # p=(0.8, 0.2) -> q ∝ (0.894, 0.447) = (2/3, 1/3); the small source
    # binds at T = 2000/(1/3) = 6000: it keeps everything, the big
    # source halves
    assert report["small"]["fraction"] == 1.0
    assert abs(report["big"]["fraction"] - 0.5) < 1e-6
    assert report["big"]["target"] == 4000 and report["small"]["target"] == 2000
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts["small"] == 2000
    assert abs(counts["big"] - 4000) < 4000 * 0.05  # hash-sample wobble
    # the output carries the source tag alongside the source columns
    assert set(out.columns) == {"id", "lang", "source"}


def test_mix_deterministic_and_monotone_in_weight(spark):
    from opentelemetry_iceberg_exporter_spark.operators.sampling import mix_corpora

    srcs = _mix_sources(spark)
    a1, _ = mix_corpora(srcs, "id", weights={"big": 1.0, "small": 4.0})
    a2, _ = mix_corpora(
        {k: v.repartition(7) for k, v in srcs.items()},
        "id",
        weights={"big": 1.0, "small": 4.0},
    )
    ids1 = sorted(r["id"] for r in a1.collect())
    assert ids1 == sorted(r["id"] for r in a2.collect())  # partition-invariant
    # raising big's weight only ADDS big documents (hash threshold is
    # monotone): the earlier keep set is a subset
    b, _ = mix_corpora(srcs, "id", weights={"big": 2.0, "small": 4.0})
    big1 = {r["id"] for r in a1.filter("source = 'big'").collect()}
    big2 = {r["id"] for r in b.filter("source = 'big'").collect()}
    assert big1 <= big2 and len(big1) < len(big2)


def test_mix_validation(spark):
    from opentelemetry_iceberg_exporter_spark.operators.sampling import mix_corpora

    srcs = _mix_sources(spark)
    with pytest.raises(ValueError, match="alpha"):
        mix_corpora(srcs, "id", alpha=0.0)
    with pytest.raises(ValueError, match="unknown sources"):
        mix_corpora(srcs, "id", weights={"nope": 1.0, "big": 1.0, "small": 1.0})
    with pytest.raises(ValueError, match="at least one"):
        mix_corpora({}, "id")
    # sizes= skips the count jobs and feeds the same arithmetic
    _, report = mix_corpora(
        srcs, "id", alpha=0.5, sizes={"big": 8000, "small": 2000}
    )
    assert report["big"]["target"] == 4000


def test_mix_weights_must_cover_every_source(spark):
    from opentelemetry_iceberg_exporter_spark.operators.sampling import mix_corpora

    with pytest.raises(ValueError, match="missing"):
        mix_corpora(_mix_sources(spark), "id", weights={"big": 1.0})


def test_mix_cli(spark, tmp_path, capsys):
    import json

    from opentelemetry_iceberg_exporter_spark.__main__ import main

    srcs = _mix_sources(spark)
    big, small = str(tmp_path / "big"), str(tmp_path / "small")
    srcs["big"].write.parquet(big)
    srcs["small"].write.parquet(small)
    out = str(tmp_path / "mixed")
    rc = main(
        [
            "mix",
            "--source", f"big={big}",
            "--source", f"small={small}",
            "--output", out,
            "--id-col", "id",
            "--alpha", "0.5",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["report"]["small"]["fraction"] == 1.0
    assert stats["report"]["big"]["target"] == 4000
    got = spark.read.parquet(out)
    counts = {r["source"]: r["count"] for r in got.groupBy("source").count().collect()}
    assert counts["small"] == 2000 and abs(counts["big"] - 4000) < 200
    with pytest.raises(SystemExit, match="NAME=VALUE"):
        main(["mix", "--source", "nopath", "--output", out])
    with pytest.raises(SystemExit, match="given twice"):
        main(
            ["mix", "--source", f"big={big}", "--source", f"big={small}",
             "--output", out]
        )
    with pytest.raises(SystemExit, match="must be a number"):
        main(
            ["mix", "--source", f"big={big}", "--output", out,
             "--weight", "big=heavy"]
        )


def test_score_weighted_sample(spark):
    """Probability-proportional keeping: score 0 keeps nothing, 1 keeps
    everything, mid scores keep ~score of rows; deterministic,
    monotone in the score, and DuckDB-mirrorable."""
    import duckdb

    from opentelemetry_iceberg_exporter_spark.operators.sampling import (
        SPLIT_MOD,
        duck_split_bucket,
        score_weighted_sample,
    )

    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 4 == 0, 0.0)
        .when(F.col("id") % 4 == 1, 0.3)
        .when(F.col("id") % 4 == 2, 0.8)
        .otherwise(1.0)
        .alias("score"),
    )
    kept = score_weighted_sample(df, "id", "score")
    by_score = {
        r["score"]: r["n"]
        for r in kept.groupBy("score").agg(F.count("*").alias("n")).collect()
    }
    assert 0.0 not in by_score  # score 0: nothing
    assert by_score[1.0] == 1000  # score 1: everything
    assert 200 <= by_score[0.3] <= 400  # ~300 of 1000
    assert 700 <= by_score[0.8] <= 900  # ~800 of 1000
    # deterministic + monotone: every row kept at 0.3 is kept at 0.8
    kept_03 = {r["id"] for r in score_weighted_sample(
        df.withColumn("score", F.lit(0.3)), "id", "score").collect()}
    kept_08 = {r["id"] for r in score_weighted_sample(
        df.withColumn("score", F.lit(0.8)), "id", "score").collect()}
    assert kept_03 <= kept_08
    # cross-engine: DuckDB reproduces the exact keep set
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    from opentelemetry_iceberg_exporter_spark.operators.sampling import (
        SCORE_SALT_TAG,
    )

    duck = {
        r[0]
        for r in con.execute(
            f"SELECT id FROM t WHERE "
            f"{duck_split_bucket('id', SCORE_SALT_TAG)} < "
            f"CAST(floor(score * {SPLIT_MOD}) AS BIGINT)"
        ).fetchall()
    }
    assert duck == {r["id"] for r in kept.collect()}
    # out-of-range scores clamp instead of misbehaving
    clamped = score_weighted_sample(
        df.withColumn("score", F.lit(7.5)), "id", "score"
    )
    assert clamped.count() == 4000


def test_score_weighted_sample_composes_with_hash_split(spark):
    """The score coin lives in its own hash domain: a 0.75-scored
    corpus filtered by score then hash_split must still produce val
    and test sets (with a SHARED domain the score pass deletes exactly
    the buckets hash_split assigns to val/test — empty held-out sets,
    the r10 advisory's composition bias)."""
    from opentelemetry_iceberg_exporter_spark.operators.sampling import (
        hash_split,
        score_weighted_sample,
    )

    df = spark.range(4000).select(F.col("id"), F.lit(0.75).alias("score"))
    split_counts = {
        r["split"]: r["n"]
        for r in hash_split(
            score_weighted_sample(df, "id", "score"), "id"
        )
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # ~3000 survivors split 80/10/10: each held-out set must be a real
    # ~10% slice, not empty
    assert split_counts.get("val", 0) > 150
    assert split_counts.get("test", 0) > 150
    assert split_counts["train"] > 2000


def test_mix_cli_single_plan_execution(spark, tmp_path, capsys, monkeypatch):
    """The CLI must evaluate the mix plan ONCE (the write); the
    reported count comes from the written parquet, not a second run of
    the union-of-samples."""
    import json

    from opentelemetry_iceberg_exporter_spark.__main__ import main
    from opentelemetry_iceberg_exporter_spark.operators import sampling

    srcs = _mix_sources(spark)
    big = str(tmp_path / "big")
    srcs["big"].write.parquet(big)
    out = str(tmp_path / "mixed")

    real = sampling.mix_corpora

    def guarding(*a, **k):
        mixed, report = real(*a, **k)

        def boom():
            raise AssertionError("mixed.count() would re-run the whole plan")

        mixed.count = boom  # any count on the LIVE plan fails the test
        return mixed, report

    monkeypatch.setattr(sampling, "mix_corpora", guarding)
    rc = main(["mix", "--source", f"big={big}", "--output", out, "--id-col", "id"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == spark.read.parquet(out).count()  # counted from disk


class TestShuffleCorpus:
    def test_order_matches_duckdb_and_varies_by_seed(self, spark, docs, sf_dir):
        """The shuffled order is a pure function of (seed, ids): DuckDB
        reproduces it exactly from the documented mirror expression,
        and a different seed gives a different permutation of the same
        rows."""
        import duckdb

        from opentelemetry_iceberg_exporter_spark.operators.sampling import (
            SHUFFLE_SALT_TAG,
            shuffle_corpus,
        )

        got = [
            r["doc_id"]
            for r in shuffle_corpus(docs, "doc_id", seed="ep1").select(
                "doc_id"
            ).collect()
        ]
        want = [
            r[0]
            for r in duckdb.sql(
                "SELECT doc_id FROM "
                f"'{sf_dir}/documents.parquet' ORDER BY "
                f"('0x'||substring(md5('{SHUFFLE_SALT_TAG}ep1'||doc_id::VARCHAR),1,15))::BIGINT, "
                "doc_id"
            ).fetchall()
        ]
        assert got == want
        other = [
            r["doc_id"]
            for r in shuffle_corpus(docs, "doc_id", seed="ep2").select(
                "doc_id"
            ).collect()
        ]
        assert sorted(other) == sorted(got) and other != got

    def test_partitioned_form_is_consistent_and_partitioning_invariant(
        self, spark, docs
    ):
        """The explicit-shard form concatenates (in partition order) to
        the same global order as the plain sort, regardless of input
        partitioning — ascending disjoint ranges + per-shard sort IS
        the global sort."""
        from pyspark.sql.functions import spark_partition_id

        from opentelemetry_iceberg_exporter_spark.operators.sampling import (
            shuffle_corpus,
        )

        plain = [
            r["doc_id"]
            for r in shuffle_corpus(docs, "doc_id", seed="s").select(
                "doc_id"
            ).collect()
        ]
        sharded = shuffle_corpus(
            docs.repartition(7), "doc_id", seed="s", partitions=4
        ).select("doc_id", spark_partition_id().alias("pid"))
        rows = sharded.collect()
        by_pid: dict[int, list] = {}
        for r in rows:
            by_pid.setdefault(r["pid"], []).append(r["doc_id"])
        concat = [d for pid in sorted(by_pid) for d in by_pid[pid]]
        assert concat == plain
