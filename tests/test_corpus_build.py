"""The composed training-corpus funnel (operators/corpus_build.py +
the corpus-build CLI): stage ordering, survivor counts, text rewrite,
packing integration."""

from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.__main__ import main
from opentelemetry_iceberg_exporter_spark.operators.corpus_build import build_corpus

BOILER = "subscribe to our newsletter for updates"
UNIQUE_A = (
    "the expedition crossed the northern ridge before dawn carrying "
    "supplies for nine days of alpine travel over glacial terrain"
)
UNIQUE_B = (
    "harvest records from the river delta show rotating crops of barley "
    "and flax sustained the settlement through four dry seasons"
)
UNIQUE_C = (
    "the printing workshop catalogued twelve typefaces cut by hand and "
    "stored the punches in oak drawers beside the press room"
)
BENCH_TEXT = (
    # embeds a verbatim 13-word span of UNIQUE_B (the GPT-3 13-gram rule)
    "question about farming answer records from the river delta show "
    "rotating crops of barley and flax sustained the local population"
)


def _docs(spark):
    rows = [
        # two docs sharing the boilerplate paragraph + unique bodies
        ("a1", f"{BOILER}\n\n{UNIQUE_A}"),
        ("a2", f"{BOILER}\n\n{UNIQUE_B}"),
        ("a3", f"{BOILER}\n\n{UNIQUE_C}"),
        # exact duplicate of a1's post-clean text
        ("b1", UNIQUE_A),
        # near duplicate of a2's body (one word changed; this particular
        # substitution shares 2 LSH bands with UNIQUE_B under the pinned
        # minhash constants — verified, not probabilistic)
        ("c1", UNIQUE_B.replace("dry", "wet")),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBuildCorpus:
    def test_full_funnel_counts(self, spark):
        out, report = build_corpus(spark, _docs(spark), pack_budget=16)
        funnel = report.as_dict()
        assert funnel["input"] == 5
        # boilerplate appears in 3 docs > max_docs=2 -> stripped, all rows kept
        assert funnel["paragraph_dedup"] == 5
        # a1 (now == UNIQUE_A) collides with b1 -> one survives
        assert funnel["exact_dedup"] == 4
        # c1 is a near-dup of a2's cleaned body -> one survives
        assert funnel["near_dedup"] == 3
        assert funnel["packed"] == 3
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {"a1", "a2", "a3"}
        # text was rewritten in place: boilerplate gone, body intact
        assert rows["a1"]["text"] == UNIQUE_A
        assert rows["a2"]["text"] == UNIQUE_B
        # packing columns present and offsets gapless across the corpus
        ordered = sorted(rows.values(), key=lambda r: r["start_offset"])
        pos = 0
        for r in ordered:
            assert r["start_offset"] == pos
            pos += r["n_tokens"]
        assert pos == sum(r["n_tokens"] for r in rows.values())

    def test_substr_stage_trims_residual_overlap(self, spark):
        """--substr-k: after doc-level dedup, a verbatim passage shared
        by otherwise-distinct survivors is excised from all but the
        canonical doc — text rewritten in place, row count unchanged."""
        license_blob = (
            "permission is hereby granted free of charge to any person "
            "obtaining a copy of this software and documentation files"
        )
        rows = [
            ("d1", f"{UNIQUE_A} {license_blob}"),
            ("d2", f"{UNIQUE_B} {license_blob}"),
            ("d3", UNIQUE_C),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out, report = build_corpus(
            spark,
            docs,
            boilerplate_max_docs=None,
            near=False,
            substr_k=40,
        )
        stages = report.as_dict()
        assert stages["substr_dedup"] == 3  # rewrite, not row filter
        texts = {r["doc_id"]: r["text"] for r in out.collect()}
        assert license_blob in texts["d1"]  # canonical (min doc_id)
        assert license_blob not in texts["d2"]
        assert texts["d3"] == UNIQUE_C

    def test_decontamination_stage(self, spark):
        bench = spark.createDataFrame([(BENCH_TEXT,)], ["text"])
        out, report = build_corpus(
            spark, _docs(spark), benchmark=bench, boilerplate_max_docs=None,
            exact=False, near=False,
        )
        funnel = report.as_dict()
        # a2 AND its near-variant c1 share a 13-gram with the benchmark
        assert funnel["decontaminated"] == 3
        survivors = {r["doc_id"] for r in out.collect()}
        assert survivors == {"a1", "a3", "b1"}

    def test_quality_stage_filters_and_scores(self, spark):
        from opentelemetry_iceberg_exporter_spark.operators.quality_classifier import (
            fit_linear_classifier,
        )

        junk = "click free winner " * 6
        labeled = spark.createDataFrame(
            [("g", UNIQUE_A, 1), ("g2", UNIQUE_C, 1), ("j", junk, 0),
             ("j2", "free click winner free click winner deal", 0)],
            ["doc_id", "text", "label"],
        )
        model = fit_linear_classifier(
            spark, labeled, "doc_id", "text", "label", dim=1 << 10, iters=10
        )
        docs = spark.createDataFrame(
            [("d1", UNIQUE_B), ("d2", junk)], ["doc_id", "text"]
        )
        out, report = build_corpus(
            spark, docs, boilerplate_max_docs=None, exact=False, near=False,
            quality_model=model,
        )
        rows = out.collect()
        assert [r["doc_id"] for r in rows] == ["d1"]
        assert 0.5 <= rows[0]["quality_score"] <= 1.0
        assert report.as_dict()["quality_filter"] == 1

    def test_empty_and_null_docs_survive_paragraph_stage(self, spark):
        """dedup_paragraphs emits no row for empty/NULL text; the funnel
        must keep those docs (pass-through), not silently drop them —
        the output set must not depend on whether the stage is on."""
        docs = spark.createDataFrame(
            [("e", ""), ("n", None), ("w", "   "), ("k", UNIQUE_A)],
            ["doc_id", "text"],
        )
        out_on, _ = build_corpus(spark, docs, exact=False, near=False)
        out_off, _ = build_corpus(
            spark, docs, boilerplate_max_docs=None, exact=False, near=False
        )
        assert {r["doc_id"] for r in out_on.collect()} == {"e", "n", "w", "k"}
        assert {r["doc_id"] for r in out_on.collect()} == {
            r["doc_id"] for r in out_off.collect()
        }

    def test_lazy_mode_skips_counts(self, spark):
        out, report = build_corpus(spark, _docs(spark), report_counts=False)
        assert all(n is None for _, n in report.stages)
        assert out.count() == 3  # still correct


def test_packing_offsets_contiguous(spark):
    docs = spark.createDataFrame(
        [("x", "one two three"), ("y", "four five"), ("z", "six")],
        ["doc_id", "text"],
    )
    out, _ = build_corpus(
        spark, docs, boilerplate_max_docs=None, exact=False, near=False,
        pack_budget=4,
    )
    rows = sorted(out.collect(), key=lambda r: r["start_offset"])
    pos = 0
    for r in rows:
        assert r["start_offset"] == pos
        pos += r["n_tokens"]
    assert pos == 6
    assert all(r["first_seq"] == r["start_offset"] // 4 for r in rows)


class TestDomainCapStage:
    def test_domain_cap_runs_after_filters(self, spark):
        rows = [
            (f"s{i}", f"doc body number {i} entirely distinct words here{i}",
             f"https://farm.biz/p{i}")
            for i in range(6)
        ] + [
            ("g1", "independent site content one", "https://one.org/a"),
            ("g2", "independent site content two", None),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "url"])
        out, report = build_corpus(
            spark,
            docs,
            boilerplate_max_docs=None,
            exact=False,
            near=False,
            url_col="url",
            max_per_domain=2,
        )
        funnel = report.as_dict()
        assert funnel["domain_cap"] == 4  # 2 farm + 1 org + 1 null-host
        got = out.collect()
        assert sum(1 for r in got if r["url"] and "farm.biz" in r["url"]) == 2
        assert any(r["doc_id"] == "g2" for r in got)  # null host kept


class TestLmAndBpeStages:
    def test_perplexity_stage_filters(self, spark):
        from opentelemetry_iceberg_exporter_spark.operators.lm import (
            train_bigram_lm,
        )

        ref = spark.createDataFrame(
            [("r1", UNIQUE_A), ("r2", UNIQUE_B), ("r3", UNIQUE_C)],
            ["doc_id", "text"],
        )
        lm = train_bigram_lm(spark, ref, "text")
        docs = spark.createDataFrame(
            [("in", UNIQUE_A), ("out", "zzq qqv xxw lkj mmn ppo")],
            ["doc_id", "text"],
        )
        # threshold between the two scores
        from opentelemetry_iceberg_exporter_spark.operators.lm import (
            score_perplexity,
        )

        ppl = {r["doc_id"]: r["perplexity"]
               for r in score_perplexity(docs, lm, "doc_id", "text").collect()}
        cut = (ppl["in"] + ppl["out"]) / 2
        out, report = build_corpus(
            spark, docs, boilerplate_max_docs=None, exact=False, near=False,
            lm_model=lm, max_perplexity=cut,
        )
        rows = out.collect()
        assert [r["doc_id"] for r in rows] == ["in"]
        assert rows[0]["perplexity"] == ppl["in"]
        assert report.as_dict()["perplexity_filter"] == 1

    def test_bpe_token_counts_drive_packing(self, spark):
        from opentelemetry_iceberg_exporter_spark.operators.bpe import (
            encode_word,
            train_bpe,
        )

        docs = spark.createDataFrame(
            [("a", "low low low low lower lower"), ("b", "low newest newest newest")],
            ["doc_id", "text"],
        )
        model = train_bpe(spark, docs, "text", num_merges=6)
        out, _ = build_corpus(
            spark, docs, boilerplate_max_docs=None, exact=False, near=False,
            bpe_model=model, pack_budget=8,
        )
        rows = {r["doc_id"]: r for r in out.collect()}
        for doc_id, text in (("a", "low low low low lower lower"),
                             ("b", "low newest newest newest")):
            expect = sum(len(encode_word(w, model.merges)) for w in text.split())
            assert rows[doc_id]["n_bpe_tokens"] == expect
        # packing offsets budget by BPE counts: contiguous over bpe sums
        ordered = sorted(rows.values(), key=lambda r: r["start_offset"])
        pos = 0
        for r in ordered:
            assert r["start_offset"] == pos
            pos += r["n_bpe_tokens"]


class TestCorpusBuildCli:
    def test_cli_funnel(self, spark, tmp_path, capsys):
        inp = str(tmp_path / "docs")
        _docs(spark).write.parquet(inp)
        outp = str(tmp_path / "out")
        rc = main(
            [
                "corpus-build", "--input", inp, "--output", outp,
                "--pack-budget", "16",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["funnel"]["input"] == 5
        assert stats["funnel"]["packed"] == 3
        got = duckdb.sql(
            f"SELECT doc_id, n_tokens, start_offset FROM '{outp}/*.parquet' ORDER BY doc_id"
        ).fetchall()
        assert [g[0] for g in got] == ["a1", "a2", "a3"]

    def test_cli_bpe_train_then_pack_by_tokens(self, spark, tmp_path, capsys):
        inp = str(tmp_path / "docs")
        spark.createDataFrame(
            [("a", "low low low low lower"), ("b", "newest newest newest")],
            ["doc_id", "text"],
        ).write.parquet(inp)
        model = str(tmp_path / "merges.json")
        rc = main(
            ["bpe-train", "--input", inp, "--model-out", model,
             "--num-merges", "6"]
        )
        assert rc == 0
        t = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert t["merges"] > 0 and t["vocab_size"] > 0
        outp = str(tmp_path / "out")
        rc = main(
            ["corpus-build", "--input", inp, "--output", outp,
             "--boilerplate-max-docs", "0", "--skip-exact", "--skip-near",
             "--bpe-model", model, "--pack-budget", "8"]
        )
        assert rc == 0
        capsys.readouterr()
        cols = {r[0] for r in duckdb.sql(
            f"DESCRIBE SELECT * FROM '{outp}/*.parquet'").fetchall()}
        assert {"n_bpe_tokens", "start_offset", "first_seq"} <= cols

    def test_cli_catalog_table_roundtrip(self, spark, tmp_path, capsys):
        """corpus-build reading FROM a catalog table and appending the
        built corpus TO another — the whole funnel over table I/O."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog

        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        src = cat.create_table("corpus", "raw", _docs(spark).schema)
        src.append_dataframe(_docs(spark))
        rc = main(
            [
                "corpus-build", "--warehouse", wh,
                "--source-table", "corpus.raw",
                "--dest-table", "corpus.clean",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["funnel"]["near_dedup"] == 3
        assert stats["dest_snapshot"] is not None
        clean = cat.load_table("corpus", "clean").read(spark)
        assert {r["doc_id"] for r in clean.collect()} == {"a1", "a2", "a3"}
        assert "n_tokens" in clean.columns

    def test_cli_lm_score(self, spark, tmp_path, capsys):
        ref = str(tmp_path / "ref")
        spark.createDataFrame(
            [("r", UNIQUE_A), ("r2", UNIQUE_B)], ["doc_id", "text"]
        ).write.parquet(ref)
        inp = str(tmp_path / "docs")
        spark.createDataFrame(
            [("d1", UNIQUE_A), ("d2", "qq zz xx vv ww")], ["doc_id", "text"]
        ).write.parquet(inp)
        outp = str(tmp_path / "scored")
        rc = main(
            ["lm-score", "--train-input", ref, "--input", inp,
             "--output", outp]
        )
        assert rc == 0
        assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 2
        got = {r[0]: r[1] for r in duckdb.sql(
            f"SELECT doc_id, perplexity FROM '{outp}/*.parquet'").fetchall()}
        assert got["d1"] < got["d2"]


@pytest.mark.slow
class TestShuffleSeed:
    def test_seed_changes_pack_order_reproducibly(self, spark):
        """shuffle_seed makes the packed training order the seeded
        deterministic permutation: same seed -> identical offsets,
        different seed -> a different order of the same survivors,
        and the seeded offsets equal packing with the standalone
        shuffle key supplied explicitly."""
        from opentelemetry_iceberg_exporter_spark.operators.corpus_build import (
            build_corpus,
        )

        docs = _docs(spark)
        a1, _ = build_corpus(
            spark, docs, pack_budget=16, shuffle_seed="ep1",
            report_counts=False,
        )
        a2, _ = build_corpus(
            spark, docs, pack_budget=16, shuffle_seed="ep1",
            report_counts=False,
        )
        b, _ = build_corpus(
            spark, docs, pack_budget=16, shuffle_seed="ep2",
            report_counts=False,
        )
        key = lambda df: {
            r["doc_id"]: r["start_offset"] for r in df.collect()
        }
        ka, ka2, kb = key(a1), key(a2), key(b)
        assert ka == ka2  # same seed -> byte-stable offsets
        assert set(ka) == set(kb) and ka != kb  # new epoch -> new order
