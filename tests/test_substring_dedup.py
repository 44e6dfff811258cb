"""Exact substring dedup (operators/substring_dedup.py — the Lee et
al. ExactSubstr recipe as k-gram anchoring). No DuckDB oracle by
design (the stitching fold is not portable SQL); pinned instead by an
INDEPENDENT in-test O(n^2) reference implementation, hand-built edge
cases, and partitioning invariance."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.substring_dedup import (
    duplicated_spans,
    kgram_occurrences,
    strip_duplicated_substrings,
)


def _reference(docs: dict[int, str], k: int, stride: int = 1):
    """Independent reference: duplicated k-grams -> canonical exemption
    -> merged spans -> stripped text. Dict/loop implementation sharing
    nothing with the Spark plan."""
    import hashlib

    occ: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(docs):
        t = docs[d]
        for p in range(len(t) - k + 1):
            g = t[p : p + k]
            if stride > 1:
                h = hashlib.md5(g.encode()).hexdigest()
                if int(h[:8], 16) % stride != 0:
                    continue
            occ.setdefault(g, []).append((d, p))
    hits: dict[int, list[int]] = {}
    for where in occ.values():
        if len(where) < 2:
            continue
        canon = min(where)
        for d, p in where:
            if (d, p) != canon:
                hits.setdefault(d, []).append(p)
    spans: dict[int, list[tuple[int, int]]] = {}
    for d, ps in hits.items():
        ps.sort()
        merged: list[list[int]] = []
        for p in ps:
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + k)
            else:
                merged.append([p, p + k])
        spans[d] = [(a, b) for a, b in merged]
    out = {}
    for d in docs:
        t = docs[d]
        cur, parts = 0, []
        for a, b in spans.get(d, []):
            parts.append(t[cur:a])
            cur = b
        parts.append(t[cur:])
        out[d] = "".join(parts)
    return spans, out


def _df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(d, t) for d, t in sorted(docs.items())], "doc_id long, text string"
    )


def _spark_result(spark, docs, k, stride=1):
    out = strip_duplicated_substrings(
        _df(spark, docs), "doc_id", "text", k=k, stride=stride
    )
    return {r["doc_id"]: r["text_deduped"] for r in out.collect()}


PASSAGE = "the quick brown fox jumps over the lazy dog while the band plays on"


class TestBasics:
    def test_cross_doc_passage_stripped_from_later_doc(self, spark):
        docs = {
            1: "A" * 30 + PASSAGE + "B" * 30,
            2: "C" * 25 + PASSAGE + "D" * 25,
        }
        got = _spark_result(spark, docs, k=20)
        _spans, want = _reference(docs, k=20)
        assert got == want
        assert PASSAGE in got[1]  # canonical copy survives
        assert PASSAGE not in got[2]  # later copy excised

    def test_same_doc_repetition_keeps_first(self, spark):
        docs = {5: PASSAGE + " filler between " + PASSAGE}
        got = _spark_result(spark, docs, k=20)
        _spans, want = _reference(docs, k=20)
        assert got == want
        assert got[5].count("quick brown fox") == 1

    def test_no_duplicates_pass_through(self, spark):
        docs = {
            1: "completely unique text number one, with enough distinct "
               "characters to produce many k-grams and zero repetition",
            2: "another entirely different document body whose words never "
               "echo the first one nor repeat themselves internally at all",
        }
        got = _spark_result(spark, docs, k=25)
        assert got == docs

    def test_short_docs_contribute_nothing(self, spark):
        docs = {1: "tiny", 2: "tiny", 3: "x" * 100}
        got = _spark_result(spark, docs, k=20)
        assert got[1] == "tiny" and got[2] == "tiny"

    def test_audit_mode_returns_all_occurrences(self, spark):
        docs = {1: PASSAGE, 2: PASSAGE}
        all_spans = duplicated_spans(
            _df(spark, docs), "doc_id", "text", k=20, keep_canonical=False
        ).collect()
        assert {r["doc_id"] for r in all_spans} == {1, 2}
        keep = duplicated_spans(
            _df(spark, docs), "doc_id", "text", k=20
        ).collect()
        assert {r["doc_id"] for r in keep} == {2}

    def test_guards(self, spark):
        with pytest.raises(ValueError, match="k must be"):
            kgram_occurrences(_df(spark, {1: "x"}), "doc_id", "text", k=1)
        with pytest.raises(ValueError, match="stride must be"):
            kgram_occurrences(_df(spark, {1: "x"}), "doc_id", "text", stride=0)


class TestReferenceEquality:
    def test_random_corpus_with_planted_duplicates(self, spark):
        rng = random.Random(7)
        alphabet = "abcdefg "
        base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(60, 200)))
                for _ in range(12)]
        shared_a = "".join(rng.choice(alphabet) for _ in range(75))
        shared_b = "".join(rng.choice(alphabet) for _ in range(60))
        docs = {}
        for i, t in enumerate(base):
            body = t
            if i % 3 == 0:
                body = body[:20] + shared_a + body[20:]
            if i % 4 == 1:
                body = body + shared_b
            docs[i] = body
        got = _spark_result(spark, docs, k=30)
        _spans, want = _reference(docs, k=30)
        assert got == want

    def test_partitioning_invariance(self, spark):
        docs = {
            1: "A" * 30 + PASSAGE + "B" * 30,
            2: "C" * 25 + PASSAGE + "D" * 25,
            3: PASSAGE * 2,
            4: "unrelated content that is long enough to k-gram " * 2,
        }
        df = _df(spark, docs)
        one = strip_duplicated_substrings(df.coalesce(1), "doc_id", "text", k=20)
        many = strip_duplicated_substrings(
            df.repartition(7), "doc_id", "text", k=20
        )
        assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


class TestStride:
    def test_stride_detects_long_spans(self, spark):
        """Content-sampled stride: anchors are a function of the gram
        BYTES, so the two copies (at offsets that differ mod s) anchor
        at the same relative positions — positional sampling would have
        missed them entirely."""
        long_shared = PASSAGE + " and then " + PASSAGE[::-1]
        docs = {
            1: "X" * 17 + long_shared + "Y" * 13,
            2: "Z" * 11 + long_shared + "W" * 23,
        }
        got = _spark_result(spark, docs, k=30, stride=4)
        _spans, want = _reference(docs, k=30, stride=4)
        assert got == want
        assert "quick brown" not in got[2] or "quick brown" not in got[1]

    def test_cli(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        docs = {1: "A" * 30 + PASSAGE + "B" * 30, 2: "C" * 25 + PASSAGE + "D" * 25}
        src = str(tmp_path / "in")
        _df(spark, docs).write.parquet(src)
        out = str(tmp_path / "out")
        rc = main(
            ["substr-dedup", "--input", src, "--output", out,
             "--text-col", "text", "--k", "20"]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["rows"] == 2
        got = {
            r["doc_id"]: r["text_deduped"]
            for r in spark.read.parquet(out).collect()
        }
        assert PASSAGE in got[1] and PASSAGE not in got[2]

    def test_plan_has_no_python_udf(self, spark):
        docs = {1: PASSAGE, 2: PASSAGE}
        plan = strip_duplicated_substrings(
            _df(spark, docs), "doc_id", "text", k=20
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

class TestCanonicalOverlapReport:
    def test_planted_overlap_reported(self, spark):
        """r11 verdict ask #6: the canonical/excised-span overlap
        artifact gets a counter. Plant it: Q's canonical lives in doc
        1, docs 2 and 3 both hold Q+P — doc 2's Q-region is excised
        (canonical elsewhere) while doc 2 OWNS the canonicals of the
        grams straddling the Q/P junction (they recur only in doc 3).
        Those straddling canonical anchors overlap doc 2's excised
        span: the corpus keeps no intact copy of the junction region,
        and the report must surface exactly them."""
        from opentelemetry_iceberg_exporter_spark.operators.substring_dedup import (
            canonical_overlap_report,
        )

        k = 20
        Q = "zebra yak xenon walrus vulture toadstool snake"
        P = "apple banana cherry dates elderberry figs grape"
        docs = {1: Q, 2: Q + P, 3: Q + P}
        rep = canonical_overlap_report(
            _df(spark, docs), "doc_id", "text", k=k
        ).collect()
        assert rep, "planted overlap must be reported"
        assert {r["doc_id"] for r in rep} == {2}
        # the excised span in doc 2 is exactly its Q region
        assert {(r["span_start"], r["span_end"]) for r in rep} == {(0, len(Q))}
        # reported anchors are precisely the k-1 straddling canonicals
        assert sorted(r["pos"] for r in rep) == list(
            range(len(Q) - k + 1, len(Q))
        )
        # and every row satisfies the overlap predicate
        for r in rep:
            assert r["pos"] < r["span_end"] and r["pos"] + k > r["span_start"]

    def test_clean_corpus_reports_nothing(self, spark):
        from opentelemetry_iceberg_exporter_spark.operators.substring_dedup import (
            canonical_overlap_report,
        )

        # fillers must be non-repetitive: an "A"*30 run self-duplicates
        # its k-grams and the run's canonical LEGITIMATELY overlaps the
        # run's excised span (the artifact is real there)
        docs = {
            1: "one two three four five six " + PASSAGE + " seven eight nine",
            2: "cold warm hot tepid frozen " + PASSAGE + " red green blue",
        }
        # the only duplicated region is the passage, whose canonical
        # (doc 1) has no excised span in its own doc -> empty report
        assert (
            canonical_overlap_report(
                _df(spark, docs), "doc_id", "text", k=20
            ).count()
            == 0
        )

    def test_cli_overlap_report(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        k = 20
        Q = "zebra yak xenon walrus vulture toadstool snake"
        P = "apple banana cherry dates elderberry figs grape"
        docs = {1: Q, 2: Q + P, 3: Q + P}
        src = str(tmp_path / "in_ovl")
        _df(spark, docs).write.parquet(src)
        out = str(tmp_path / "out_ovl")
        rc = main(
            ["substr-dedup", "--input", src, "--output", out,
             "--text-col", "text", "--k", str(k), "--overlap-report"]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["rows"] == k - 1  # the straddling canonical anchors
        rows = spark.read.parquet(out).collect()
        assert {r["doc_id"] for r in rows} == {2}
        assert set(rows[0].asDict()) == {
            "doc_id", "pos", "span_start", "span_end"
        }

    def test_overlap_report_plan_no_product(self, spark):
        """The overlap join has an equi component (doc_id), so Catalyst
        must pick a hash/sort-merge join with the range predicate as a
        residual — never a nested-loop/cartesian product (which would
        be O(anchors x spans) at corpus scale)."""
        from opentelemetry_iceberg_exporter_spark.operators.substring_dedup import (
            canonical_overlap_report,
        )
        from opentelemetry_iceberg_exporter_spark.plans.inspect import (
            join_strategies,
        )

        docs = {1: PASSAGE, 2: PASSAGE + PASSAGE}
        df = canonical_overlap_report(_df(spark, docs), "doc_id", "text", k=20)
        js = join_strategies(df)
        assert "CartesianProduct" not in js and "BroadcastNestedLoopJoin" not in js

    def test_random_corpus_matches_independent_reference(self, spark):
        """Randomized cross-check: the distributed overlap report equals
        an independent dict/loop computation (canonical occurrences of
        duplicated grams intersected with the reference's merged
        non-canonical spans) on a corpus with planted shared passages —
        the same hard-signal pattern the strip operator carries."""
        import hashlib

        from opentelemetry_iceberg_exporter_spark.operators.substring_dedup import (
            canonical_overlap_report,
        )

        def overlap_reference(docs, k):
            occ = {}
            for d in sorted(docs):
                t = docs[d]
                for p in range(len(t) - k + 1):
                    occ.setdefault(t[p : p + k], []).append((d, p))
            canon = [min(w) for w in occ.values() if len(w) >= 2]
            spans, _ = _reference(docs, k)
            out = set()
            for d, p in canon:
                for a, b in spans.get(d, []):
                    if p < b and p + k > a:
                        out.add((d, p, a, b))
            return out

        rng = random.Random(31)
        alphabet = "abcdef "
        base = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(50, 150)))
            for _ in range(10)
        ]
        shared = "".join(rng.choice(alphabet) for _ in range(60))
        docs = {}
        for i, t in enumerate(base):
            body = t
            if i % 2 == 0:  # plant the shared passage mid-document
                cut = rng.randint(0, len(body))
                body = body[:cut] + shared + body[cut:]
            docs[i] = body
        k = 25
        got = {
            (r["doc_id"], r["pos"], r["span_start"], r["span_end"])
            for r in canonical_overlap_report(
                _df(spark, docs), "doc_id", "text", k=k
            ).collect()
        }
        assert got == overlap_reference(docs, k)

    def test_cli_flags_mutually_exclusive(self, spark, tmp_path):
        """--spans-only and --overlap-report produce different schemas;
        asking for both must error, not silently prefer one."""
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        src = str(tmp_path / "in_flags")
        _df(spark, {1: PASSAGE}).write.parquet(src)
        with pytest.raises(SystemExit):
            main(
                ["substr-dedup", "--input", src,
                 "--output", str(tmp_path / "o"),
                 "--spans-only", "--overlap-report"]
            )
