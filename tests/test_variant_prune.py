"""File pruning for VARIANT-path predicates (sinks/variant_prune.py).

Spark 4.1 writes variant SHREDDED by default — typed paths become real
parquet columns with row-group statistics — so a conjunct like
`try_variant_get(attrs, '$.k', 'long') >= 500` can provably exclude
files even though Iceberg manifests carry no variant bounds. These tests
pin the grammar, the per-level reachability rules of the shredding
spec's exclusivity invariants (type-mismatch residuals, missing keys,
non-object rows), the file-skip counts (the test_dml_pruning.py
pattern), DML correctness under heterogeneous values, and the
unshredded-twin equivalence (same rows, no pruning, never wrong).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    plan_dml_files,
)
from opentelemetry_iceberg_exporter_spark.sinks.variant_prune import (
    VariantPredicate,
    file_may_match,
    parse_variant_conjuncts,
)

try:
    from pyspark.sql.types import VariantType
except ImportError:  # pragma: no cover - Spark < 4
    VariantType = None

pytestmark = pytest.mark.skipif(
    VariantType is None, reason="Spark VariantType unavailable"
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("attrs", VariantType() if VariantType else LongType(), True),
    ]
)


def _json_df(spark, base, n=50):
    return spark.range(base, base + n).select(
        F.col("id"),
        F.parse_json(
            F.concat(
                F.lit('{"k": '),
                F.col("id").cast("string"),
                F.lit(', "s": "v'),
                F.col("id").cast("string"),
                F.lit('", "nest": {"d": '),
                F.col("id").cast("string"),
                F.lit("}}"),
            )
        ).alias("attrs"),
    )


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """Four disjoint-id commits (one file each: ids 0-49, 100-149,
    200-249, 300-349) plus a heterogeneous fifth file where `k` is a
    STRING in one row (type-mismatch residual)."""
    cat = FsCatalog(str(tmp_path_factory.mktemp("wh")))
    t = cat.create_table("q", "vp", SCHEMA, properties={"format-version": "3"})
    for base in (0, 100, 200, 300):
        t.append_dataframe(_json_df(spark, base).coalesce(1))
    hx = spark.createDataFrame(
        [(900, '{"k": "high"}'), (901, '{"k": 901}')], "id long, j string"
    ).select("id", F.parse_json("j").alias("attrs"))
    t.append_dataframe(hx.coalesce(1))
    return t


class TestGrammar:
    COLS = {"attrs"}

    def test_typed_forms_and_flip(self):
        preds = parse_variant_conjuncts(
            [
                "try_variant_get(attrs, '$.k', 'long') >= 10",
                "20 >= variant_get(attrs, '$.k', 'long')",
            ],
            self.COLS,
        )
        assert preds == [VariantPredicate("attrs", ("k",), "long", 10, 20)]

    def test_sql_escaped_bracket_spelling(self, spark, tmp_path):
        """The SAME path literal spelled two ways: ['k'] pre-parse (the
        Column API) and [''k''] raw inside a SQL where-string (the
        engine sees the conjunct before SQL unescaping) — both prune,
        and the where form ALSO row-filters end to end."""
        from pyspark.sql import functions as F

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            FsCatalog,
            plan_dml_files,
        )

        preds = parse_variant_conjuncts(
            ["try_variant_get(attrs, '$[''http.code'']', 'long') >= 10"],
            self.COLS,
        )
        assert preds == [
            VariantPredicate("attrs", ("http.code",), "long", 10, None)
        ]
        cat = FsCatalog(str(tmp_path / "wh"))
        df = spark.range(50).select(
            F.col("id"),
            F.parse_json(
                F.concat(
                    F.lit('{"http.status_code": '),
                    (200 + F.col("id")).cast("string"),
                    F.lit("}"),
                )
            ).alias("attrs"),
        )
        t = cat.create_table(
            "q", "esc", df.schema, properties={"format-version": "3"}
        )
        t.append_dataframe(df.coalesce(1))
        where = "try_variant_get(attrs, '$[''http.status_code'']', 'long') >= 1000"
        md = t.metadata()
        scan, excl, _ = plan_dml_files(md, md["current-snapshot-id"], where)
        assert (len(scan), len(excl)) == (0, 1)  # provably matchless
        assert t.read(spark, where=where).count() == 0
        assert (
            t.read(
                spark,
                where="try_variant_get(attrs, "
                "'$[''http.status_code'']', 'long') >= 240",
            ).count()
            == 10
        )

    def test_between_and_brackets(self):
        preds = parse_variant_conjuncts(
            ["try_variant_get(attrs, '$['http.code'].x', 'long') "
             "BETWEEN 3 AND 7"],
            self.COLS,
        )
        assert preds == [
            VariantPredicate("attrs", ("http.code", "x"), "long", 3, 7)
        ]

    def test_string_and_boolean_literals(self):
        preds = parse_variant_conjuncts(
            [
                "variant_get(attrs, '$.s', 'string') = 'it''s'",
                "variant_get(attrs, '$.b', 'boolean') = true",
            ],
            self.COLS,
        )
        assert VariantPredicate("attrs", ("s",), "string", "it's", "it's") in preds
        assert VariantPredicate("attrs", ("b",), "boolean", True, True) in preds

    def test_conservative_rejections(self):
        assert (
            parse_variant_conjuncts(
                [
                    "try_variant_get(other, '$.k', 'long') = 1",  # not variant
                    "try_variant_get(attrs, '$.k', 'timestamp') = 1",  # type
                    "try_variant_get(attrs, '$.k', 'long') = 1.5",  # non-int
                    "try_variant_get(attrs, '$.a[3]', 'long') = 1",  # index
                    "try_variant_get(attrs, '$.k', 'long') != 1",  # op
                ],
                self.COLS,
            )
            == []
        )


class TestFileSkipCounts:
    def test_long_range_prunes_disjoint_files(self, table):
        md = table.metadata()
        scan, exc, _ = plan_dml_files(
            md, md["current-snapshot-id"],
            "try_variant_get(attrs, '$.k', 'long') >= 320",
        )
        # 300-file scanned; hetero file kept (string residual for k);
        # three low files provably matchless
        assert len(scan) == 2 and len(exc) == 3

    def test_missing_path_excludes_everything(self, table):
        md = table.metadata()
        scan, exc, _ = plan_dml_files(
            md, md["current-snapshot-id"],
            "try_variant_get(attrs, '$.missing', 'long') = 5",
        )
        assert len(scan) == 0 and len(exc) == 5

    def test_nested_path_prunes(self, table):
        md = table.metadata()
        scan, exc, _ = plan_dml_files(
            md, md["current-snapshot-id"],
            "try_variant_get(attrs, '$.nest.d', 'long') BETWEEN 120 AND 130",
        )
        # only the 100-file can hold nest.d in range; hetero file has no
        # nest at all (attrs.value all-null: provably unreachable)
        assert len(scan) == 1 and len(exc) == 4

    def test_type_mismatch_extraction_keeps_files(self, table):
        """Extracting k as STRING over long-shredded files: physical
        type mismatch means stats prove nothing — keep everything with
        a k leaf (conservative, never wrong)."""
        md = table.metadata()
        scan, exc, _ = plan_dml_files(
            md, md["current-snapshot-id"],
            "try_variant_get(attrs, '$.k', 'string') = 'x'",
        )
        assert len(exc) == 0

    def test_conjunct_composition_with_plain_columns(self, table):
        md = table.metadata()
        scan, exc, _ = plan_dml_files(
            md, md["current-snapshot-id"],
            "id < 200 AND try_variant_get(attrs, '$.k', 'long') >= 100",
        )
        # id bound drops 200/300/hetero; variant bound drops the 0-file
        assert len(scan) == 1 and len(exc) == 4


class TestDmlCorrectness:
    def test_cow_delete_with_variant_predicate(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("q", "vd", SCHEMA, properties={"format-version": "3"})
        for base in (0, 100):
            t.append_dataframe(_json_df(spark, base).coalesce(1))
        hx = spark.createDataFrame(
            [(900, '{"k": "high"}'), (901, '{"k": 901}')], "id long, j string"
        ).select("id", F.parse_json("j").alias("attrs"))
        t.append_dataframe(hx.coalesce(1))
        _, n = t.delete_where(
            spark, "try_variant_get(attrs, '$.k', 'long') >= 120",
            mode="copy-on-write",
        )
        # 120..149 (30 rows) + id 901 (k=901); the string 'high' row must
        # survive (long extraction is NULL for it)
        assert n == 31
        got = t.read(spark)
        assert got.count() == 71
        assert got.where("id = 900").count() == 1

    def test_update_with_variant_predicate_dv(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("q", "vu", SCHEMA, properties={"format-version": "3"})
        for base in (0, 100):
            t.append_dataframe(_json_df(spark, base).coalesce(1))
        _, n = t.update_where(
            spark, "try_variant_get(attrs, '$.nest.d', 'long') BETWEEN 110 AND 114",
            {"id": "id + 1000"},
            mode="deletion-vectors",
        )
        assert n == 5
        ids = {r["id"] for r in t.read(spark).select("id").collect()}
        assert {1110, 1111, 1112, 1113, 1114} <= ids
        assert not {110, 111, 112, 113, 114} & ids


class TestUnshreddedTwin:
    def test_reads_identical_and_pruning_stays_sound(self, spark, tmp_path):
        """The same data written UNSHREDDED (writeShredding.enabled
        off — the spec's plain metadata+value encoding, what an external
        pre-4.1 writer produces) reads identically through the engine,
        and variant-path pruning keeps every unshredded file
        (footer proves nothing — conservative, never wrong)."""
        key = "spark.sql.variant.writeShredding.enabled"
        cat = FsCatalog(str(tmp_path / "wh"))
        shredded = cat.create_table(
            "q", "sh", SCHEMA, properties={"format-version": "3"}
        )
        unshredded = cat.create_table(
            "q", "un", SCHEMA, properties={"format-version": "3"}
        )
        shredded.append_dataframe(_json_df(spark, 0, 20).coalesce(1))
        old = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            unshredded.append_dataframe(_json_df(spark, 0, 20).coalesce(1))
        finally:
            spark.conf.set(key, old)
        proj = [
            "id",
            F.try_variant_get("attrs", "$.k", "long").alias("k"),
            F.try_variant_get("attrs", "$.s", "string").alias("s"),
            F.try_variant_get("attrs", "$.nest.d", "long").alias("d"),
            F.to_json(F.col("attrs")).alias("j"),
        ]
        a = sorted(map(tuple, shredded.read(spark).select(*proj).collect()))
        b = sorted(map(tuple, unshredded.read(spark).select(*proj).collect()))
        assert a == b and len(a) == 20

        # prove the twin really is unshredded: no typed_value leaves
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import live_files
        from opentelemetry_iceberg_exporter_spark.sinks.parquet_footer import (
            footer_row_group_stats,
        )

        md = unshredded.metadata()
        data, _ = live_files(md, md["current-snapshot-id"])
        cols = footer_row_group_stats(data[0].file_path)[0]["columns"]
        assert "attrs.value" in cols and not any(
            ".typed_value" in c for c in cols
        )

        pred = "try_variant_get(attrs, '$.k', 'long') >= 999"
        scan_s, exc_s, _ = plan_dml_files(md, md["current-snapshot-id"], pred)
        assert len(scan_s) == 1 and exc_s == []  # unshredded: kept
        md_s = shredded.metadata()
        scan_h, exc_h, _ = plan_dml_files(md_s, md_s["current-snapshot-id"], pred)
        assert scan_h == [] and len(exc_h) == 1  # shredded: provably out


class TestReadWhere:
    def test_fs_read_where_filters_and_prunes(self, spark, table):
        df = table.read(
            spark, where="try_variant_get(attrs, '$.k', 'long') >= 320"
        )
        ids = sorted(r["id"] for r in df.select("id").collect())
        assert ids == list(range(320, 350)) + [901]

    def test_where_excludes_tuple_params(self, spark, table):
        with pytest.raises(ValueError, match="subsumes"):
            table.read(spark, where="id > 3", column_range=("id", 0, 1))

    def test_rest_read_where(self, spark, tmp_path):
        import os

        from rest_stub import make_server

        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            cat = RestCatalogClient(uri, warehouse=warehouse)
            cat.ensure_namespace("q")
            t = cat.ensure_table(
                "q", "vr", SCHEMA, properties={"format-version": "3"}
            )
            for base in (0, 100):
                t.append_dataframe(_json_df(spark, base).coalesce(1))
            df = t.read(
                spark,
                where="try_variant_get(attrs, '$.nest.d', 'long') BETWEEN 5 AND 7",
            )
            assert sorted(r["id"] for r in df.collect()) == [5, 6, 7]
        finally:
            server.shutdown()


class TestSoundnessDirect:
    def test_unreadable_footer_keeps_file(self, tmp_path):
        p = str(tmp_path / "junk.parquet")
        with open(p, "wb") as f:
            f.write(b"garbage")
        pred = VariantPredicate("attrs", ("k",), "long", 0, None)
        assert file_may_match(p, pred) is True


class TestScanCli:
    def test_scan_where_extract_lineage(self, spark, tmp_path, capsys):
        """CLI: `scan --where` prunes via variant footer stats and
        filters rows; `--extract` projects typed paths; `--with-lineage`
        appends the v3 row-lineage columns."""
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("ns", "vt", SCHEMA, properties={"format-version": "3"})
        for base in (0, 100):
            t.append_dataframe(_json_df(spark, base).coalesce(1))
        out = str(tmp_path / "out")
        rc = main(
            [
                "scan",
                "--warehouse", str(tmp_path / "wh"),
                "--namespace", "ns",
                "--table", "vt",
                "--output", out,
                "--where", "try_variant_get(attrs, '$.k', 'long') >= 120",
                "--extract", "attrs:$.k:long",
                "--extract", "attrs:$['nest'].d:long",
                "--with-lineage",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["rows"] == 30 and stats["files_pruned"] == 1
        got = spark.read.parquet(out)
        assert {"k", "d", "_row_id"} <= set(got.columns)
        rows = {r["id"]: (r["k"], r["d"]) for r in got.collect()}
        assert rows[120] == (120, 120) and len(rows) == 30

    def test_scan_where_ns_literal(self, spark, tmp_path, capsys):
        """CLI: epoch-nanos int literals on a timestamptz_ns column
        prune through the ns partition transform + file bounds."""
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        cat = FsCatalog(str(tmp_path / "wh"))
        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("ts_ns", LongType(), True),
            ]
        )
        t = cat.create_table(
            "ns", "nst", schema,
            partition_source="ts_ns", granularity="daily",
            properties={"format-version": "3"},
            iceberg_types={"ts_ns": "timestamptz_ns"},
        )
        day = 86_400 * 1_000_000_000
        base = 1_705_000_000 * 1_000_000_000
        df = spark.range(6).select(
            F.col("id"), (F.lit(base) + F.col("id") * F.lit(day)).alias("ts_ns")
        )
        t.append_dataframe(df)
        out = str(tmp_path / "out")
        rc = main(
            [
                "scan",
                "--warehouse", str(tmp_path / "wh"),
                "--namespace", "ns",
                "--table", "nst",
                "--output", out,
                "--where", f"ts_ns >= {base + 4 * day}",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["rows"] == 2 and stats["files_pruned"] >= 4
        assert sorted(
            r["id"] for r in spark.read.parquet(out).collect()
        ) == [4, 5]


class TestGrammarProperty:
    """Hypothesis round-trip: a rendered conjunct in EITHER bracket
    spelling must parse back to exactly the predicate that produced it
    — and junk around the grammar must parse to NOTHING (conservatism:
    an unrecognized conjunct contributes zero pruning, never a wrong
    bound)."""

    def test_roundtrip_both_spellings(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from opentelemetry_iceberg_exporter_spark.sinks.variant_prune import (
            VariantPredicate,
            parse_variant_conjuncts,
        )

        ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)
        dotted = st.from_regex(
            r"[A-Za-z0-9_]{1,6}(\.[A-Za-z0-9_]{1,6}){0,2}", fullmatch=True
        )
        ops = st.sampled_from([">=", "<=", ">", "<", "=", "=="])

        @settings(max_examples=200, deadline=None)
        @given(
            col=ident,
            keys=st.lists(dotted, min_size=1, max_size=3),
            op=ops,
            lit=st.integers(min_value=-10**12, max_value=10**12),
            escaped=st.booleans(),
        )
        def run(col, keys, op, lit, escaped):
            q = "''" if escaped else "'"
            path = "$" + "".join(f"[{q}{k}{q}]" for k in keys)
            conj = f"try_variant_get({col}, '{path}', 'long') {op} {lit}"
            preds = parse_variant_conjuncts([conj], {col})
            lo = lit if op in (">", ">=", "=", "==") else None
            hi = lit if op in ("<", "<=", "=", "==") else None
            assert preds == [
                VariantPredicate(col, tuple(keys), "long", lo, hi)
            ]
            # an unknown column contributes nothing
            assert parse_variant_conjuncts([conj], {col + "_other"}) == []

        run()

    def test_junk_parses_to_nothing(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from opentelemetry_iceberg_exporter_spark.sinks.variant_prune import (
            parse_variant_conjuncts,
        )

        @settings(max_examples=200, deadline=None)
        @given(st.text(max_size=80))
        def run(junk):
            # must never raise, and arbitrary text never yields a bound
            # unless it happens to BE a valid conjunct on 'attrs'
            preds = parse_variant_conjuncts([junk], {"attrs"})
            for p in preds:
                assert p.column == "attrs" and (
                    p.lo is not None or p.hi is not None
                )

        run()
