"""URL/domain curation (operators/web.py): host extraction cross-pinned
against the DuckDB mirror, registrable-domain grouping, concentration
reports, dominant-domain flagging, plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.operators.web import (
    domain_col,
    domain_report,
    duck_domain_sql,
    duck_registrable_sql,
    flag_dominant_domains,
    registrable_domain_col,
)

URLS = [
    ("u1", "https://news.example.com/a/b?q=1"),
    ("u2", "http://user:pw@Example.COM:8080/path"),
    ("u3", "example.com/bare"),
    ("u4", "ftp://files.archive.org/x"),
    ("u5", "not a url at all"),
    ("u6", None),
    ("u7", "https://sub.deep.example.com#frag"),
]


def _df(spark):
    return spark.createDataFrame(URLS, ["doc_id", "url"])


class TestDomainExtraction:
    def test_hosts(self, spark):
        got = {
            r["doc_id"]: r["d"]
            for r in _df(spark).select(
                "doc_id", domain_col(F.col("url")).alias("d")
            ).collect()
        }
        assert got["u1"] == "news.example.com"
        assert got["u2"] == "example.com"  # userinfo + port stripped, lowercased
        assert got["u3"] == "example.com"  # scheme-less
        assert got["u4"] == "files.archive.org"
        assert got["u5"] is None
        assert got["u6"] is None

    def test_registrable(self, spark):
        got = {
            r["doc_id"]: r["d"]
            for r in _df(spark).select(
                "doc_id", registrable_domain_col(F.col("url")).alias("d")
            ).collect()
        }
        assert got["u1"] == "example.com"
        assert got["u7"] == "example.com"
        assert got["u4"] == "archive.org"

    def test_cross_engine_parity(self, spark):
        spark_rows = sorted(
            (r["doc_id"], r["d"], r["rd"])
            for r in _df(spark).select(
                "doc_id",
                domain_col(F.col("url")).alias("d"),
                registrable_domain_col(F.col("url")).alias("rd"),
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE u AS SELECT * FROM (VALUES "
            + ", ".join(
                f"('{i}', " + ("NULL" if v is None else f"'{v}'") + ")"
                for i, v in URLS
            )
            + ") t(doc_id, url)"
        )
        duck_rows = sorted(
            con.execute(
                f"SELECT doc_id, {duck_domain_sql('url')} AS d, "
                f"{duck_registrable_sql('url')} AS rd FROM u"
            ).fetchall()
        )
        assert spark_rows == duck_rows


class TestConcentration:
    def _corpus(self, spark):
        rows = [(f"d{i}", f"https://spamfarm.biz/p{i}") for i in range(10)] + [
            (f"g{i}", f"https://site{i}.org/x") for i in range(5)
        ]
        return spark.createDataFrame(rows, ["doc_id", "url"])

    def test_report_shares(self, spark):
        rep = {
            r["domain"]: (r["n_docs"], r["share"])
            for r in domain_report(self._corpus(spark), "url").collect()
        }
        assert rep["spamfarm.biz"] == (10, 10 / 15)
        assert rep["site0.org"][0] == 1

    def test_flagging(self, spark):
        flags = {
            r["doc_id"]: r
            for r in flag_dominant_domains(
                self._corpus(spark), "doc_id", "url", max_share=0.5
            ).collect()
        }
        assert all(flags[f"d{i}"]["domain_flagged"] for i in range(10))
        assert not any(flags[f"g{i}"]["domain_flagged"] for i in range(5))

    def test_cap_per_domain(self, spark):
        from opentelemetry_iceberg_exporter_spark.operators.web import (
            cap_per_domain,
        )

        capped = cap_per_domain(self._corpus(spark), "doc_id", "url", 3)
        rows = capped.collect()
        from collections import Counter

        by_domain = Counter(
            r["url"].split("//")[1].split("/")[0] for r in rows
        )
        assert by_domain["spamfarm.biz"] == 3  # capped
        assert sum(v for k, v in by_domain.items() if k != "spamfarm.biz") == 5
        # deterministic: same survivors on rerun and under repartitioning
        again = cap_per_domain(
            self._corpus(spark).repartition(7), "doc_id", "url", 3
        )
        assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in again.collect()}
        # a different seed picks a (generally) different sample, still 3
        other = cap_per_domain(self._corpus(spark), "doc_id", "url", 3, seed=9)
        assert sum(1 for r in other.collect() if r["url"].startswith("https://spamfarm")) == 3

    def test_cap_deterministic_with_null_and_duplicate_ids(self, spark):
        """Null/duplicate ids must not break the rerun-stability
        contract: the order hash covers (id, url) with null tokens."""
        from opentelemetry_iceberg_exporter_spark.operators.web import (
            cap_per_domain,
        )

        rows = [(None, f"https://farm.biz/p{i}") for i in range(8)] + [
            ("dup", f"https://farm.biz/q{i}") for i in range(4)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "url"])
        first = {
            r["url"] for r in cap_per_domain(df, "doc_id", "url", 5).collect()
        }
        assert len(first) == 5
        again = {
            r["url"]
            for r in cap_per_domain(df.repartition(9), "doc_id", "url", 5).collect()
        }
        assert first == again

    def test_cap_keeps_null_hosts(self, spark):
        from opentelemetry_iceberg_exporter_spark.operators.web import (
            cap_per_domain,
        )

        df = spark.createDataFrame(
            [("a", None), ("b", None), ("c", "junk")], ["doc_id", "url"]
        )
        assert cap_per_domain(df, "doc_id", "url", 1).count() == 3

    def test_null_urls_never_flagged(self, spark):
        df = spark.createDataFrame(
            [("a", None), ("b", "junk")], ["doc_id", "url"]
        )
        rows = {r["doc_id"]: r for r in
                flag_dominant_domains(df, "doc_id", "url").collect()}
        assert not rows["a"]["domain_flagged"]
        assert rows["a"]["domain"] is None

    def test_share_table_broadcasts(self, spark):
        plan = (
            flag_dominant_domains(self._corpus(spark), "doc_id", "url")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
