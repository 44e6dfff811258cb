"""Iceberg catalog VIEWS (view spec, format-version 1) on both
transports: spec-shaped metadata, create/read/replace with version
history and definition time travel, table/view name-space separation,
and the REST /views routes against the stub server's independent
implementation (create / CommitViewRequest with assert-view-uuid /
rename / drop)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import FsCatalog
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
    RestCatalogClient,
    RestError,
)

from rest_stub import make_server

ORDERS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("region", StringType(), True),
        StructField("amount", DoubleType(), True),
    ]
)

VIEW_SQL = (
    "SELECT region, COUNT(*) AS n, SUM(amount) AS total "
    "FROM mart_orders GROUP BY region"
)
VIEW_SQL_V2 = "SELECT region, MAX(amount) AS max_amount FROM mart_orders GROUP BY region"


def _orders_df(spark, n=30):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("r"), (F.col("id") % 3).cast("string")).alias("region"),
        (F.col("id") * 1.5).alias("amount"),
    )


def _expected(spark, df, sql_over="orders_src"):
    df.createOrReplaceTempView(sql_over)
    return sorted(
        map(
            tuple,
            spark.sql(
                VIEW_SQL.replace("mart_orders", sql_over)
            ).collect(),
        )
    )


class TestFsViews:
    @pytest.fixture()
    def cat(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        t = cat.create_table("mart", "orders", ORDERS)
        t.append_dataframe(_orders_df(spark))
        return cat

    def test_create_read_roundtrip(self, spark, cat):
        v = cat.create_view(spark, "mart", "region_totals", VIEW_SQL)
        got = sorted(map(tuple, v.read(spark).collect()))
        assert got == _expected(spark, _orders_df(spark))
        assert len(got) == 3

    def test_metadata_spec_shape(self, spark, cat):
        v = cat.create_view(spark, "mart", "shape", VIEW_SQL)
        md = v.metadata()
        assert md["format-version"] == 1
        assert len(md["view-uuid"]) == 36
        assert md["current-version-id"] == 1
        (ver,) = md["versions"]
        assert ver["schema-id"] == 0 and ver["version-id"] == 1
        assert ver["summary"]["engine-name"].startswith("opentelemetry")
        (rep,) = ver["representations"]
        assert rep == {"type": "sql", "sql": VIEW_SQL, "dialect": "spark"}
        assert ver["default-namespace"] == ["mart"]
        assert md["version-log"] == [
            {"timestamp-ms": ver["timestamp-ms"], "version-id": 1}
        ]
        (schema,) = md["schemas"]
        assert [f["name"] for f in schema["fields"]] == ["region", "n", "total"]
        assert "_last_column_id" not in schema
        # the analyzed SQL's types are recorded
        assert [f["type"] for f in schema["fields"]] == ["string", "long", "double"]

    def test_replace_versions_and_time_travel(self, spark, cat):
        v = cat.create_view(spark, "mart", "tt", VIEW_SQL)
        assert v.replace(spark, VIEW_SQL_V2) == 2
        md = v.metadata()
        assert md["current-version-id"] == 2
        assert [x["version-id"] for x in md["versions"]] == [1, 2]
        assert [x["version-id"] for x in md["version-log"]] == [1, 2]
        assert len(md["schemas"]) == 2
        assert md["versions"][1]["summary"]["operation"] == "replace"
        assert v.read(spark).columns == ["region", "max_amount"]
        # definition time travel: version 1 still executes
        assert v.read(spark, version_id=1).columns == ["region", "n", "total"]
        with pytest.raises(ValueError, match="no version 9"):
            v.read(spark, version_id=9)

    def test_listing_separation(self, spark, cat):
        cat.create_view(spark, "mart", "vsep", VIEW_SQL)
        assert cat.list_tables("mart") == ["orders"]
        assert cat.list_views("mart") == ["vsep"]
        assert not cat.table_exists("mart", "vsep")
        assert cat.view_exists("mart", "vsep")
        assert not cat.view_exists("mart", "orders")

    def test_name_collisions(self, spark, cat):
        with pytest.raises(ValueError, match="a TABLE of that"):
            cat.create_view(spark, "mart", "orders", VIEW_SQL)
        cat.create_view(spark, "mart", "dupe", VIEW_SQL)
        with pytest.raises(ValueError, match="already exists"):
            cat.create_view(spark, "mart", "dupe", VIEW_SQL)
        with pytest.raises(ValueError, match="a VIEW of that"):
            cat.create_table("mart", "dupe", ORDERS)

    def test_drop_and_rename_refusal(self, spark, cat):
        cat.create_view(spark, "mart", "gone", VIEW_SQL)
        assert cat.drop_view("mart", "gone")
        assert not cat.view_exists("mart", "gone")
        assert cat.list_views("mart") == []
        assert not cat.drop_view("mart", "gone")
        with pytest.raises(NotImplementedError, match="rename"):
            cat.rename_view("mart", "x", "mart", "y")

    def test_load_view_missing(self, cat):
        with pytest.raises(FileNotFoundError):
            cat.load_view("mart", "nope")

    def test_recreate_after_plain_drop_names_the_remedy(self, spark, cat):
        """A plain drop leaves the metadata history; re-creating the
        name must say so (and how to purge) instead of surfacing the
        raw v1 CAS conflict — same contract as create_table."""
        cat.create_view(spark, "mart", "ghost", VIEW_SQL)
        cat.drop_view("mart", "ghost")
        with pytest.raises(FileExistsError, match="purge"):
            cat.create_view(spark, "mart", "ghost", VIEW_SQL)
        # purging the remains (what the error prescribes) frees the name
        import shutil

        shutil.rmtree(cat.table_location("mart", "ghost"), ignore_errors=True)
        v = cat.create_view(spark, "mart", "ghost", VIEW_SQL)
        assert v.metadata()["current-version-id"] == 1
        # and a purge-drop never leaves remains in the first place
        cat.drop_view("mart", "ghost", purge=True)
        v2 = cat.create_view(spark, "mart", "ghost", VIEW_SQL_V2)
        assert v2.read(spark).columns == ["region", "max_amount"]

    def test_cross_namespace_view(self, spark, cat):
        t2 = cat.create_table("dims", "labels", StructType(
            [StructField("region", StringType(), True),
             StructField("label", StringType(), True)]
        ))
        t2.append_dataframe(
            spark.createDataFrame(
                [("r0", "zero"), ("r1", "one"), ("r2", "two")], "region string, label string"
            )
        )
        v = cat.create_view(
            spark,
            "mart",
            "labeled",
            "SELECT l.label, COUNT(*) AS n FROM mart_orders o "
            "JOIN dims_labels l ON o.region = l.region GROUP BY l.label",
        )
        got = dict(map(tuple, v.read(spark).collect()))
        assert got == {"zero": 10, "one": 10, "two": 10}

    def test_properties_recorded(self, spark, cat):
        v = cat.create_view(
            spark, "mart", "props", VIEW_SQL, properties={"comment": "totals"}
        )
        assert v.metadata()["properties"] == {"comment": "totals"}


class TestRestViews:
    @pytest.fixture()
    def catalog(self, spark, tmp_path):
        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        client = RestCatalogClient(uri, warehouse=warehouse)
        client.ensure_namespace("mart")
        t = client.ensure_table("mart", "orders", ORDERS)
        t.append_dataframe(_orders_df(spark))
        yield client, state
        server.shutdown()

    def test_create_load_read_parity(self, spark, catalog):
        client, _ = catalog
        v = client.create_view(spark, "mart", "region_totals", VIEW_SQL)
        got = sorted(map(tuple, v.read(spark).collect()))
        assert got == _expected(spark, _orders_df(spark))
        md = client.load_view("mart", "region_totals").metadata()
        assert md["format-version"] == 1 and md["current-version-id"] == 1
        assert md["versions"][0]["representations"][0]["sql"] == VIEW_SQL
        (schema,) = md["schemas"]
        assert [f["name"] for f in schema["fields"]] == ["region", "n", "total"]

    def test_replace_and_time_travel(self, spark, catalog):
        client, _ = catalog
        v = client.create_view(spark, "mart", "tt", VIEW_SQL)
        assert v.replace(spark, VIEW_SQL_V2) == 2
        md = v.metadata()
        assert [x["version-id"] for x in md["versions"]] == [1, 2]
        assert [x["schema-id"] for x in md["versions"]] == [0, 1]
        assert v.read(spark).columns == ["region", "max_amount"]
        assert v.read(spark, version_id=1).columns == ["region", "n", "total"]

    def test_uuid_requirement_conflict(self, spark, catalog):
        client, _ = catalog
        client.create_view(spark, "mart", "guard", VIEW_SQL)
        with pytest.raises(RestError, match="uuid mismatch"):
            client.commit_view(
                "mart",
                "guard",
                {
                    "requirements": [
                        {"type": "assert-view-uuid", "uuid": "0" * 36}
                    ],
                    "updates": [],
                },
            )

    def test_rename_and_drop(self, spark, catalog):
        client, _ = catalog
        client.create_view(spark, "mart", "old", VIEW_SQL)
        client.rename_view("mart", "old", "mart", "new")
        assert not client.view_exists("mart", "old")
        got = sorted(map(tuple, client.load_view("mart", "new").read(spark).collect()))
        assert got == _expected(spark, _orders_df(spark))
        assert client.drop_view("mart", "new")
        assert not client.drop_view("mart", "new")
        assert client.list_views("mart") == []

    def test_listing_and_collisions(self, spark, catalog):
        client, _ = catalog
        client.create_view(spark, "mart", "v1", VIEW_SQL)
        assert client.list_views("mart") == ["v1"]
        assert client.list_tables("mart") == ["orders"]
        with pytest.raises(RestError, match="already exists"):
            client.create_view(spark, "mart", "orders", VIEW_SQL)
        with pytest.raises(RestError, match="already exists"):
            client.create_view(spark, "mart", "v1", VIEW_SQL)


SVC_SQL = (
    "SELECT service_name, COUNT(*) AS n FROM otel_otel_traces "
    "GROUP BY service_name"
)
SVC_SQL_V2 = "SELECT COUNT(*) AS total FROM otel_otel_traces"


def _exporter_config(tmp_path, views, catalog_type="fs", uri=""):
    from opentelemetry_iceberg_exporter_spark.config import (
        CatalogConfig,
        ExporterConfig,
        PartitionConfig,
        StorageConfig,
    )

    return ExporterConfig(
        storage=StorageConfig(
            provider="filesystem", bucket=str(tmp_path), prefix="raw"
        ),
        catalog=CatalogConfig(
            catalog_type=catalog_type,
            warehouse=str(tmp_path / "warehouse"),
            uri=uri,
            views=views,
        ),
        partition=PartitionConfig(granularity="hourly"),
    )


class TestDeclaredViews:
    """catalog.views: declared views converge at startup DDL — created
    when missing, REPLACED when the current SQL differs (history
    preserved), untouched when identical."""

    def test_fs_convergence(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
        )

        cfg = _exporter_config(tmp_path, {"svc_counts": SVC_SQL})
        cfg.catalog.validate()
        FsIcebergSink(spark, cfg).ensure_all_tables()
        cat = FsCatalog(cfg.catalog.warehouse)
        v = cat.load_view("otel", "svc_counts")
        assert v.metadata()["current-version-id"] == 1
        assert v.read(spark).count() == 0  # analyzes + runs over empty tables
        # same SQL, fresh process: no new version
        FsIcebergSink(spark, cfg).ensure_all_tables()
        assert v.metadata()["current-version-id"] == 1
        # changed SQL: replace, history preserved
        cfg2 = _exporter_config(tmp_path, {"svc_counts": SVC_SQL_V2})
        FsIcebergSink(spark, cfg2).ensure_all_tables()
        md = v.metadata()
        assert md["current-version-id"] == 2
        assert md["versions"][0]["representations"][0]["sql"] == SVC_SQL
        assert v.read(spark).columns == ["total"]

    def test_rest_convergence(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            RestIcebergSink,
        )

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            cfg = _exporter_config(
                tmp_path, {"svc_counts": SVC_SQL}, catalog_type="rest", uri=uri
            )
            RestIcebergSink(spark, cfg).ensure_all_tables()
            client = RestCatalogClient(uri, warehouse=warehouse)
            v = client.load_view("otel", "svc_counts")
            assert v.metadata()["current-version-id"] == 1
            RestIcebergSink(spark, cfg).ensure_all_tables()
            assert v.metadata()["current-version-id"] == 1
            cfg2 = _exporter_config(
                tmp_path, {"svc_counts": SVC_SQL_V2}, catalog_type="rest", uri=uri
            )
            RestIcebergSink(spark, cfg2).ensure_all_tables()
            assert v.metadata()["current-version-id"] == 2
        finally:
            server.shutdown()

    def test_fs_declared_view_on_view_dependent_first(self, spark, tmp_path):
        """A declared view may reference ANOTHER declared view, with the
        dependent listed BEFORE its dependency in catalog.views dict
        order — convergence loops to a fixpoint instead of failing on
        the first analysis pass."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
            _ensure_declared_views,
        )

        cfg = _exporter_config(
            tmp_path,
            {
                # dependent FIRST: references otel_svc_counts which does
                # not exist yet on the first round
                "busiest_svc": (
                    "SELECT service_name, n FROM otel_svc_counts "
                    "ORDER BY n DESC LIMIT 1"
                ),
                "svc_counts": SVC_SQL,
            },
        )
        cfg.catalog.validate()
        sink = FsIcebergSink(spark, cfg)
        sink.ensure_all_tables()
        cat = FsCatalog(cfg.catalog.warehouse)
        assert cat.load_view("otel", "busiest_svc").read(spark).count() == 0
        assert cat.load_view("otel", "svc_counts").read(spark).count() == 0
        # idempotent second pass: both kept, no fail rows
        actions = _ensure_declared_views(spark, cfg, cat)
        assert sorted(actions) == ["keep busiest_svc", "keep svc_counts"]

    def test_fs_broken_declared_view_reports_not_aborts(self, spark, tmp_path):
        """A declared view whose SQL never analyzes (missing table) is
        reported as `fail name: reason` — it neither aborts startup DDL
        nor blocks the resolvable declared views."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
            _ensure_declared_views,
        )

        cfg = _exporter_config(
            tmp_path,
            {
                "broken": "SELECT x FROM no_such_table_anywhere",
                "svc_counts": SVC_SQL,
            },
        )
        cfg.catalog.validate()
        FsIcebergSink(spark, cfg).ensure_all_tables()  # must not raise
        cat = FsCatalog(cfg.catalog.warehouse)
        assert cat.load_view("otel", "svc_counts").read(spark).count() == 0
        assert not cat.view_exists("otel", "broken")
        actions = _ensure_declared_views(spark, cfg, cat)
        assert "keep svc_counts" in actions
        assert any(a.startswith("fail broken:") for a in actions)

    def test_rest_declared_view_on_view_dependent_first(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            RestIcebergSink,
        )

        warehouse = str(tmp_path / "warehouse")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            cfg = _exporter_config(
                tmp_path,
                {
                    "busiest_svc": (
                        "SELECT service_name, n FROM otel_svc_counts "
                        "ORDER BY n DESC LIMIT 1"
                    ),
                    "svc_counts": SVC_SQL,
                },
                catalog_type="rest",
                uri=uri,
            )
            cfg.catalog.validate()
            RestIcebergSink(spark, cfg).ensure_all_tables()
            client = RestCatalogClient(uri, warehouse=warehouse)
            v = client.load_view("otel", "busiest_svc")
            assert v.read(spark).count() == 0
        finally:
            server.shutdown()

    def test_views_config_validation(self, tmp_path):
        with pytest.raises(ValueError, match="non-empty SQL"):
            _exporter_config(tmp_path, {"x": "  "}).catalog.validate()
        bad = _exporter_config(tmp_path, {"x": "SELECT 1"})
        bad.catalog.catalog_type = "none"
        with pytest.raises(ValueError, match="pure-Python catalog"):
            bad.catalog.validate()


class TestSqlCliRest:
    def test_sql_over_rest_transport(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("mart")
            t = client.ensure_table("mart", "orders", ORDERS)
            t.append_dataframe(_orders_df(spark))
            rc = main(
                [
                    "sql",
                    "--rest-uri", uri,
                    "--query",
                    "SELECT region, COUNT(*) AS n FROM mart_orders GROUP BY region",
                ]
            )
            assert rc == 0
            lines = capsys.readouterr().out.strip().splitlines()
            tail = json.loads(lines[-1])
            assert tail["rows"] == 3 and "mart_orders" in tail["views"]
        finally:
            server.shutdown()

    def test_sql_requires_a_transport(self, tmp_path):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        with pytest.raises(SystemExit, match="--warehouse"):
            main(["sql", "--query", "SELECT 1"])


class TestViewsOverViews:
    def test_fs_view_referencing_a_view(self, spark, tmp_path):
        cat = FsCatalog(str(tmp_path / "wh"))
        cat.create_table("mart", "orders", ORDERS).append_dataframe(
            _orders_df(spark)
        )
        cat.create_view(spark, "mart", "totals", VIEW_SQL)
        top = cat.create_view(
            spark,
            "mart",
            "top_region",
            "SELECT region, total FROM mart_totals ORDER BY total DESC LIMIT 1",
        )
        (row,) = top.read(spark).collect()
        expected = max(_expected(spark, _orders_df(spark)), key=lambda r: r[2])
        assert (row["region"], row["total"]) == (expected[0], expected[2])

    def test_rest_view_referencing_a_view(self, spark, tmp_path):
        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("mart")
            client.ensure_table("mart", "orders", ORDERS).append_dataframe(
                _orders_df(spark)
            )
            client.create_view(spark, "mart", "totals", VIEW_SQL)
            top = client.create_view(
                spark,
                "mart",
                "regions_seen",
                "SELECT COUNT(*) AS n FROM mart_totals",
            )
            assert top.read(spark).collect()[0]["n"] == 3
        finally:
            server.shutdown()


class TestDefaultOtlpViews:
    def test_declared_default_views_converge_and_read(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            FsIcebergSink,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_views import (
            default_otlp_views,
        )

        cfg = _exporter_config(tmp_path, default_otlp_views())
        cfg.catalog.validate()
        FsIcebergSink(spark, cfg).ensure_all_tables()
        cat = FsCatalog(cfg.catalog.warehouse)
        assert cat.list_views("otel") == sorted(default_otlp_views())
        spans = cat.load_view("otel", "service_span_stats")
        assert spans.read(spark).columns == [
            "service_name", "spans", "errors",
            "avg_duration_ns", "max_duration_ns", "p95_duration_ns",
        ]
        rate = cat.load_view("otel", "service_error_rate")
        assert rate.read(spark).count() == 0  # empty tables analyze + run
        inv = cat.load_view("otel", "metric_series_inventory")
        assert inv.read(spark).columns == [
            "kind", "service_name", "metric_name", "metric_unit", "points"
        ]

    def test_default_views_respect_overrides(self):
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_views import (
            default_otlp_views,
        )

        views = default_otlp_views(
            namespace="tel", prefix="o11y", overrides={"traces": "spans_raw"}
        )
        assert "FROM tel_spans_raw " in views["service_error_rate"]
        assert "tel_o11y_logs" in views["service_log_severity"]


class TestSqlCliSeesCatalogViews:
    def test_sql_query_over_a_catalog_view(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        cat.create_table("mart", "orders", ORDERS).append_dataframe(
            _orders_df(spark)
        )
        cat.create_view(spark, "mart", "totals", VIEW_SQL)
        rc = main(
            [
                "sql",
                "--warehouse", wh,
                "--query", "SELECT COUNT(*) AS n FROM mart_totals",
            ]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert json.loads(lines[0])["n"] == 3
        assert "mart_totals" in json.loads(lines[-1])["views"]


class TestListPagination:
    def test_paged_lists_drain_all_pages(self, spark, tmp_path):
        """The spec's list-endpoint pagination: the client follows
        next-page-token across namespaces/tables/views listings; a
        non-paginating server (no token) is the one-iteration case."""
        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, state, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            for i in range(5):
                client.ensure_namespace(f"ns{i}")
            for i in range(5):
                client.ensure_table(f"ns{i}", f"t{i}", ORDERS)
            for i in range(5):
                client.ensure_table("ns0", f"extra{i}", ORDERS)
            state.list_page_size = 2
            before = len(state.requests)
            assert client.list_namespaces() == [f"ns{i}" for i in range(5)]
            list_calls = [
                p for m, p in state.requests[before:] if m == "GET"
            ]
            assert len(list_calls) == 3  # 5 namespaces / 2 per page
            assert any("pageToken=off-2" in p for p in list_calls)
            assert client.list_tables("ns0") == [
                "extra0", "extra1", "extra2", "extra3", "extra4", "t0"
            ]
        finally:
            server.shutdown()

    def test_cyclic_page_token_fails_on_first_repeat(self, tmp_path, monkeypatch):
        """A byzantine server emitting a cyclic next-page-token must
        fail the listing on the FIRST repeated token, not stall through
        the whole page budget."""
        warehouse = str(tmp_path / "wh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            calls = {"n": 0}

            def cyclic(method, path, body=None, query=None):
                calls["n"] += 1
                return {"namespaces": [["ns"]], "next-page-token": "loop"}

            monkeypatch.setattr(client, "_request", cyclic)
            with pytest.raises(RestError, match="repeated page token"):
                client.list_namespaces()
            assert calls["n"] == 2  # first page + the one repeat
        finally:
            server.shutdown()


class TestViewCli:
    def test_view_lifecycle_fs(self, spark, tmp_path, capsys):
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        wh = str(tmp_path / "wh")
        cat = FsCatalog(wh)
        cat.create_table("mart", "orders", ORDERS).append_dataframe(
            _orders_df(spark)
        )
        base = ["view", "--warehouse", wh, "--namespace", "mart"]
        assert main([*base, "create", "--name", "totals", "--sql", VIEW_SQL]) == 0
        created = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert created["current_version_id"] == 1

        assert main([*base, "read", "--name", "totals"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert json.loads(lines[-1])["rows"] == 3
        assert {json.loads(ln)["region"] for ln in lines[:-1]} == {"r0", "r1", "r2"}

        assert main([*base, "replace", "--name", "totals", "--sql", VIEW_SQL_V2]) == 0
        assert (
            json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
                "current_version_id"
            ]
            == 2
        )
        # definition time travel: v1 still prints three-column rows
        assert main([*base, "read", "--name", "totals", "--version-id", "1"]) == 0
        first = json.loads(capsys.readouterr().out.strip().splitlines()[0])
        assert {"region", "n", "total"} <= set(first)

        assert main([*base, "list"]) == 0
        assert json.loads(capsys.readouterr().out.strip())["views"] == ["totals"]
        assert main([*base, "drop", "--name", "totals"]) == 0
        assert json.loads(capsys.readouterr().out.strip())["dropped"] is True

    def test_view_missing_args(self, tmp_path):
        from opentelemetry_iceberg_exporter_spark.__main__ import main

        with pytest.raises(SystemExit, match="--sql"):
            main(["view", "create", "--warehouse", str(tmp_path), "--name", "x"])
        with pytest.raises(SystemExit, match="--name"):
            main(["view", "read", "--warehouse", str(tmp_path)])
