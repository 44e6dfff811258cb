"""OAuth2 client-credentials auth for the REST catalog (the spec's
/v1/oauth/tokens flow, RFC 6749 grant): token fetched before the
/v1/config handshake, expires_in honored with proactive refresh, one
refresh+replay on 401, RFC-shaped OAuth errors surfaced. The stub
server enforces bearer tokens it minted itself and can revoke them
mid-session."""

from __future__ import annotations

import time

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
    RestCatalogClient,
    RestError,
)

from rest_stub import make_server

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("v", StringType(), True),
    ]
)


@pytest.fixture()
def oauth_server(tmp_path):
    import os

    warehouse = str(tmp_path / "wh")
    os.makedirs(warehouse)
    server, state, uri = make_server(warehouse)
    state.oauth_credentials = {"svc-exporter": "s3cret"}
    yield state, uri, warehouse
    server.shutdown()


class TestOauthFlow:
    def test_token_fetched_before_config_and_used(self, oauth_server):
        state, uri, warehouse = oauth_server
        client = RestCatalogClient(
            uri, warehouse=warehouse, credential="svc-exporter:s3cret"
        )
        assert state.oauth_issued == 1
        client.ensure_namespace("otel")
        assert "otel" in client.list_namespaces()
        # the token route was hit FIRST, before /v1/config
        assert state.requests[0] == ("POST", "/v1/oauth/tokens")

    def test_bad_credential_is_rfc_shaped_error(self, oauth_server):
        _state, uri, warehouse = oauth_server
        with pytest.raises(RestError, match="invalid_client"):
            RestCatalogClient(
                uri, warehouse=warehouse, credential="svc-exporter:wrong"
            )

    def test_token_and_credential_mutually_exclusive(self, oauth_server):
        _state, uri, warehouse = oauth_server
        with pytest.raises(ValueError, match="not both"):
            RestCatalogClient(
                uri, warehouse=warehouse, token="t", credential="a:b"
            )

    def test_proactive_refresh_at_expiry(self, oauth_server):
        state, uri, warehouse = oauth_server
        state.oauth_expires_in = 30  # client margin floors this to ~1s
        client = RestCatalogClient(
            uri, warehouse=warehouse, credential="svc-exporter:s3cret"
        )
        assert state.oauth_issued == 1
        time.sleep(1.2)
        client.list_namespaces()  # past expiry: refresh BEFORE the call
        assert state.oauth_issued == 2

    def test_reactive_refresh_on_revocation(self, oauth_server):
        state, uri, warehouse = oauth_server
        client = RestCatalogClient(
            uri, warehouse=warehouse, credential="svc-exporter:s3cret"
        )
        state.revoke_oauth_tokens()  # server-side early revocation
        assert client.list_namespaces() == []  # 401 -> refresh -> replay
        assert state.oauth_issued == 2

    def test_second_denial_is_real(self, oauth_server):
        state, uri, warehouse = oauth_server
        client = RestCatalogClient(
            uri, warehouse=warehouse, credential="svc-exporter:s3cret"
        )
        state.revoke_oauth_tokens()
        state.oauth_credentials = {"svc-exporter": "rotated-away"}
        with pytest.raises(RestError, match="invalid_client"):
            client.list_namespaces()

    def test_full_table_lifecycle_over_oauth(self, spark, oauth_server):
        state, uri, warehouse = oauth_server
        client = RestCatalogClient(
            uri, warehouse=warehouse, credential="svc-exporter:s3cret"
        )
        client.ensure_namespace("otel")
        t = client.ensure_table("otel", "tbl", SCHEMA)
        t.append_dataframe(
            spark.range(10).selectExpr("id", "cast(id as string) v")
        )
        # revoke mid-session: the read path must transparently re-auth
        state.revoke_oauth_tokens()
        assert t.read(spark).count() == 10


class TestConfig:
    def test_validation(self, tmp_path):
        from opentelemetry_iceberg_exporter_spark.config import CatalogConfig

        bad = CatalogConfig(
            catalog_type="rest", uri="http://x", credential="noseparator"
        )
        with pytest.raises(ValueError, match="client_id:client_secret"):
            bad.validate()
        both = CatalogConfig(
            catalog_type="rest", uri="http://x", token="t", credential="a:b"
        )
        with pytest.raises(ValueError, match="mutually exclusive"):
            both.validate()
        ok = CatalogConfig(
            catalog_type="rest", uri="http://x", credential="a:b"
        )
        ok.validate()

    def test_sink_threads_credential(self, spark, oauth_server, tmp_path):
        from opentelemetry_iceberg_exporter_spark.config import (
            CatalogConfig,
            ExporterConfig,
            PartitionConfig,
            StorageConfig,
        )
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_sink import (
            RestIcebergSink,
        )

        state, uri, warehouse = oauth_server
        cfg = ExporterConfig(
            storage=StorageConfig(
                provider="filesystem", bucket=str(tmp_path), prefix="exp"
            ),
            catalog=CatalogConfig(
                catalog_type="rest",
                uri=uri,
                warehouse=warehouse,
                credential="svc-exporter:s3cret",
            ),
            partition=PartitionConfig(granularity="hourly"),
        )
        cfg.validate()
        sink = RestIcebergSink(spark, cfg)
        assert len(sink.ensure_all_tables()) == 7
        assert state.oauth_issued >= 1