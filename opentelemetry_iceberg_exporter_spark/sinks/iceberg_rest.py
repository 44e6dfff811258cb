"""Pure-Python Iceberg REST catalog client — the reference's production
catalog mode, executed without jars.

Reference parity: internal/iceberg/catalog_rest.go —
  :86-126  catalog construction + /v1/config handshake + connection test
  :129-165 EnsureNamespace (load, create, re-load on create race)
  :168-240 EnsureTable (client cache, load-create-load race tolerance)
  :243-303 AppendRecords (load fresh, append atomically with snapshot props)
  :306-367 AppendDataFiles (register existing files in one transaction)
  :370-467 ListDataFiles (ALL snapshots' manifests, deduped)
The reference delegates the wire protocol to iceberg-go's REST client;
this module speaks the same public Iceberg REST Catalog OpenAPI directly
(config / namespaces / tables / CommitTable with requirements+updates).

Division of labor is identical to the fs catalog (`iceberg_fs.py`):
EXECUTORS write Parquet data files and the client writes Avro manifests
to shared storage; the REST server arbitrates ONLY the metadata pointer
swap. A commit POSTs `assert-ref-snapshot-id` (the optimistic-concurrency
requirement) plus `add-snapshot`/`set-snapshot-ref` updates; a 409
CommitFailedException means another writer won, and the client reloads
and retries — appends never logically conflict. Commit payloads are
O(new files), so the protocol is unchanged at 100 TB.

Error classification (X2): HTTP failures raise RestError whose text
embeds the server's error type + message, so `sinks/errors.py`
classify_error applies the same permanent/transient matrix as
errors.go:43-115 (401/403/400 permanent; 409 CommitFailed, 429, 5xx
transient).
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .iceberg_fs import (
    DataFile,
    all_data_file_paths,
    data_files_for_paths,
    default_spec_fields,
    hive_data_files,
    iceberg_schema,
    incremental_data_files,
    live_files,
    partition_fields_for,
    plan_dml_files,
    spark_session_timezone,
    plan_scan_metadata,
    plan_delete_rewrite,
    plan_position_delete,
    require_position_delete_files_allowed,
    resolve_dml_branch,
    scan_with_deletes,
    write_partitioned_batch,
    write_snapshot_tree,
    spark_read_schema,
)


class RestError(RuntimeError):
    """An Iceberg REST catalog error response. str() embeds the server
    error type + message so classify_error's substring matrix applies."""

    def __init__(self, status: int, error_type: str, message: str):
        self.status = status
        self.error_type = error_type
        self.message = message
        super().__init__(f"{error_type or 'HTTP ' + str(status)}: {message} (status {status})")


class RestCommitConflictError(RestError):
    """409 CommitFailedException — another writer won the CAS; reload
    the table state and retry the commit."""


class RestPlanUnsupportedError(RestError):
    """The scan-planning ROUTE itself is not implemented (a
    not-implemented status on the initial plan submit). Distinct from
    every other planning failure so auto-mode fallback only disables
    server planning for servers that genuinely lack it — a 404 for an
    expired plan-id mid-poll, or a dropped table, must surface, not
    silently flip the client to local planning forever."""


class RestCommitStateUnknownError(RestError):
    """A commit request failed AMBIGUOUSLY (lost response / 5xx after
    the server may have applied it) AND the landed-check reload also
    failed — the caller cannot know whether the snapshot committed.
    Mirrors Iceberg's CommitStateUnknownException; errors.go punts on
    this case entirely. Do NOT blindly re-commit on this error: the
    snapshot may be live."""


def _is_missing(err: RestError) -> bool:
    return err.status == 404


def _is_ambiguous(err: RestError) -> bool:
    """Failures where the server MAY have applied the commit before the
    response was lost: transport-level errors (status 0), 5xx, and 2xx
    with an undecodable body (the request was accepted — only the
    response payload is byzantine). 4xx are definite rejections."""
    return err.status == 0 or err.status >= 500 or 200 <= err.status < 300


class RestCatalogClient:
    """Minimal Iceberg REST Catalog API client (stdlib urllib only).

    Speaks: GET /v1/config, GET/POST namespaces, GET/POST tables,
    POST tables/{table} (CommitTable). Bearer-token auth like the
    reference's rest.WithOAuthToken (catalog_rest.go:69-76).
    """

    def __init__(
        self,
        uri: str,
        *,
        warehouse: str = "",
        token: str = "",
        credential: str = "",
        oauth2_server_uri: str = "",
        scope: str = "catalog",
        timeout: float = 30.0,
    ):
        self.uri = uri.rstrip("/")
        self.warehouse = warehouse
        self.token = token
        self.timeout = timeout
        # OAuth2 client-credentials (the spec's /v1/oauth/tokens shape):
        # `credential` is "client_id:client_secret"; the client fetches
        # a bearer token BEFORE the /v1/config handshake, tracks
        # expires_in, refreshes proactively at expiry and reactively on
        # a 401 (once per request — a second 401 is a real denial)
        self._credential = credential
        self._oauth_uri = oauth2_server_uri or (self.uri + "/v1/oauth/tokens")
        self._scope = scope
        self._token_expires_at: float | None = None
        if credential and token:
            raise ValueError(
                "pass either a static bearer `token` or an OAuth2 "
                "`credential`, not both (the static token would mask "
                "the refresh behavior)"
            )
        if credential:
            self._fetch_oauth_token()
        self._table_cache: set[str] = set()  # catalog_rest.go:34-36 tableCache
        # /v1/config handshake: server defaults are overridden by client
        # settings, which are overridden by server overrides (spec order)
        query = {"warehouse": warehouse} if warehouse else None
        cfg = self._request("GET", "/v1/config", query=query)
        merged = dict(cfg.get("defaults", {}))
        merged.update(cfg.get("overrides", {}))
        self.prefix = merged.get("prefix", "")
        if not self.warehouse:
            self.warehouse = merged.get("warehouse", "")
        # ConfigResponse `endpoints` (spec): the capability list this
        # server advertises, as "VERB /v1/{prefix}/..." template
        # strings. None = the server predates the field — assume only
        # the baseline surface (no server-side scan planning).
        eps = cfg.get("endpoints")
        self.endpoints: frozenset[str] | None = (
            frozenset(str(e) for e in eps) if eps is not None else None
        )
        # flipped when a server that ADVERTISES planning answers the
        # plan route with a not-implemented status — remembered so auto
        # mode stops re-probing per read
        self._plan_unsupported = False

    # -- transport ---------------------------------------------------------
    def _fetch_oauth_token(self) -> None:
        """RFC 6749 client_credentials grant against the spec's token
        endpoint (form-encoded request, OAuthTokenResponse body). OAuth
        errors arrive in the RFC shape {"error": "...",
        "error_description": "..."} — distinct from the catalog's error
        envelope — and surface as RestError with the OAuth code."""
        cid, _, secret = self._credential.partition(":")
        form = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": cid,
                "client_secret": secret,
                "scope": self._scope,
            }
        ).encode()
        req = urllib.request.Request(self._oauth_uri, data=form, method="POST")
        req.add_header("Content-Type", "application/x-www-form-urlencoded")
        req.add_header("Accept", "application/json")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                res = json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            raw = exc.read()
            try:
                err = json.loads(raw)
                etype = str(err.get("error", ""))
                msg = str(err.get("error_description", ""))
            except ValueError:
                etype, msg = "", raw.decode(errors="replace")[:200]
            raise RestError(exc.code, etype or "OAuthError", msg) from exc
        except urllib.error.URLError as exc:
            raise RestError(0, "ConnectionError", str(exc.reason)) from exc
        tok = res.get("access_token")
        if not tok:
            raise RestError(
                0, "OAuthError", "token response without access_token"
            )
        self.token = tok
        expires_in = res.get("expires_in")
        # 30s safety margin so a token never expires mid-flight
        self._token_expires_at = (
            time.monotonic() + max(float(expires_in) - 30.0, 1.0)
            if expires_in is not None
            else None
        )

    def _request(
        self,
        method: str,
        path: str,
        body: dict | None = None,
        query: dict | None = None,
        _oauth_retry: bool = False,
    ) -> dict:
        url = self.uri + path
        if query:
            url += "?" + urllib.parse.urlencode(query)
        if (
            self._credential
            and self._token_expires_at is not None
            and time.monotonic() >= self._token_expires_at
        ):
            self._fetch_oauth_token()  # proactive refresh at expiry
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Accept", "application/json")
        if data is not None:
            req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                raw = resp.read()
                if not raw:
                    return {}
                try:
                    return json.loads(raw)
                except ValueError as exc:
                    # byzantine 2xx: truncated/garbage body from a proxy
                    # or a mid-write crash — surface a classifiable
                    # RestError instead of a bare JSONDecodeError (and
                    # let commit paths resolve it via the landed check)
                    raise RestError(
                        resp.status,
                        "InvalidResponseException",
                        f"undecodable response body: {raw[:120]!r}",
                    ) from exc
        except urllib.error.HTTPError as exc:
            raw = exc.read()
            if exc.code == 401 and self._credential and not _oauth_retry:
                # the server revoked/expired the token early: one
                # refresh + one replay. 401 means the request was
                # REJECTED before processing, so replaying any method
                # is safe; a second 401 is a real denial.
                self._fetch_oauth_token()
                return self._request(
                    method, path, body=body, query=query, _oauth_retry=True
                )
            try:
                err = json.loads(raw)["error"]
                etype, msg = err.get("type", ""), err.get("message", "")
            except Exception:  # noqa: BLE001 — non-JSON error body
                etype, msg = "", raw.decode(errors="replace")[:200]
            cls = (
                RestCommitConflictError
                if exc.code == 409 and "commitfailed" in etype.lower()
                else RestError
            )
            raise cls(exc.code, etype, msg) from exc
        except urllib.error.URLError as exc:
            # connection refused / DNS / timeout — transient by the
            # errors.go matrix; surface the reason text for classify_error
            raise RestError(0, "ConnectionError", str(exc.reason)) from exc

    def _table_path(self, namespace: str, name: str = "") -> str:
        base = f"/v1/{self.prefix}" if self.prefix else "/v1"
        ns = urllib.parse.quote(namespace, safe="")
        path = f"{base}/namespaces/{ns}/tables"
        return f"{path}/{urllib.parse.quote(name, safe='')}" if name else path

    def _ns_path(self, namespace: str = "") -> str:
        base = f"/v1/{self.prefix}" if self.prefix else "/v1"
        if namespace:
            return f"{base}/namespaces/{urllib.parse.quote(namespace, safe='')}"
        return f"{base}/namespaces"

    # -- namespaces (catalog_rest.go:129-165) ------------------------------
    # -- server-side scan planning (spec PlanTableScan family) --------------
    _PLAN_ENDPOINT = "POST /v1/{prefix}/namespaces/{namespace}/tables/{table}/plan"

    def supports_scan_planning(self) -> bool:
        """True when the /v1/config handshake advertised the plan
        endpoint and no later response proved it unimplemented."""
        return (
            not self._plan_unsupported
            and self.endpoints is not None
            and self._PLAN_ENDPOINT in self.endpoints
        )

    def plan_table_scan(self, namespace: str, name: str, body: dict) -> dict:
        """POST .../plan — submit a PlanTableScanRequest; the result is
        either the completed plan or a plan-id to poll."""
        return self._request(
            "POST", self._table_path(namespace, name) + "/plan", body
        )

    def fetch_planning_result(self, namespace: str, name: str, plan_id: str) -> dict:
        path = self._table_path(namespace, name) + "/plan/" + urllib.parse.quote(
            plan_id, safe=""
        )
        return self._request("GET", path)

    def cancel_planning(self, namespace: str, name: str, plan_id: str) -> None:
        path = self._table_path(namespace, name) + "/plan/" + urllib.parse.quote(
            plan_id, safe=""
        )
        self._request("DELETE", path)

    def fetch_scan_tasks(self, namespace: str, name: str, plan_task: str) -> dict:
        """POST .../tasks — exchange one opaque plan-task token for a
        FetchScanTasksResult page."""
        return self._request(
            "POST",
            self._table_path(namespace, name) + "/tasks",
            {"plan-task": plan_task},
        )

    def _list_paged(self, path: str, key: str) -> list:
        """The spec's list-endpoint pagination: follow `next-page-token`
        (opaque — echoed back verbatim as `pageToken`) until the server
        omits it. Servers that don't paginate return everything with no
        token, so the loop runs once. Bounded like plan-task pagination:
        a byzantine token cycle terminates with an error."""
        out: list = []
        token: str | None = None
        seen: set[str] = set()
        for _ in range(10_000):
            res = self._request(
                "GET", path, query={"pageToken": token} if token else None
            )
            out.extend(res.get(key) or [])
            token = res.get("next-page-token")
            if not token:
                return out
            if token in seen:
                # a cyclic token would otherwise stall the listing for
                # its full page budget — fail on the FIRST repeat
                raise RestError(
                    0,
                    "InvalidResponseException",
                    f"list pagination of {path} repeated page token "
                    f"{token!r} — refusing to loop",
                )
            seen.add(token)
        raise RestError(
            0,
            "InvalidResponseException",
            f"list pagination of {path} exceeded 10000 pages — refusing to loop",
        )

    def list_namespaces(self) -> list[str]:
        return [
            ".".join(ns) for ns in self._list_paged(self._ns_path(), "namespaces")
        ]

    def namespace_exists(self, namespace: str) -> bool:
        try:
            self._request("GET", self._ns_path(namespace))
            return True
        except RestError as exc:
            if _is_missing(exc):
                return False
            raise

    def create_namespace(self, namespace: str, properties: dict[str, str] | None = None) -> None:
        props = dict(properties or {})
        # warehouse with a URL scheme → explicit location, else let the
        # server resolve (catalog_rest.go:138-142)
        if self.warehouse and "://" in self.warehouse and "location" not in props:
            props["location"] = f"{self.warehouse}/{namespace}"
        self._request(
            "POST", self._ns_path(), {"namespace": namespace.split("."), "properties": props}
        )

    def ensure_namespace(self, namespace: str) -> None:
        """Load-else-create with create-race tolerance: a concurrent
        creator's AlreadyExists resolves to success iff the namespace
        now loads (catalog_rest.go:144-161)."""
        if self.namespace_exists(namespace):
            return
        try:
            self.create_namespace(namespace)
        except RestError:
            if self.namespace_exists(namespace):
                return
            raise

    # -- tables (catalog_rest.go:168-240) ----------------------------------
    def load_table(self, namespace: str, name: str) -> dict:
        """LoadTableResult: {'metadata-location': ..., 'metadata': {...},
        and optionally the spec's 'config' overrides +
        'storage-credentials' vends (RestTable captures those)."""
        return self._request("GET", self._table_path(namespace, name))

    _NOT_IMPLEMENTED_STATUSES = frozenset({404, 405, 406, 501})

    def load_credentials(self, namespace: str, name: str):
        """The spec's dedicated credential endpoint
        (`GET .../tables/{table}/credentials`, LoadCredentialsResponse)
        — the cheap refresh path for expired vends. Returns the parsed
        credential list, or None when the server does not implement the
        route (callers re-vend via load_table instead; the spec marks
        the endpoint optional). NoSuchTable stays an error even at 404."""
        from .vended_credentials import parse_storage_credentials

        try:
            res = self._request(
                "GET", self._table_path(namespace, name) + "/credentials"
            )
        except RestError as exc:
            if (
                exc.status in self._NOT_IMPLEMENTED_STATUSES
                and "nosuchtable" not in exc.error_type.lower()
            ):
                return None
            raise
        return parse_storage_credentials(res)

    def table_exists(self, namespace: str, name: str) -> bool:
        try:
            self.load_table(namespace, name)
            return True
        except RestError as exc:
            if _is_missing(exc):
                return False
            raise

    def drop_table(self, namespace: str, name: str, purge: bool = False) -> bool:
        """DropTable (REST spec `DELETE /tables/{table}`): deregister
        the table; with purge the server also reclaims its files
        (`purgeRequested=true`). Returns whether the table existed."""
        self._table_cache.discard(f"{namespace}.{name}")
        try:
            self._request(
                "DELETE",
                self._table_path(namespace, name),
                query={"purgeRequested": "true"} if purge else None,
            )
            return True
        except RestError as exc:
            if _is_missing(exc):
                return False
            raise

    def rename_table(
        self, namespace: str, name: str, new_namespace: str, new_name: str
    ) -> None:
        """RenameTable (REST spec `POST /tables/rename`): the registry
        re-keys the table under its new identifier; the table LOCATION
        (and every absolute path inside its metadata) is untouched —
        which is exactly why rename exists here and not on the
        filesystem catalog."""
        self._table_cache.discard(f"{namespace}.{name}")
        base = f"/v1/{self.prefix}" if self.prefix else "/v1"
        self._request(
            "POST",
            f"{base}/tables/rename",
            {
                "source": {"namespace": namespace.split("."), "name": name},
                "destination": {
                    "namespace": new_namespace.split("."),
                    "name": new_name,
                },
            },
        )

    def list_tables(self, namespace: str) -> list[str]:
        """ListTables (GET .../tables, paginated): the namespace's
        table names."""
        return sorted(
            i["name"]
            for i in self._list_paged(self._table_path(namespace), "identifiers")
        )

    # -- views (Iceberg view spec v1 over the REST /views routes) ----------
    def _view_path(self, namespace: str, name: str = "") -> str:
        base = f"/v1/{self.prefix}" if self.prefix else "/v1"
        ns = urllib.parse.quote(namespace, safe="")
        path = f"{base}/namespaces/{ns}/views"
        return f"{path}/{urllib.parse.quote(name, safe='')}" if name else path

    def list_views(self, namespace: str) -> list[str]:
        return sorted(
            i["name"]
            for i in self._list_paged(self._view_path(namespace), "identifiers")
        )

    def view_exists(self, namespace: str, name: str) -> bool:
        try:
            self._request("GET", self._view_path(namespace, name))
            return True
        except RestError as exc:
            if _is_missing(exc):
                return False
            raise

    def load_view(self, namespace: str, name: str) -> "RestView":
        self._request("GET", self._view_path(namespace, name))  # 404 -> raise
        return RestView(self, namespace, name)

    def register_warehouse_views(self, spark: SparkSession) -> dict[str, str]:
        """Transport-neutral registration hook (see
        FsCatalog.register_warehouse_views): every table AND every
        catalog view as a `<ns>_<name>` temp view (views resolved to a
        fixpoint so views-over-views register too)."""
        from .iceberg_views import register_catalog_views

        out = register_rest_table_views(spark, self)
        registered, _ = register_catalog_views(spark, self, self.list_namespaces())
        out.update(registered)
        return out

    def create_view(
        self,
        spark: SparkSession,
        namespace: str,
        name: str,
        sql: str,
        properties: dict[str, str] | None = None,
        register_tables: bool = True,
    ) -> "RestView":
        """CreateViewRequest (spec): the client sends the SQL's analyzed
        output schema + the version-1 ViewVersion; the SERVER assigns
        view-uuid, ids, and the metadata location. Table references in
        the SQL resolve as `<ns>_<table>` (the sql CLI convention) —
        registered from this catalog before analysis unless the caller
        already registered (register_tables=False)."""
        from .iceberg_fs import iceberg_schema
        from .iceberg_views import (
            build_view_version,
            infer_view_schema,
            strip_schema_internal,
        )

        self.ensure_namespace(namespace)
        if register_tables:
            self.register_warehouse_views(spark)
        schema = strip_schema_internal(
            {**iceberg_schema(infer_view_schema(spark, sql)), "schema-id": 0}
        )
        body = {
            "name": name,
            "schema": schema,
            "view-version": build_view_version(
                1, 0, sql, namespace, int(time.time() * 1000)
            ),
            "properties": dict(properties or {}),
        }
        self._request("POST", self._view_path(namespace), body)
        return RestView(self, namespace, name)

    def commit_view(self, namespace: str, name: str, body: dict) -> dict:
        """CommitViewRequest: requirements (assert-view-uuid) +
        updates (add-schema / add-view-version / set-current-view-version
        / set-properties...)."""
        return self._request("POST", self._view_path(namespace, name), body)

    def drop_view(self, namespace: str, name: str) -> bool:
        try:
            self._request("DELETE", self._view_path(namespace, name))
            return True
        except RestError as exc:
            if _is_missing(exc):
                return False
            raise

    def rename_view(
        self, namespace: str, name: str, new_namespace: str, new_name: str
    ) -> None:
        base = f"/v1/{self.prefix}" if self.prefix else "/v1"
        self._request(
            "POST",
            f"{base}/views/rename",
            {
                "source": {"namespace": namespace.split("."), "name": name},
                "destination": {
                    "namespace": new_namespace.split("."),
                    "name": new_name,
                },
            },
        )

    def create_table(
        self,
        namespace: str,
        name: str,
        spark_schema: StructType,
        partition_source: str | None = None,
        granularity: str = "hourly",
        properties: dict[str, str] | None = None,
        location: str | None = None,
        partition_by: list[tuple[str, str]] | None = None,
        sort_by: list[str] | None = None,
        iceberg_types: dict[str, str] | None = None,
    ) -> dict:
        schema = iceberg_schema(spark_schema)
        schema.pop("_last_column_id")
        from .iceberg_fs import (
            apply_iceberg_type_overrides,
            require_v3_for_types,
        )

        # v3-only column types (ns timestamps, variant, unknown) require
        # a v3 table; the reserved `format-version` create PROPERTY is
        # the Iceberg convention — the server honors it (real REST
        # catalogs do the same)
        apply_iceberg_type_overrides(schema, iceberg_types)
        require_v3_for_types(
            schema, int((properties or {}).get("format-version", 2))
        )
        if partition_by is not None:
            from .iceberg_fs import spec_fields_from_partition_by

            spec_fields = spec_fields_from_partition_by(schema, partition_by)
        else:
            spec_fields = partition_fields_for(schema, partition_source, granularity)
        body: dict[str, Any] = {
            "name": name,
            "schema": schema,
            "partition-spec": {"spec-id": 0, "fields": spec_fields},
            "properties": dict(properties or {}),
            "stage-create": False,
        }
        if sort_by:
            from .iceberg_fs import sort_fields_from

            # CreateTableRequest.write-order (REST spec)
            body["write-order"] = {
                "order-id": 1,
                "fields": sort_fields_from(schema, sort_by),
            }
        if location:
            body["location"] = location
        return self._request("POST", self._table_path(namespace), body)

    def ensure_table(
        self,
        namespace: str,
        name: str,
        spark_schema: StructType,
        partition_source: str | None = None,
        granularity: str = "hourly",
        properties: dict[str, str] | None = None,
        sort_by: list[str] | None = None,
        partition_by: list[tuple[str, str]] | None = None,
        iceberg_types: dict[str, str] | None = None,
    ) -> "RestTable":
        """Cache → load → create → re-load-on-race, exactly the
        EnsureTable ladder of catalog_rest.go:168-240."""
        cache_key = f"{namespace}.{name}"
        if cache_key in self._table_cache:
            return RestTable(self, namespace, name)
        try:
            self.load_table(namespace, name)
            self._table_cache.add(cache_key)
            return RestTable(self, namespace, name)
        except RestError as exc:
            if not _is_missing(exc):
                raise
        try:
            self.create_table(
                namespace,
                name,
                spark_schema,
                partition_source,
                granularity,
                properties,
                sort_by=sort_by,
                partition_by=partition_by,
                iceberg_types=iceberg_types,
            )
        except RestError:
            # AlreadyExists race: success iff it loads now (go:214-219)
            try:
                self.load_table(namespace, name)
            except RestError as check_exc:
                raise check_exc from None
        self._table_cache.add(cache_key)
        return RestTable(self, namespace, name)

    def commit_table(
        self, namespace: str, name: str, requirements: list[dict], updates: list[dict]
    ) -> dict:
        """CommitTable: the server validates requirements against its
        current state atomically and applies updates — the REST analog
        of the fs catalog's version-file CAS."""
        return self._request(
            "POST",
            self._table_path(namespace, name),
            {
                "identifier": {"namespace": namespace.split("."), "name": name},
                "requirements": requirements,
                "updates": updates,
            },
        )

    def commit_transaction(
        self, table_changes: list[tuple[str, str, list[dict], list[dict]]]
    ) -> None:
        """CommitTransaction (REST spec `/v1/{prefix}/transactions/
        commit`): N per-table (requirements, updates) applied
        ALL-OR-NOTHING by the server — the multi-table atomic commit
        single-table CommitTable cannot express. Any failed requirement
        (or any error) leaves every table untouched."""
        base = f"/v1/{self.prefix}" if self.prefix else "/v1"
        self._request(
            "POST",
            f"{base}/transactions/commit",
            {
                "table-changes": [
                    {
                        "identifier": {"namespace": ns.split("."), "name": name},
                        "requirements": reqs,
                        "updates": upds,
                    }
                    for ns, name, reqs, upds in table_changes
                ]
            },
        )


def commit_append_transaction(
    client: RestCatalogClient,
    parts: list[tuple["RestTable", list, dict | None]],
) -> dict[tuple[str, str], int]:
    """Commit one append snapshot on EACH table in a single atomic
    CommitTransaction — either every table advances or none does (the
    exporter uses this so a crash can never persist a traces batch
    whose logs/metrics halves are missing). `parts` is
    [(table, data files, snapshot properties)]; empty file lists are
    skipped. Returns {(namespace, name): snapshot_id}.

    Same optimistic retry as single-table appends: on 409 every
    manifest tree is rebuilt against the new bases (losers' abandoned
    trees are unreferenced and reclaimed by remove_orphan_files).
    Every attempt's snapshot ids are remembered across the retry loop
    and landed-checked at loop top — the single-table `_commit_add`
    guard, lifted to transactions: a timed-out attempt whose
    landed-check ran BEFORE the server finished applying it would
    otherwise be invisible to the rebuilt retry, which would then
    append every table's rows a second time."""
    parts = [(t, files, props) for t, files, props in parts if files]
    if not parts:
        return {}
    keys = [(t.namespace, t.name) for t, _, _ in parts]
    if len(set(keys)) != len(keys):
        raise ValueError("a table may appear at most once per transaction")

    by_key = {(t.namespace, t.name): t for t, _, _ in parts}

    def _landed_attempt(
        mds: dict, attempted: list[dict[tuple[str, str], int]]
    ) -> dict[tuple[str, str], int] | None:
        """An earlier attempt found fully applied in `mds` (its
        snapshot id present on EVERY table) is THIS transaction landing
        late — return its sids. A partially-present view gets ONE
        re-read of the absent tables first: the per-table GETs are
        sequential, so an atomic transaction applying BETWEEN them
        looks partial without being so. Only a partial view that
        survives the re-read means the server broke all-or-nothing:
        surface loudly."""
        for past in attempted:
            present = {
                key: any(
                    s["snapshot-id"] == past[key]
                    for s in mds[key].get("snapshots", [])
                )
                for key in keys
            }
            if all(present.values()):
                return past
            if any(present.values()):
                reread_failed = False
                for key in keys:
                    if not present[key]:
                        try:
                            fresh = by_key[key].metadata()
                        except RestError:
                            reread_failed = True
                            continue  # re-check the REST of the tables
                        present[key] = any(
                            s["snapshot-id"] == past[key]
                            for s in fresh.get("snapshots", [])
                        )
                if all(present.values()):
                    return past
                if reread_failed:
                    # a table could not be re-verified: the state is
                    # genuinely UNKNOWN — do not accuse the server of
                    # breaking atomicity on a reload blip
                    raise RestCommitStateUnknownError(
                        500,
                        "CommitStateUnknownException",
                        "transaction may have landed after a lost "
                        "response, but re-verifying the absent tables "
                        "failed — state unknown: "
                        + ", ".join(
                            f"{ns}.{name}={'landed' if ok else 'unverified'}"
                            for (ns, name), ok in present.items()
                        ),
                    )
                raise RestCommitStateUnknownError(
                    500,
                    "CommitStateUnknownException",
                    "transaction landed PARTIALLY after a lost response — "
                    "the server violated all-or-nothing semantics: "
                    + ", ".join(
                        f"{ns}.{name}={'landed' if ok else 'absent'}"
                        for (ns, name), ok in present.items()
                    ),
                )
        return None

    from .iceberg_fs import commit_attempts_for

    attempts = None  # resolved from participants' table properties
    attempt = -1
    attempted: list[dict[tuple[str, str], int]] = []
    while True:
        attempt += 1
        mds = {(t.namespace, t.name): t.metadata() for t, _, _ in parts}
        if attempts is None:
            # the transaction commits all tables atomically: honor the
            # LARGEST per-table retry budget so one contended table's
            # raised commit.retry.num-retries is not defeated here
            attempts = max(commit_attempts_for(md) for md in mds.values())
        # a PRIOR attempt may have landed after its landed-check ran:
        # any attempted snapshot-id set found on reload IS this
        # transaction — return it instead of appending twice
        prior = _landed_attempt(mds, attempted)
        if prior is not None:
            return prior
        changes: list[tuple[str, str, list[dict], list[dict]]] = []
        sids: dict[tuple[str, str], int] = {}
        for t, files, props in parts:
            md = mds[(t.namespace, t.name)]
            reqs, upds, sid = t._build_append(md, files, "append", props or {})
            changes.append((t.namespace, t.name, reqs, upds))
            sids[(t.namespace, t.name)] = sid
        attempted.append(sids)
        try:
            client.commit_transaction(changes)
            return sids
        except RestCommitConflictError:
            # a 409 can be an earlier timed-out attempt of THIS
            # transaction landing late; on the final attempt, check
            # before surfacing (non-final attempts recheck at loop top)
            if attempt + 1 == attempts:
                try:
                    prior = _landed_attempt(
                        {
                            (t.namespace, t.name): t.metadata()
                            for t, _, _ in parts
                        },
                        attempted,
                    )
                except RestError:
                    prior = None
                if prior is not None:
                    return prior
                raise
            time.sleep(0.05 * (attempt + 1))
        except RestError as exc:
            # commit ambiguity over the whole transaction: the server
            # applies table-changes ALL-OR-NOTHING, so landed-checking
            # each table must agree — all present = idempotent success,
            # none = verified absent at reload time (rebuild + retry;
            # the loop-top recheck still covers a later-than-reload
            # landing), a mix means the server broke transaction
            # atomicity (surface loudly)
            if not _is_ambiguous(exc):
                raise
            landed = [
                t._resolve_ambiguous_commit(exc, sids[(t.namespace, t.name)])
                for t, _, _ in parts
            ]
            if all(landed):
                return sids
            if any(landed):
                raise RestCommitStateUnknownError(
                    exc.status,
                    "CommitStateUnknownException",
                    "transaction landed PARTIALLY after a lost response — "
                    "the server violated all-or-nothing semantics: "
                    + ", ".join(
                        f"{t.namespace}.{t.name}={'landed' if ok else 'absent'}"
                        for (t, _, _), ok in zip(parts, landed)
                    ),
                ) from exc
            if attempt + 1 == attempts:
                raise
            time.sleep(0.05 * (attempt + 1))


_REF_RETENTION_FIELDS = (
    "min-snapshots-to-keep",
    "max-snapshot-age-ms",
    "max-ref-age-ms",
)


def _set_ref_update(md: dict, name: str, snapshot_id: int) -> dict:
    """A set-snapshot-ref update that moves a branch head while CARRYING
    the ref's existing retention settings — set-snapshot-ref replaces
    the whole SnapshotRef on the server, so an update built without
    them would silently reset the branch's expiry policy."""
    prior = md.get("refs", {}).get(name, {})
    update = {
        "action": "set-snapshot-ref",
        "ref-name": name,
        "type": "branch",
        "snapshot-id": snapshot_id,
    }
    for k in _REF_RETENTION_FIELDS:
        if prior.get(k) is not None:
            update[k] = prior[k]
    return update


class RestTable:
    """Table handle bound to a RestCatalogClient — same operation surface
    as FsTable, with commits arbitrated by the REST server."""

    def __init__(self, client: RestCatalogClient, namespace: str, name: str):
        self.client = client
        self.namespace = namespace
        self.name = name
        # latest storage-credential vend from LoadTableResult (None =
        # the server never vended — local fs / engine-managed creds)
        self._vended = None

    # -- metadata access (always fresh: catalog_rest.go:259-263 loads
    # the table before every append so commits see the latest state) ----
    def metadata(self) -> dict:
        result = self.client.load_table(self.namespace, self.name)
        if result.get("storage-credentials"):
            from .vended_credentials import VendedCredentialSet

            self._vended = VendedCredentialSet.from_load_result(result)
        return result["metadata"]

    def apply_storage_credentials(
        self, spark: SparkSession, path: str | None = None, now_ms: int | None = None
    ) -> dict[str, str]:
        """Thread the latest storage-credential vend into the engine:
        apply the container-scoped Hadoop conf of EVERY unexpired vend
        in the set (per-bucket s3a keys etc. — multi-vend tables keep
        files under more than one prefix, e.g. write.data.path or
        shared data, and scoping makes applying all of them
        clobber-free), REFRESHING first when any vend expired — via
        the spec credentials endpoint, falling back to a table re-load
        when the server doesn't implement the route — so executor file
        access uses the vended, not ambient, identity. Returns the
        applied conf; {} for local/uncredentialed paths. Called by
        read()/append_dataframe; safe to call directly before custom
        scans. Raises when the server re-vends an already-expired
        credential for `path` (default: the table location; retrying
        would loop); a non-target vend still expired after refresh is
        skipped, not applied."""
        if self._vended is None:
            return {}
        from .vended_credentials import VendedCredentialSet

        target = path if path is not None else self.location()
        if self._vended.needs_refresh(target, now_ms) or self._vended.any_expired(
            now_ms
        ):
            fresh = self.client.load_credentials(self.namespace, self.name)
            if fresh is not None:
                self._vended = VendedCredentialSet(
                    fresh, self._vended.table_config
                )
            else:
                result = self.client.load_table(self.namespace, self.name)
                self._vended = VendedCredentialSet.from_load_result(result)
            if self._vended.needs_refresh(target, now_ms):
                raise RestError(
                    0,
                    "CredentialExpiredException",
                    f"refreshed storage credential for {target} is still "
                    "expired — server vends are not advancing",
                )
        conf = self._vended.conf_for_all(now_ms)
        # overlay the TARGET path's vend last: conf_for_all's merge is
        # clobber-free only for per-bucket-scoped keys (s3a) — GCS
        # tokens are global conf (`fs.gs.auth.access.token`), so with
        # two gs vends the longer-prefix one would otherwise overwrite
        # the vend that actually covers `target` (advisor finding,
        # r11). Longest-prefix-for-the-target always wins this way.
        conf.update(self._vended.conf_for_path(target))
        if conf:
            hconf = spark.sparkContext._jsc.hadoopConfiguration()
            for k, v in conf.items():
                hconf.set(k, v)
        return conf

    def location(self) -> str:
        return self.metadata()["location"]

    def partition_spec(self) -> list[dict]:
        return default_spec_fields(self.metadata())

    def snapshots(self) -> list[dict]:
        return self.metadata()["snapshots"]

    def current_snapshot(self) -> dict | None:
        md = self.metadata()
        sid = md.get("current-snapshot-id", -1)
        if sid in (-1, None):
            return None
        return next(s for s in md["snapshots"] if s["snapshot-id"] == sid)

    # -- commit protocol ---------------------------------------------------
    def append_files(
        self, files: list[DataFile], snapshot_properties: dict[str, str] | None = None
    ) -> int:
        """Atomic append via CommitTable. Builds the manifest tree in
        shared storage, then asks the server to advance `main` — with
        `assert-ref-snapshot-id` pinning the parent we built against.
        On 409 (another writer won) the manifest tree is rebuilt on the
        new base and the commit retried (catalog_rest.go:243-303; the
        retry loop lives in iceberg-go's transaction there)."""
        return self._commit_add(files, "append", snapshot_properties or {})

    def _build_append(
        self,
        md: dict,
        files: list[DataFile],
        operation: str,
        extra_summary: dict[str, str],
    ) -> tuple[list[dict], list[dict], int]:
        """Build (but do not send) one append commit against `md`: the
        manifest tree lands in shared storage and the returned
        (requirements, updates, snapshot_id) plug into CommitTable or a
        multi-table CommitTransaction. The assert-ref-snapshot-id pins
        main at the parent the tree was built on."""
        parent = md["current-snapshot-id"]
        snapshot = write_snapshot_tree(
            md["location"],
            md,
            files,
            operation=operation,
            carry_forward=True,
            extra_summary=extra_summary,
        )
        requirements = [
            {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
            {
                "type": "assert-ref-snapshot-id",
                "ref": "main",
                "snapshot-id": None if parent == -1 else parent,
            },
        ]
        updates = [
            {"action": "add-snapshot", "snapshot": snapshot},
            _set_ref_update(md, "main", snapshot["snapshot-id"]),
        ]
        return requirements, updates, snapshot["snapshot-id"]

    def _commit_add(
        self,
        files: list[DataFile],
        operation: str,
        extra_summary: dict[str, str],
        branch: str = "main",
        removed_files: list[DataFile] | None = None,
        required_live_paths: set[str] | None = None,
    ) -> int:
        """Append-style commit (carry-forward manifests + one new
        manifest tree) with conflict retry — used by appends AND
        merge-on-read deltas, which only ADD files and so merge cleanly
        over concurrent appends. branch != "main" stages the snapshot on
        that branch (WAP): the server advances only the branch ref.
        Retry budget comes from the table's commit.retry.num-retries
        property (Iceberg's knob, default 4 retries)."""
        from .iceberg_fs import commit_attempts_for

        attempts = None  # resolved from table properties on first load
        attempt = -1
        attempted: list[int] = []  # snapshot ids of earlier tries
        while True:
            attempt += 1
            md = self.metadata()
            if attempts is None:
                attempts = commit_attempts_for(md)
            # a PRIOR attempt may have landed after its landed-check ran
            # (the server finished processing a timed-out request): any
            # attempted snapshot id found on reload is THIS commit —
            # return it instead of appending the same files twice
            landed_prior = next(
                (
                    s["snapshot-id"]
                    for s in md["snapshots"]
                    if s["snapshot-id"] in attempted
                ),
                None,
            )
            if landed_prior is not None:
                return landed_prior
            branch_ref = md.get("refs", {}).get(branch)
            parent = (
                md["current-snapshot-id"]
                if branch == "main"
                else (branch_ref or {"snapshot-id": md["current-snapshot-id"]})[
                    "snapshot-id"
                ]
            )
            snapshot = write_snapshot_tree(
                md["location"],
                md,
                files,
                operation=operation,
                carry_forward=True,
                extra_summary=extra_summary,
                parent_override=None if branch == "main" else parent,
                removed_files=removed_files,
                required_live_paths=required_live_paths,
            )
            attempted.append(snapshot["snapshot-id"])
            requirements = [
                {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
                {
                    "type": "assert-ref-snapshot-id",
                    "ref": branch,
                    "snapshot-id": (
                        None
                        if (branch == "main" and parent == -1) or (branch != "main" and branch_ref is None)
                        else parent
                    ),
                },
            ]
            updates = [
                {"action": "add-snapshot", "snapshot": snapshot},
                _set_ref_update(md, branch, snapshot["snapshot-id"]),
            ]
            try:
                self.client.commit_table(self.namespace, self.name, requirements, updates)
                return snapshot["snapshot-id"]
            except RestCommitConflictError:
                # a 409 can be an earlier timed-out attempt of THIS
                # commit landing late (its landed-check raced the
                # server); the loop-top reload detects that — on the
                # final attempt, check here before surfacing
                if attempt + 1 == attempts:
                    landed_prior = self._any_landed(attempted)
                    if landed_prior is not None:
                        return landed_prior
                    raise
                time.sleep(0.05 * (attempt + 1))
            except RestError as exc:
                landed = self._resolve_ambiguous_commit(
                    exc, snapshot["snapshot-id"]
                )
                if landed:
                    return snapshot["snapshot-id"]
                # verified absent at reload time: safe to rebuild + retry
                if attempt + 1 == attempts:
                    raise
                time.sleep(0.05 * (attempt + 1))

    def _any_landed(self, attempted: list[int]) -> int | None:
        try:
            md = self.metadata()
        except RestError:
            return None
        return next(
            (
                s["snapshot-id"]
                for s in md["snapshots"]
                if s["snapshot-id"] in attempted
            ),
            None,
        )

    def _resolve_ambiguous_commit(self, exc: RestError, snapshot_id: int) -> bool:
        """The commit-ambiguity case errors.go punts on: the server may
        have applied a commit whose response was lost (5xx / connection
        drop). The snapshot id was generated CLIENT-side
        (write_snapshot_tree), so a reload answers definitively — True
        means the snapshot IS in the table (idempotent success; callers
        must not re-commit), False means it was absent at reload time
        (safe to rebuild and retry). Definite 4xx rejections re-raise
        `exc`; a failed reload raises RestCommitStateUnknownError (the
        only genuinely unresolved outcome)."""
        if not _is_ambiguous(exc):
            raise exc
        try:
            md = self.metadata()
        except RestError as reload_exc:
            raise RestCommitStateUnknownError(
                exc.status,
                "CommitStateUnknownException",
                f"commit response lost ({exc.error_type or exc.status}) and "
                f"the landed-check reload failed ({reload_exc.error_type}); "
                f"snapshot {snapshot_id} may or may not be committed",
            ) from exc
        return any(s["snapshot-id"] == snapshot_id for s in md["snapshots"])

    def append_files_to_branch(
        self,
        branch: str,
        files: list[DataFile],
        snapshot_properties: dict[str, str] | None = None,
    ) -> int:
        """WAP staging over REST: append on a branch without advancing
        main (see FsTable.append_files_to_branch)."""
        if branch == "main":
            return self.append_files(files, snapshot_properties)
        return self._commit_add(files, "append", snapshot_properties or {}, branch)

    def append_dataframe_to_branch(
        self,
        branch: str,
        df: DataFrame,
        snapshot_properties: dict[str, str] | None = None,
    ) -> int | None:
        md = self.metadata()
        files = write_partitioned_batch(df, md["location"], md)
        if not files:
            return None
        return self.append_files_to_branch(branch, files, snapshot_properties)

    def fast_forward(self, branch: str) -> int:
        """WAP publish over REST: advance main to the branch head,
        fast-forward only, with main pinned by assert-ref-snapshot-id so
        a concurrent main commit conflicts instead of being dropped."""
        md = self.metadata()
        ref = md.get("refs", {}).get(branch)
        if ref is None:
            raise ValueError(f"unknown branch {branch!r}")
        head = ref["snapshot-id"]
        cur = md["current-snapshot-id"]
        if cur == head:
            return head
        by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
        node, ok = head, cur == -1
        while node is not None and not ok:
            if node == cur:
                ok = True
                break
            node = by_id.get(node, {}).get("parent-snapshot-id")
        if not ok:
            raise ValueError(
                f"cannot fast-forward: main ({cur}) is not an ancestor of "
                f"branch {branch!r} head ({head})"
            )
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[
                {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
                {
                    "type": "assert-ref-snapshot-id",
                    "ref": "main",
                    "snapshot-id": None if cur == -1 else cur,
                },
            ],
            updates=[
                _set_ref_update(md, "main", head)
            ],
        )
        return head

    def cherry_pick(self, snapshot_id: int) -> int:
        """Publish one staged append onto CURRENT main when fast-forward
        is impossible (see FsTable.cherry_pick): the staged snapshot's
        ADDED data files re-commit as a new append through the catalog
        server, with the usual optimistic retry. Validation (append-only
        source, not already published directly or via an earlier
        cherry-pick) is the shared plan_cherry_pick."""
        from .iceberg_fs import plan_cherry_pick

        files = plan_cherry_pick(self.metadata(), snapshot_id)
        return self._commit_add(
            files,
            "append",
            {"cherry-picked-from-snapshot": str(snapshot_id)},
        )

    def append_dataframe(
        self,
        df: DataFrame,
        snapshot_properties: dict[str, str] | None = None,
        fanout: int | None = None,
    ) -> int | None:
        """K3 over REST: executors write Parquet (hidden-partitioned),
        driver commits the file list through the catalog server. Empty
        inputs commit nothing (F1). `fanout` spreads hot partition
        values over ~fanout writer tasks (backfills)."""
        md = self.metadata()
        self.apply_storage_credentials(df.sparkSession, md["location"])
        files = write_partitioned_batch(df, md["location"], md, fanout)
        if not files:
            return None
        return self.append_files(files, snapshot_properties)

    def add_files_hive(
        self,
        source_dir: str,
        snapshot_properties: dict[str, str] | None = None,
    ) -> int:
        """K4 over REST: register raw-sink Hive-layout Parquet without
        copying (catalog_rest.go:306-367 AppendDataFiles)."""
        files = hive_data_files(source_dir, self.partition_spec())
        self._ensure_name_mapping(files)
        props = {"operation-detail": "add_files", **(snapshot_properties or {})}
        return self.append_files(files, props)

    def add_data_files(
        self, paths: list[str], snapshot_properties: dict[str, str] | None = None
    ) -> int:
        """Register specific Parquet files (recovery re-registration)."""
        md = self.metadata()
        files = data_files_for_paths(paths, default_spec_fields(md), md["location"])
        self._ensure_name_mapping(files)
        props = {"operation-detail": "add_files", **(snapshot_properties or {})}
        return self.append_files(files, props)

    def set_properties(self, props: dict[str, str]) -> None:
        """Merge table properties via a set-properties CommitTable."""
        md = self.metadata()
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[{"action": "set-properties", "updates": props}],
        )

    def _ensure_name_mapping(self, files) -> None:
        """See FsTable._ensure_name_mapping — same rule, REST commit."""
        from .iceberg_fs import (
            NAME_MAPPING_PROP,
            field_idless_files,
            merged_name_mapping,
        )

        if not field_idless_files([f.file_path for f in files]):
            return
        md = self.metadata()
        merged = merged_name_mapping(md)
        if md.get("properties", {}).get(NAME_MAPPING_PROP) != merged:
            self.set_properties({NAME_MAPPING_PROP: merged})

    # -- listing / reads ---------------------------------------------------
    def all_files(self) -> list[str]:
        """ListDataFiles: every data file referenced by ANY snapshot,
        deduped (catalog_rest.go:370-467). Missing tables list empty,
        like the reference (go:383-390)."""
        try:
            md = self.metadata()
        except RestError as exc:
            if _is_missing(exc):
                return []
            raise
        return all_data_file_paths(md)

    def incremental_scan(
        self,
        from_snapshot_id: int | None = None,
        to_snapshot_id: int | None = None,
    ) -> tuple[list[DataFile], int | None]:
        return incremental_data_files(self.metadata(), from_snapshot_id, to_snapshot_id)

    def changelog_scan(
        self,
        spark: SparkSession,
        from_snapshot_id: int | None = None,
        to_snapshot_id: int | None = None,
        source_range=None,
        with_lineage: bool = False,
        full_pre_images: bool | None = None,
    ) -> DataFrame:
        """Row-level CDC read over REST (see iceberg_fs.read_changelog)."""
        from .iceberg_fs import read_changelog

        md = self.metadata()
        self.apply_storage_credentials(spark, md["location"])
        return read_changelog(
            spark,
            md,
            from_snapshot_id,
            to_snapshot_id,
            source_range,
            with_lineage,
            full_pre_images,
        )

    def metadata_table(self, spark: SparkSession, name: str) -> DataFrame:
        """Inspection tables (snapshots/history/files/all_files/
        manifests) over the REST-loaded metadata."""
        from .iceberg_fs import metadata_table

        return metadata_table(spark, self.metadata(), name)

    # -- table maintenance over REST ---------------------------------------
    def _commit_replace(
        self,
        md: dict,
        planned_snapshot: int,
        files: list[DataFile],
        operation: str,
        extra_summary: dict[str, str],
        conflict_what: str,
        branch: str = "main",
    ) -> int:
        """Replace-style commit (the new manifest tree IS the complete
        live file set) pinned to the planning base: a concurrent writer
        advancing the TARGET ref mid-plan turns into
        ReplaceConflictError (the server 409s the
        assert-ref-snapshot-id requirement) instead of silently
        dropping its files — replaces cannot merge. branch != "main"
        parents the replace on the branch head and advances only that
        ref (branch-scoped copy-on-write DML); main moving concurrently
        is irrelevant to a branch rewrite and does not conflict."""
        from .iceberg_fs import ReplaceConflictError

        snapshot = write_snapshot_tree(
            md["location"],
            md,
            files,
            operation=operation,
            carry_forward=False,
            extra_summary=extra_summary,
            parent_override=None if branch == "main" else planned_snapshot,
        )
        requirements = [
            {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
            {
                "type": "assert-ref-snapshot-id",
                "ref": branch,
                "snapshot-id": None if planned_snapshot == -1 else planned_snapshot,
            },
        ]
        updates = [
            {"action": "add-snapshot", "snapshot": snapshot},
            _set_ref_update(md, branch, snapshot["snapshot-id"]),
        ]
        try:
            self.client.commit_table(self.namespace, self.name, requirements, updates)
        except RestCommitConflictError as exc:
            raise ReplaceConflictError(
                f"table advanced past snapshot {planned_snapshot} during the "
                f"{conflict_what}; re-plan"
            ) from exc
        except RestError as exc:
            if not self._resolve_ambiguous_commit(exc, snapshot["snapshot-id"]):
                # verified absent: replaces cannot blindly retry (the
                # planning base may have moved) — surface for a re-plan
                raise
        return snapshot["snapshot-id"]

    def overwrite_partitions(
        self,
        df: DataFrame,
        snapshot_properties: dict[str, str] | None = None,
        fanout: int | None = None,
    ) -> int | None:
        """Dynamic partition overwrite over REST (see
        FsTable.overwrite_partitions): atomically replace exactly the
        hidden partitions the batch lands in, pinned to the planning
        base via assert-ref-snapshot-id (a concurrent commit turns into
        ReplaceConflictError — replaces cannot merge)."""
        from .iceberg_fs import (
            _partition_tuple,
            plan_partition_overwrite,
            write_partitioned_batch,
        )

        md = self.metadata()
        planned_snapshot = md["current-snapshot-id"]
        new_files = write_partitioned_batch(df, md["location"], md, fanout)
        if not new_files:  # F1: no data files -> no snapshot
            return None
        replaced, survivors, deletes = plan_partition_overwrite(
            md, planned_snapshot, new_files
        )
        summary = {
            "replaced-partitions": str(
                len({_partition_tuple(f) for f in replaced})
            ),
            "replaced-data-files": str(len(replaced)),
            "replaced-records": str(sum(f.record_count for f in replaced)),
            **(snapshot_properties or {}),
        }
        return self._commit_replace(
            md,
            planned_snapshot,
            new_files + survivors + deletes,
            "overwrite",
            summary,
            "partition overwrite",
        )

    def rewrite_data_files(
        self,
        spark: SparkSession,
        target_bytes: int = 128 * 1024 * 1024,
        min_files: int = 2,
        zorder_by: list | None = None,
    ) -> int | None:
        """Iceberg-style compaction with the replace COMMIT arbitrated by
        the catalog server: the planning base is pinned with
        assert-ref-snapshot-id, so a concurrent append advancing `main`
        mid-rewrite fails the commit (409) instead of silently dropping
        the appended files — the client surfaces ReplaceConflictError
        for the caller to re-plan (replaces cannot auto-retry)."""
        from .iceberg_fs import plan_rewrite

        md = self.metadata()
        planned_snapshot = md["current-snapshot-id"]
        if planned_snapshot == -1:
            return None
        live, deletes = self._live_files(md, planned_snapshot)
        planned = plan_rewrite(
            spark,
            md,
            live,
            target_bytes=target_bytes,
            min_files=min_files,
            zorder_by=zorder_by,
            delete_files=deletes,
        )
        if planned is None:
            return None
        replacement, n_compacted, n_rewritten = planned
        extra = {
            "compacted-files": str(n_compacted),
            "added-data-files": str(n_rewritten),
        }
        if zorder_by:
            extra["zorder-by"] = ",".join(zorder_by)  # informational (see FsTable)
        return self._commit_replace(
            md,
            planned_snapshot,
            replacement + deletes,  # pending deletes stay live for survivors
            "replace",
            extra,
            "rewrite",
        )

    def count_rows(
        self, spark: SparkSession | None = None, snapshot_id: int | None = None
    ) -> int:
        """Metadata-only count(*) (see FsTable.count_rows): O(1) from
        the summary totals when no delete files are live, Spark-scan
        fallback otherwise."""
        from .iceberg_fs import count_rows_from_metadata

        n = count_rows_from_metadata(self.metadata(), snapshot_id)
        if n is not None:
            return n
        if spark is None:
            raise ValueError(
                "snapshot has pending delete files: the exact count needs a "
                "Spark scan — pass spark (or fold deletes with maintenance)"
            )
        return self.read(spark, snapshot_id=snapshot_id).count()

    def rewrite_manifests(
        self,
        target_size_bytes: int | None = None,
        min_count: int = 2,
    ) -> int | None:
        """Metadata-level compaction (`rewrite_manifests`) with the
        commit arbitrated by the REST server: merge the current
        snapshot's small manifests into ~target-size bins and commit
        the new manifest list as a `replace` snapshot (invisible to
        incremental scans and changelogs). A concurrent append
        advancing `main` mid-rewrite 409s the assert-ref-snapshot-id
        requirement and the plan is rebuilt against the new base — its
        manifests are never dropped. Returns the new snapshot id or
        None when there was nothing to merge."""
        from .iceberg_fs import (
            DEFAULT_MANIFEST_TARGET_SIZE,
            build_rewrite_manifests_snapshot,
            commit_attempts_for,
        )

        if target_size_bytes is None:
            target_size_bytes = DEFAULT_MANIFEST_TARGET_SIZE
        attempt = 0
        while True:
            md = self.metadata()
            # commit.retry.num-retries governs metadata-only commits too
            attempts = commit_attempts_for(md)
            planned = md["current-snapshot-id"]
            snapshot = build_rewrite_manifests_snapshot(
                md["location"],
                md,
                target_size=target_size_bytes,
                min_count=min_count,
            )
            if snapshot is None:
                return None
            requirements = [
                {"type": "assert-table-uuid", "uuid": md["table-uuid"]},
                {
                    "type": "assert-ref-snapshot-id",
                    "ref": "main",
                    "snapshot-id": planned,
                },
            ]
            updates = [
                {"action": "add-snapshot", "snapshot": snapshot},
                _set_ref_update(md, "main", snapshot["snapshot-id"]),
            ]
            try:
                self.client.commit_table(
                    self.namespace, self.name, requirements, updates
                )
                return snapshot["snapshot-id"]
            except RestCommitConflictError:
                attempt += 1
                if attempt >= attempts:
                    raise
                time.sleep(0.05 * attempt)
            except RestError as exc:
                if self._resolve_ambiguous_commit(exc, snapshot["snapshot-id"]):
                    return snapshot["snapshot-id"]
                attempt += 1
                if attempt >= attempts:
                    raise
                time.sleep(0.05 * attempt)

    def delete_where(
        self,
        spark: SparkSession,
        predicate: str,
        mode: str = "copy-on-write",
        branch: str = "main",
    ) -> tuple[int | None, int]:
        """Row-level DELETE over REST — same strategies as
        FsTable.delete_where: copy-on-write (overwrite commit pinned to
        the planning base), merge-on-read (position-delete file), or
        deletion-vectors (per-file roaring bitmaps in one Puffin file);
        the merge-on-read flavors commit like appends and retry cleanly
        over concurrent commits."""
        from .iceberg_fs import plan_delete, plan_deletion_vectors

        if mode not in ("copy-on-write", "merge-on-read", "deletion-vectors"):
            raise ValueError(
                "mode must be copy-on-write|merge-on-read|deletion-vectors, "
                f"got {mode!r}"
            )
        md = self.metadata()
        planned_snapshot = resolve_dml_branch(md, branch, mode)
        if planned_snapshot == -1:
            return None, 0
        # predicate-derived pruning (shared plan_dml_files): provably
        # match-free files never reach the Spark scan
        live, excluded, deletes = plan_dml_files(
            md, planned_snapshot, predicate, spark_session_timezone(spark), spark=spark
        )
        if mode == "merge-on-read":
            require_position_delete_files_allowed(md)
        if mode in ("merge-on-read", "deletion-vectors"):
            plan_fn = (
                plan_deletion_vectors
                if mode == "deletion-vectors"
                else plan_position_delete
            )
            planned = plan_fn(spark, md, live, deletes, predicate)
            if planned is None:
                return None, 0
            new_deletes, n_deleted, superseded, targets = planned
            extra = {"deleted-records": str(n_deleted)}
            if mode == "deletion-vectors":
                extra["added-dvs"] = str(len(new_deletes))
            sid = self._commit_add(
                new_deletes,
                "delete",
                extra,
                branch=branch,
                removed_files=superseded or None,
                required_live_paths=targets or None,
            )
            return sid, n_deleted
        planned = plan_delete(spark, md, live, predicate, delete_files=deletes)
        if planned is None:
            return None, 0
        replacement, n_deleted, n_rewritten = planned
        sid = self._commit_replace(
            md,
            planned_snapshot,
            # delete rows for surviving files stay live; pruned-away
            # files contain no matches and survive by reference
            replacement + excluded + deletes,
            "overwrite",
            {
                "deleted-records": str(n_deleted),
                "rewritten-data-files": str(n_rewritten),
            },
            "delete",
            branch=branch,
        )
        return sid, n_deleted

    def delete_where_equality(
        self, spark: SparkSession, keys_df: DataFrame, equality_cols: list[str]
    ) -> tuple[int | None, int]:
        """Equality DELETE over REST (see FsTable.delete_where_equality):
        the key set commits as a content=2 delete file in a `delete`
        snapshot — no table read; commits like an append."""
        from .iceberg_fs import plan_equality_delete

        md = self.metadata()
        if md["current-snapshot-id"] == -1:
            return None, 0
        planned = plan_equality_delete(spark, md, keys_df, equality_cols)
        if planned is None:
            return None, 0
        new_deletes, n_keys = planned
        sid = self._commit_add(
            new_deletes, "delete", {"deleted-key-tuples": str(n_keys)}
        )
        return sid, n_keys

    def upsert_equality(
        self,
        spark: SparkSession,
        df: DataFrame,
        equality_cols: list[str],
        snapshot_properties: dict[str, str] | None = None,
    ) -> int | None:
        """Single-snapshot CDC upsert over REST (see
        FsTable.upsert_equality): new data files + an equality delete on
        their keys, same sequence number, zero table reads. Empty inputs
        commit nothing (F1 short-circuit)."""
        from .iceberg_fs import plan_equality_delete, write_partitioned_batch

        md = self.metadata()
        data_files = write_partitioned_batch(df, md["location"], md)
        if not data_files:
            return None
        planned = plan_equality_delete(
            spark, md, df.select(*equality_cols), equality_cols
        )
        files = data_files + (planned[0] if planned else [])
        summary = {"upserted-records": str(sum(f.record_count for f in data_files))}
        summary.update(snapshot_properties or {})
        return self._commit_add(files, "overwrite", summary)

    def update_where(
        self,
        spark: SparkSession,
        predicate: str,
        set_exprs: dict[str, str],
        mode: str = "copy-on-write",
        branch: str = "main",
    ) -> tuple[int | None, int]:
        """Row-level UPDATE over REST (see FsTable.update_where):
        copy-on-write rewrite pinned to the planning base, or a
        merge-on-read row-delta committed like an append
        (mode="deletion-vectors" writes the delete half as v3 DVs)."""
        from .iceberg_fs import (
            plan_deletion_vectors,
            plan_update,
            plan_update_mor,
        )

        if mode not in ("copy-on-write", "merge-on-read", "deletion-vectors"):
            raise ValueError(
                "mode must be copy-on-write|merge-on-read|deletion-vectors, "
                f"got {mode!r}"
            )
        md = self.metadata()
        planned_snapshot = resolve_dml_branch(md, branch, mode)
        if planned_snapshot == -1:
            return None, 0
        # predicate-derived pruning, same as delete_where
        live, excluded, deletes = plan_dml_files(
            md, planned_snapshot, predicate, spark_session_timezone(spark), spark=spark
        )
        if mode == "merge-on-read":
            require_position_delete_files_allowed(md)
        if mode in ("merge-on-read", "deletion-vectors"):
            planned = plan_update_mor(
                spark,
                md,
                live,
                deletes,
                predicate,
                set_exprs,
                delete_plan_fn=(
                    plan_deletion_vectors if mode == "deletion-vectors" else None
                ),
            )
            if planned is None:
                return None, 0
            new_files, n_updated, superseded, targets = planned
            sid = self._commit_add(
                new_files,
                "overwrite",
                {"updated-records": str(n_updated)},
                branch=branch,
                removed_files=superseded or None,
                required_live_paths=targets or None,
            )
            return sid, n_updated
        planned = plan_update(
            spark, md, live, predicate, set_exprs, delete_files=deletes
        )
        if planned is None:
            return None, 0
        replacement, n_updated, n_rewritten = planned
        sid = self._commit_replace(
            md,
            planned_snapshot,
            replacement + excluded + deletes,
            "overwrite",
            {
                "updated-records": str(n_updated),
                "rewritten-data-files": str(n_rewritten),
            },
            "update",
            branch=branch,
        )
        return sid, n_updated

    def rewrite_position_deletes(self, spark: SparkSession) -> int | None:
        """Maintenance over REST: fold pending position deletes into the
        data files and drop every delete file (replace snapshot — a
        logical no-op, like compaction). See
        FsTable.rewrite_position_deletes."""
        md = self.metadata()
        planned_snapshot = md["current-snapshot-id"]
        if planned_snapshot == -1:
            return None
        live, deletes = self._live_files(md, planned_snapshot)
        pos = [f for f in deletes if f.content == 1]
        eq = [f for f in deletes if f.content == 2]
        if not pos:
            return None
        replacement, n_rewritten = plan_delete_rewrite(spark, md, live, deletes)
        # equality-delete files stay live for surviving files (original
        # sequence numbers preserved); rewritten files materialized them
        return self._commit_replace(
            md,
            planned_snapshot,
            replacement + eq,
            "replace",
            {
                "removed-delete-files": str(len(pos)),
                "rewritten-data-files": str(n_rewritten),
            },
            "position-delete rewrite",
        )

    def rewrite_equality_deletes(self, spark: SparkSession) -> int | None:
        """Maintenance over REST: fold pending equality deletes into the
        data files (see FsTable.rewrite_equality_deletes)."""
        from .iceberg_fs import plan_equality_rewrite

        md = self.metadata()
        planned_snapshot = md["current-snapshot-id"]
        if planned_snapshot == -1:
            return None
        live, deletes = self._live_files(md, planned_snapshot)
        planned = plan_equality_rewrite(spark, md, live, deletes)
        if planned is None:
            return None
        replacement, n_rewritten = planned
        n_eq = sum(1 for f in deletes if f.content == 2)
        return self._commit_replace(
            md,
            planned_snapshot,
            replacement,
            "replace",
            {
                "removed-delete-files": str(n_eq),
                "rewritten-data-files": str(n_rewritten),
            },
            "equality-delete rewrite",
        )

    def merge_rows(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        mode: str = "copy-on-write",
    ) -> tuple[int, int, int]:
        """MERGE (keyed upsert) over REST — copy-on-write (shared
        plan_merge, overwrite commit pinned to the planning base) or a
        merge-on-read row-delta (plan_merge_mor, committed like an
        append)."""
        from .iceberg_fs import plan_merge, plan_merge_mor

        if mode not in ("copy-on-write", "merge-on-read"):
            raise ValueError(f"mode must be copy-on-write|merge-on-read, got {mode!r}")
        md = self.metadata()
        planned_snapshot = md["current-snapshot-id"]
        live, deletes = (
            self._live_files(md, planned_snapshot)
            if planned_snapshot != -1
            else ([], [])
        )
        if mode == "merge-on-read":
            new_files, n_updated, n_inserted, superseded, targets = plan_merge_mor(
                spark, md, live, deletes, source, key_cols
            )
            sid = self._commit_add(
                new_files,
                "overwrite",
                {
                    "merged-records": str(n_updated),
                    "inserted-records": str(n_inserted),
                },
                removed_files=superseded or None,
                required_live_paths=targets or None,
            )
            return sid, n_updated, n_inserted
        replacement, n_updated, n_inserted = plan_merge(
            spark, md, live, source, key_cols, delete_files=deletes
        )
        sid = self._commit_replace(
            md,
            planned_snapshot,
            replacement + deletes,
            "overwrite",
            {
                "merged-records": str(n_updated),
                "inserted-records": str(n_inserted),
            },
            "merge",
        )
        return sid, n_updated, n_inserted

    def expire_snapshots(
        self,
        keep_last: int = 1,
        older_than_ms: int | None = None,
        now_ms: int | None = None,
    ) -> list[str]:
        """Expire via the REST remove-snapshot-ref + remove-snapshots
        updates (per-ref retention planned exactly like the fs catalog:
        branch ancestry windows, max-ref-age-ms ref aging), then
        physically delete files no retained snapshot references
        (commit-then-delete like the fs catalog). Returns deleted
        data-file paths."""
        from .iceberg_fs import (
            commit_attempts_for,
            delete_expired_paths,
            expire_plan,
        )

        attempt = 0
        while True:
            md = self.metadata()
            attempts = commit_attempts_for(md)
            plan = expire_plan(md, keep_last, older_than_ms, now_ms)
            if plan is None:
                return []
            expired_ids = {s["snapshot-id"] for s in plan["expired"]}
            updates: list[dict] = [
                {"action": "remove-snapshot-ref", "ref-name": name}
                for name in plan["removed_refs"]
            ]
            if expired_ids:
                updates.append(
                    {
                        "action": "remove-snapshots",
                        "snapshot-ids": sorted(expired_ids),
                    }
                )
            # pin EVERY ref the plan saw: a concurrent commit moving any
            # branch can extend an ancestry into the planned expired set
            # — a stale plan must 409 and re-plan, like the fs CAS loop
            requirements: list[dict] = [
                {"type": "assert-table-uuid", "uuid": md["table-uuid"]}
            ]
            for name, ref in sorted(md.get("refs", {}).items()):
                requirements.append(
                    {
                        "type": "assert-ref-snapshot-id",
                        "ref": name,
                        "snapshot-id": ref["snapshot-id"],
                    }
                )
            try:
                self.client.commit_table(
                    self.namespace, self.name, requirements, updates
                )
            except RestCommitConflictError:
                attempt += 1
                if attempt >= attempts:
                    raise
                time.sleep(0.05 * attempt)
                continue  # re-plan against the new state
            for key in ("partition-statistics", "statistics"):
                for e in md.get(key, []):
                    if e["snapshot-id"] in expired_ids:
                        try:
                            os.remove(e["statistics-path"])
                        except OSError:
                            pass
            return delete_expired_paths(plan)

    def compute_partition_stats(self, snapshot_id: int | None = None) -> dict | None:
        """Partition statistics over REST: write the spec's stats
        Parquet, then register it via the set-partition-statistics
        update (the REST spec's action). Returns the entry or None on
        an empty table."""
        from .iceberg_fs import write_partition_stats_file

        md = self.metadata()
        entry = write_partition_stats_file(md["location"], md, snapshot_id)
        if entry is None:
            return None
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[
                {"action": "set-partition-statistics", "partition-statistics": entry}
            ],
        )
        return entry

    def partition_stats(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        from .iceberg_fs import read_partition_stats

        return read_partition_stats(spark, self.metadata(), snapshot_id)

    def compute_column_stats(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        columns: list[str] | None = None,
    ) -> dict | None:
        """Column NDV statistics over REST: write the Puffin file, then
        register it via the spec's set-statistics update action."""
        from .puffin import write_column_stats_file

        md = self.metadata()
        sid = md["current-snapshot-id"] if snapshot_id is None else snapshot_id
        if sid == -1:
            return None
        entry = write_column_stats_file(
            spark,
            md["location"],
            md,
            self.read(spark, snapshot_id=sid),
            sid,
            columns,
        )
        if entry is None:
            return None
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[
                {
                    "action": "set-statistics",
                    "snapshot-id": entry["snapshot-id"],
                    "statistics": entry,
                }
            ],
        )
        return entry

    def column_stats(self, snapshot_id: int | None = None) -> dict[str, dict]:
        from .puffin import read_column_stats

        return read_column_stats(self.metadata(), snapshot_id)

    def update_column_stats_incremental(self, spark: SparkSession) -> dict | None:
        """Incremental stats refresh over REST: sketch only the appended
        window, KMV-merge, register via set-statistics (see
        FsTable.update_column_stats_incremental for semantics)."""
        from .puffin import plan_incremental_stats

        md = self.metadata()
        status, entry = plan_incremental_stats(spark, md, md["location"])
        if status != "new" or entry is None:
            return entry
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[
                {
                    "action": "set-statistics",
                    "snapshot-id": entry["snapshot-id"],
                    "statistics": entry,
                }
            ],
        )
        return entry

    def remove_orphan_files(
        self,
        older_than_seconds: float = 3 * 86400,
        include_metadata: bool = True,
    ) -> list[str]:
        """Reclaim data files under the table location that NO snapshot
        references (same sweep as FsTable — the REST catalog arbitrates
        commits but the warehouse is the same filesystem): leftovers
        from failed/raced writes whose commit never landed, plus (with
        include_metadata) the unreferenced manifest trees 409-losing
        commit attempts abandon. Only files older than the cutoff are
        deleted so in-flight writes racing this call are never swept.
        Returns deleted paths."""
        from .iceberg_fs import sweep_table_orphans

        md = self.metadata()
        return sweep_table_orphans(
            md["location"],
            md,
            set(self.all_files()),
            older_than_seconds,
            include_metadata,
        )

    def _live_files(
        self, md: dict, snapshot_id: int
    ) -> tuple[list[DataFile], list[DataFile]]:
        """(data files, position-delete files) live in a snapshot."""
        return live_files(md, snapshot_id)

    # -- refs: tags + branches ---------------------------------------------
    def set_ref(
        self,
        name: str,
        snapshot_id: int,
        ref_type: str = "tag",
        *,
        min_snapshots_to_keep: int | None = None,
        max_snapshot_age_ms: int | None = None,
        max_ref_age_ms: int | None = None,
    ) -> None:
        """Create/move a tag or branch via set-snapshot-ref (the same
        update action appends use for main), with the spec's optional
        retention fields — see FsTable.set_ref for semantics."""
        from .iceberg_fs import _build_ref

        if ref_type not in ("tag", "branch"):
            raise ValueError(f"ref type must be tag|branch, got {ref_type!r}")
        if name == "main" and ref_type != "branch":
            raise ValueError("main must stay a branch (Iceberg spec)")
        ref = _build_ref(
            snapshot_id,
            ref_type,
            min_snapshots_to_keep,
            max_snapshot_age_ms,
            max_ref_age_ms,
        )
        md = self.metadata()
        # SnapshotRef fields are the update's fields, per the REST spec
        update = {"action": "set-snapshot-ref", "ref-name": name, **ref}
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[update],
        )

    def upgrade_format_version(self, target: int = 3) -> int:
        """v2 -> v3 upgrade over REST: validate locally against the
        current metadata (plan_format_upgrade's invariants), then send
        the spec's upgrade-format-version update with the table pinned
        by assert-table-uuid — the server re-checks monotonicity."""
        from .iceberg_fs import plan_format_upgrade, table_format_version

        md = self.metadata()
        if not plan_format_upgrade(md, target):
            return table_format_version(md)
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[
                {"action": "upgrade-format-version", "format-version": target}
            ],
        )
        return target

    def snapshot_as_of(self, timestamp_ms: int) -> int | None:
        """Snapshot id for timestamp time travel; pass to read()."""
        from .iceberg_fs import snapshot_id_as_of

        return snapshot_id_as_of(self.metadata(), timestamp_ms)

    def rollback_to(self, snapshot_id: int) -> int:
        """Move main's head back to an ancestor snapshot over REST —
        the same set-snapshot-ref update an append uses; the server
        arbitrates the commit."""
        from .iceberg_fs import require_main_ancestor

        md = self.metadata()
        require_main_ancestor(md, snapshot_id)
        if md["current-snapshot-id"] != snapshot_id:
            self.set_ref("main", snapshot_id, "branch")
        return snapshot_id

    def resolve_ref(self, name: str) -> int:
        ref = self.metadata().get("refs", {}).get(name)
        if ref is None:
            raise ValueError(f"unknown ref {name!r}")
        return ref["snapshot-id"]

    def read_ref(self, spark: SparkSession, name: str) -> DataFrame:
        return self.read(spark, snapshot_id=self.resolve_ref(name))

    def add_columns(
        self,
        new_fields,
        defaults: dict | None = None,
        iceberg_types: dict[str, str] | None = None,
    ) -> int:
        """Schema evolution over REST: add nullable columns via a
        CommitTable with add-schema + set-current-schema updates (the
        REST spec's schema-evolution actions). Existing field ids are
        untouched; returns the new schema id. `defaults` = v3 default
        values; `iceberg_types` = v3-only type overrides (ns timestamps,
        unknown) — see FsTable.add_columns; both require v3."""
        from .iceberg_fs import (
            current_schema,
            evolved_schema,
            live_files,
            require_id_resolvable,
            table_format_version,
        )

        fields = list(new_fields.fields if isinstance(new_fields, StructType) else new_fields)
        md = self.metadata()
        # re-added names bind to NEW ids -> id-resolution required
        historic = {f_["name"] for s in md["schemas"] for f_ in s["fields"]}
        current_names = {f_["name"] for f_ in current_schema(md)["fields"]}
        if any(f_.name in historic - current_names for f_ in fields):
            sid = md.get("current-snapshot-id", -1)
            if sid != -1:
                data, _ = live_files(md, sid)
                require_id_resolvable([f.file_path for f in data], md)
        if defaults and table_format_version(md) < 3:
            raise ValueError(
                "default values are an Iceberg v3 feature — call "
                "upgrade_format_version(3) first"
            )
        if iceberg_types and table_format_version(md) < 3:
            raise ValueError(
                "timestamp_ns/unknown columns are an Iceberg v3 feature — "
                "call upgrade_format_version(3) first"
            )
        new_schema, last_col = evolved_schema(md, fields, defaults, iceberg_types)
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[
                {"action": "add-schema", "schema": new_schema, "last-column-id": last_col},
                {"action": "set-current-schema", "schema-id": new_schema["schema-id"]},
            ],
        )
        return new_schema["schema-id"]

    def _commit_schema(self, md: dict, schema: dict) -> int:
        """add-schema + set-current-schema CommitTable shared by every
        schema evolution (add / rename / drop)."""
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[
                {"action": "add-schema", "schema": schema},
                {"action": "set-current-schema", "schema-id": schema["schema-id"]},
            ],
        )
        return schema["schema-id"]

    def rename_column(self, old: str, new: str) -> int:
        """Column rename over REST (see FsTable.rename_column): the
        field keeps its id; reads resolve by parquet field id. Guarded
        on live files carrying field ids or name-mapping coverage."""
        from .iceberg_fs import (
            evolved_schema_rename,
            live_files,
            require_id_resolvable,
        )

        md = self.metadata()
        sid = md.get("current-snapshot-id", -1)
        if sid != -1:
            data, _ = live_files(md, sid)
            require_id_resolvable([f.file_path for f in data], md)
        return self._commit_schema(md, evolved_schema_rename(md, old, new))

    def drop_column(self, name: str) -> int:
        """Column drop over REST (see FsTable.drop_column)."""
        from .iceberg_fs import evolved_schema_drop

        md = self.metadata()
        return self._commit_schema(md, evolved_schema_drop(md, name))

    def update_partition_spec(
        self, partition_source: str | None, granularity: str = "hourly"
    ) -> int | None:
        """Partition-spec evolution over REST via add-spec +
        set-default-spec updates (the REST spec's actions). Metadata
        only; see FsTable.update_partition_spec for the semantics."""
        from .iceberg_fs import evolved_spec

        md = self.metadata()
        spec = evolved_spec(md, partition_source, granularity)
        if spec is None:
            return None
        self.client.commit_table(
            self.namespace,
            self.name,
            requirements=[{"type": "assert-table-uuid", "uuid": md["table-uuid"]}],
            updates=[
                {"action": "add-spec", "spec": spec},
                {"action": "set-default-spec", "spec-id": spec["spec-id"]},
            ],
        )
        return spec["spec-id"]

    def plan_files(
        self,
        snapshot_id: int | None = None,
        partition_range: tuple[int, int] | None = None,
        column_range: tuple[str, Any, Any] | None = None,
        source_predicate: tuple[str, Any] | None = None,
        source_range: tuple[str, Any, Any] | None = None,
    ) -> tuple[list[DataFile], int]:
        """Same pruning scan planner as FsTable (shared transport-
        neutral plan_scan_metadata): (live data files, n_pruned)."""
        data, _, pruned = plan_scan_metadata(
            self.metadata(),
            snapshot_id,
            partition_range,
            column_range,
            source_predicate,
            source_range,
        )
        return data, pruned

    # statuses that mean "this server does not implement the plan
    # route" (despite advertising it) — auto mode falls back to local
    # planning and remembers; anything else is a real failure
    _PLAN_NOT_IMPLEMENTED = frozenset({404, 405, 406, 501})

    def plan_files_server(
        self,
        snapshot_id: int | None = None,
        filter_json: dict | None = None,
        select: list[str] | None = None,
        poll_interval: float = 0.2,
        deadline: float = 60.0,
        md: dict | None = None,
    ) -> list[tuple["DataFile", list["DataFile"]]]:
        """Server-side scan planning (REST spec PlanTableScan): submit
        the plan, poll `submitted` results until the server completes
        (cancelling server-side work at `deadline`), drain every
        plan-task page, and return [(data file, applicable delete
        files)] scan tasks. Raises RestError on failed/cancelled plans
        and on byzantine results (unknown status, runaway pagination).
        `md` lets a caller that already loaded table metadata skip the
        re-fetch (and pins the plan to THAT metadata's snapshot instead
        of a newer commit's — read() passes it).
        """
        from .rest_scan import MAX_PLAN_TASK_FETCHES, parse_scan_tasks

        if md is None:
            md = self.metadata()
        sid = md["current-snapshot-id"] if snapshot_id is None else snapshot_id
        if sid in (-1, None):
            return []
        body: dict[str, Any] = {"snapshot-id": sid, "case-sensitive": True}
        if filter_json is not None:
            body["filter"] = filter_json
        if select is not None:
            body["select"] = list(select)
        try:
            res = self.client.plan_table_scan(self.namespace, self.name, body)
        except RestError as exc:
            # only the INITIAL submit can prove the route unimplemented;
            # NoSuchTableException is a real error even at 404
            if (
                exc.status in self._PLAN_NOT_IMPLEMENTED
                and "nosuchtable" not in exc.error_type.lower()
            ):
                raise RestPlanUnsupportedError(
                    exc.status, exc.error_type, exc.message
                ) from exc
            raise
        plan_id = res.get("plan-id")
        t0 = time.monotonic()
        while res.get("status") == "submitted":
            plan_id = res.get("plan-id", plan_id)
            if plan_id is None:
                raise RestError(
                    0, "InvalidResponseException", "submitted plan without plan-id"
                )
            if time.monotonic() - t0 > deadline:
                try:
                    self.client.cancel_planning(self.namespace, self.name, plan_id)
                except RestError:
                    pass  # best-effort: the timeout is the error to surface
                raise RestError(
                    0,
                    "PlanningTimeoutException",
                    f"scan planning exceeded {deadline}s (plan {plan_id} cancelled)",
                )
            time.sleep(poll_interval)
            res = self.client.fetch_planning_result(
                self.namespace, self.name, plan_id
            )
        status = res.get("status")
        if status in ("failed", "cancelled"):
            err = res.get("error") or {}
            raise RestError(
                0,
                err.get("type", "PlanFailedException"),
                err.get("message", f"server-side scan planning {status}"),
            )
        if status != "completed":
            raise RestError(
                0, "InvalidResponseException", f"unknown plan status {status!r}"
            )
        tasks, pending = parse_scan_tasks(res, md)
        fetched = 0
        while pending:
            token = pending.pop()
            fetched += 1
            if fetched > MAX_PLAN_TASK_FETCHES:
                raise RestError(
                    0,
                    "InvalidResponseException",
                    "plan-task pagination exceeded "
                    f"{MAX_PLAN_TASK_FETCHES} fetches — refusing to loop",
                )
            page = self.client.fetch_scan_tasks(self.namespace, self.name, token)
            page_tasks, more = parse_scan_tasks(page, md)
            tasks.extend(page_tasks)
            pending.extend(more)
        return tasks

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        partition_range: tuple[int, int] | None = None,
        column_range: tuple[str, Any, Any] | None = None,
        source_predicate: tuple[str, Any] | None = None,
        source_range: tuple[str, Any, Any] | None = None,
        where: str | None = None,
        with_lineage: bool = False,
        server_planning: bool | None = None,
    ) -> DataFrame:
        """Scan a committed snapshot's files (time travel via
        snapshot_id), with position deletes subtracted (merge-on-read)
        and the same manifest-level pruning surface as FsTable.read
        (partition_range / column_range / hidden-partition
        source_predicate prune FILES; row filters are the caller's).
        `where` instead takes ONE SQL predicate that both prunes files
        (column bounds, hidden-partition rewrite, ns literals,
        variant-path footer stats) and filters rows — same semantics as
        FsTable.read. `with_lineage` (v3 tables) appends _row_id /
        _last_updated_sequence_number (scan_with_lineage).

        `server_planning`: None (default) = plan on the SERVER when the
        /v1/config handshake advertised the spec's PlanTableScan
        endpoints (falling back to local planning on not-implemented
        answers, and always for `with_lineage` — the spec's ContentFile
        JSON carries no data sequence number, so _last_updated cannot
        be reconstructed from a server plan); True = require it
        (ValueError on lineage reads, RestError when unsupported);
        False = always plan locally. Either way the rows are identical:
        the server prunes by manifest metadata, the client applies the
        residual row filter — and on `where` predicates the client
        still runs its footer pruning pass (shredded-variant stats,
        bloom probes) over the returned candidates, so server planning
        never widens the scan."""
        from .iceberg_fs import plan_dml_files, scan_with_lineage, spark_session_timezone

        md = self.metadata()
        self.apply_storage_credentials(spark, md["location"])
        sid = md["current-snapshot-id"] if snapshot_id is None else snapshot_id
        if sid in (-1, None):
            return spark.createDataFrame(spark.sparkContext.emptyRDD(), spark_read_schema(md))
        if where is not None and any(
            p is not None
            for p in (partition_range, column_range, source_predicate, source_range)
        ):
            raise ValueError(
                "pass either `where` or the tuple pruning params, not both "
                "(`where` subsumes them)"
            )
        if server_planning and with_lineage:
            raise ValueError(
                "with_lineage reads cannot use server-side planning: the "
                "REST spec's ContentFile JSON has first-row-id but no data "
                "sequence number, so _last_updated_sequence_number cannot "
                "be reconstructed — use server_planning=None/False"
            )
        use_server = (
            server_planning
            if server_planning is not None
            else self.client.supports_scan_planning() and not with_lineage
        )
        if use_server and not with_lineage:
            df = self._read_server_planned(
                spark,
                md,
                sid,
                partition_range,
                column_range,
                source_predicate,
                source_range,
                where,
                required=server_planning is True,
            )
            if df is not None:
                return df
        if where is not None:
            data, _, deletes = plan_dml_files(
                md, sid, where, spark_session_timezone(spark), spark=spark
            )
        else:
            data, deletes, _ = plan_scan_metadata(
                md, sid, partition_range, column_range, source_predicate, source_range
            )
        df = (
            scan_with_lineage(spark, md, data, deletes)
            if with_lineage
            else scan_with_deletes(spark, md, data, deletes)
        )
        return df.filter(where) if where is not None else df

    def _read_server_planned(
        self,
        spark: SparkSession,
        md: dict,
        sid: int,
        partition_range,
        column_range,
        source_predicate,
        source_range,
        where: str | None,
        required: bool,
    ) -> DataFrame | None:
        """The server-planning read path: serialize the pruning surface
        to the spec's expression JSON, plan on the catalog, footer-prune
        the returned candidates (variant stats / bloom probes — the
        server only sees manifests), and execute the scan tasks. Returns
        None when a non-required attempt hits a not-implemented answer —
        read() then falls back to local planning (and the client
        remembers, so the probe is paid once per process)."""
        from .iceberg_fs import (
            extract_prune_ranges,
            predicate_footer_prune,
            spark_session_timezone,
        )
        from .rest_scan import scan_filter_json, scan_planned_tasks

        if where is not None:
            ranges = extract_prune_ranges(where, md, spark_session_timezone(spark))
            filter_json = scan_filter_json(md, **ranges)
        else:
            filter_json = scan_filter_json(
                md, partition_range, column_range, source_predicate, source_range
            )
        try:
            tasks = self.plan_files_server(sid, filter_json, md=md)
        except RestPlanUnsupportedError:
            if not required:
                self.client._plan_unsupported = True
                return None
            raise
        if where is not None and tasks:
            kept, _ = predicate_footer_prune(
                md, [df for df, _ in tasks], where, spark=spark
            )
            kept_paths = {f.file_path for f in kept}
            tasks = [(df, refs) for df, refs in tasks if df.file_path in kept_paths]
        df = scan_planned_tasks(spark, md, tasks)
        return df.filter(where) if where is not None else df


def register_rest_table_views(
    spark: SparkSession,
    client: RestCatalogClient,
    namespace: str | None = None,
    broadcast_threshold: int | None = None,
) -> dict[str, str]:
    """Make every REST-catalog table addressable as a `<ns>_<table>`
    temp view (the fs sql-CLI convention — see
    iceberg_source.register_table_views) so plain spark.sql and catalog
    VIEW SQL analyze and execute over this transport too, mirroring the
    fs registrar's statistics-driven planning: tables whose live
    on-disk bytes (O(1) from the snapshot summary's total-files-size)
    fit under the shared BROADCAST_BYTE_THRESHOLD register with a
    broadcast hint, so star joins written in plain SQL broadcast their
    dimensions.

    Cost per table: ONE metadata GET (reused for the size estimate and
    the scan), plus the local manifest walk that materializes the file
    list — this registrar builds EAGER scans (unlike the fs one, whose
    Python data source defers planning to execution), so registering a
    huge warehouse to query one table pays for the untouched tables
    too; pass `namespace` to scope it. Returns {view_name: location}."""
    from ..sources.iceberg_source import BROADCAST_BYTE_THRESHOLD
    from .iceberg_fs import plan_scan_metadata, scan_with_deletes

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_BYTE_THRESHOLD
    views: dict[str, str] = {}
    namespaces = [namespace] if namespace else client.list_namespaces()
    for ns in namespaces:
        for name in client.list_tables(ns):
            t = RestTable(client, ns, name)
            md = t.metadata()
            sid = md["current-snapshot-id"]
            snap = (
                next((s for s in md["snapshots"] if s["snapshot-id"] == sid), None)
                if sid not in (-1, None)
                else None
            )
            data, deletes, _ = plan_scan_metadata(md)
            summary = (snap or {}).get("summary", {})
            if "total-files-size" in summary:
                n_bytes = int(summary["total-files-size"])
            else:
                n_bytes = sum(f.file_size_in_bytes for f in data)
            df = scan_with_deletes(spark, md, data, deletes)
            if n_bytes <= broadcast_threshold:
                df = df.hint("broadcast")
            view = f"{ns}_{name}"
            df.createOrReplaceTempView(view)
            views[view] = md["location"]
    return views


class RestView:
    """A catalog VIEW over REST (view spec v1): load/replace/read via
    the spec's /views routes. Replace is an optimistic commit — the
    assert-view-uuid requirement pins the object identity and the
    server linearizes version assignment, so racing replacers both
    land (distinct version-ids) unless the view was dropped/recreated
    under them."""

    def __init__(self, client: RestCatalogClient, namespace: str, name: str):
        self.client = client
        self.namespace = namespace
        self.name = name

    def metadata(self) -> dict:
        res = self.client._request(
            "GET", self.client._view_path(self.namespace, self.name)
        )
        return res["metadata"]

    def versions(self) -> list[dict]:
        return self.metadata()["versions"]

    def replace(
        self, spark: SparkSession, sql: str, register_tables: bool = True
    ) -> int:
        """Spec REPLACE as one CommitViewRequest: add-schema +
        add-view-version (schema-id -1 = the schema just added) +
        set-current-view-version (-1 = the version just added)."""
        from .iceberg_fs import iceberg_schema
        from .iceberg_views import (
            build_view_version,
            infer_view_schema,
            strip_schema_internal,
        )

        if register_tables:
            self.client.register_warehouse_views(spark)
        md = self.metadata()
        schema = strip_schema_internal(
            {**iceberg_schema(infer_view_schema(spark, sql)), "schema-id": -1}
        )
        version = build_view_version(
            -1, -1, sql, self.namespace, int(time.time() * 1000), "replace"
        )
        res = self.client.commit_view(
            self.namespace,
            self.name,
            {
                "requirements": [
                    {"type": "assert-view-uuid", "uuid": md["view-uuid"]}
                ],
                "updates": [
                    {"action": "add-schema", "schema": schema},
                    {"action": "add-view-version", "view-version": version},
                    {"action": "set-current-view-version", "view-version-id": -1},
                ],
            },
        )
        return res["metadata"]["current-version-id"]

    def read(self, spark: SparkSession, version_id: int | None = None) -> DataFrame:
        from .iceberg_views import execute_view

        self.client.register_warehouse_views(spark)
        return execute_view(spark, self.metadata(), version_id)
